package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

/** Composed bankline -> bathymetry (reference Modules/index.rst:4-15):
  * stations sit ON the cross-section lines with z linear along each, so
  * on a planar depth field the composed surface must reproduce the plane
  * inside the bankline and emit NOTHING outside it. */
class LineSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plane(x: Double, y: Double): Double = 4.0 + 0.25 * x + 0.5 * y

  test("stations: on-line positions, linear z, count = line2sub walk length") {
    import spark.implicits._
    val ref = Synth.knnRef
    val ln = LineSurface.CrossLine(3L, Array(2.0, 2.0), Array(29.0, 1.0),
      z0 = plane(2.0, 29.0), z1 = plane(2.0, 1.0))
    val pts = LineSurface.stations(spark.createDataset(Seq(ln)), ref).collect()
    val n = graft.core.RefKernel.line2sub(ref, ln.xs, ln.ys).length
    assert(pts.length == n && n > 2)
    // every station on the segment x=2, y in [1,29], z = plane(station)
    pts.foreach { p =>
      assert(p.x == 2.0)
      assert(p.y >= 1.0 && p.y <= 29.0)
      assert(math.abs(p.v - plane(p.x, p.y)) < 1e-9,
        s"station ${p.pid}: ${p.v} vs ${plane(p.x, p.y)}")
    }
    // endpoints included (t = 0 and t = 1)
    assert(pts.map(_.y).min == 1.0 && pts.map(_.y).max == 29.0)
    // ids partition by line
    assert(pts.forall(p => (p.pid >> 20) == 3L))
  }

  test("bathymetry == plane inside the bankline, empty outside") {
    import spark.implicits._
    val ref = Synth.knnRef
    val lines = spark.createDataset((0 until 20).map { j =>
      val x = -4.0 + 3.0 * j
      LineSurface.CrossLine(j.toLong, Array(x, x), Array(29.0, 1.0),
        z0 = plane(x, 29.0), z1 = plane(x, 1.0))
    })
    val xs = Array(0.0, 48.0, 50.0, 1.0, 0.0)
    val ys = Array(3.0, 5.0, 29.0, 25.0, 3.0)
    val bank = Seq(Feature(0, "polygon", xs, ys, attr = 1.0, seq = 0))
    val got = TileOps.cells(
        LineSurface.bathymetry(spark, lines, bank, ref, res = 5))
      .filter($"v".isNotNull)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // oracle: even-odd PIP of pixel centers (the ClipPolygon rule)
    def pip(px: Double, py: Double): Boolean = {
      var inside = false
      var i = 1
      while (i < xs.length) {
        val (xi, yi, xj, yj) = (xs(i), ys(i), xs(i - 1), ys(i - 1))
        if ((yi > py) != (yj > py) &&
            px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
        i += 1
      }
      inside
    }
    val want = (for {
      r <- 0 until ref.nrows
      c <- 0 until ref.ncols
      px = ref.left + (c + 0.5) * ref.cellsize
      py = ref.top - (r + 0.5) * ref.cellsize
      if pip(px, py)
    } yield (r, c) -> plane(px, py)).toMap
    assert(got.keySet == want.keySet,
      s"coverage: got ${got.size}, want ${want.size}")
    got.foreach { case (rc, v) =>
      assert(math.abs(v - want(rc)) < 1e-4, s"cell $rc: $v vs ${want(rc)}")
    }
    assert(got.size > 1000, "fixture should cover a substantial region")
  }
}
