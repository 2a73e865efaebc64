package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

/** Marching-squares contours: distributed (halo-owned blocks) vs a
  * driver-global single-loop oracle, plus topological sanity. */
class ContourSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val L = 100.125

  /** Independent whole-grid marching squares (no tiles, no halo). */
  private def globalContour(ref: GridRef, f: (Int, Int) => Double)
      : Map[(Double, Double, Double, Double), Int] = {
    val out = scala.collection.mutable.Map[(Double, Double, Double, Double), Int]()
      .withDefaultValue(0)
    def emit(ax: Double, ay: Double, bx: Double, by: Double): Unit = {
      val s = if (ax < bx || (ax == bx && ay <= by)) (ax, ay, bx, by) else (bx, by, ax, ay)
      out(s) += 1
    }
    for (r <- 0 until ref.nrows - 1; c <- 0 until ref.ncols - 1) {
      val ztl = f(r, c); val ztr = f(r, c + 1)
      val zbl = f(r + 1, c); val zbr = f(r + 1, c + 1)
      if (!ztl.isNaN && !ztr.isNaN && !zbl.isNaN && !zbr.isNaN) {
        var code = 0
        if (ztl >= L) code |= 8
        if (ztr >= L) code |= 4
        if (zbr >= L) code |= 2
        if (zbl >= L) code |= 1
        if (code != 0 && code != 15) {
          val x = c.toDouble; val y = r.toDouble
          def pt(edge: Int): (Double, Double) = edge match {
            case 0 => (x + (L - ztl) / (ztr - ztl), y)
            case 1 => (x + 1, y + (L - ztr) / (zbr - ztr))
            case 2 => (x + (L - zbl) / (zbr - zbl), y + 1)
            case _ => (x, y + (L - ztl) / (zbl - ztl))
          }
          val pairs: Seq[(Int, Int)] = code match {
            case 1 | 14 => Seq((3, 2))
            case 2 | 13 => Seq((2, 1))
            case 3 | 12 => Seq((3, 1))
            case 4 | 11 => Seq((0, 1))
            case 6 | 9 => Seq((0, 2))
            case 7 | 8 => Seq((3, 0))
            case 5 =>
              if ((ztl + ztr + zbr + zbl) / 4.0 >= L) Seq((3, 0), (2, 1))
              else Seq((3, 2), (0, 1))
            case 10 =>
              if ((ztl + ztr + zbr + zbl) / 4.0 >= L) Seq((0, 1), (3, 2))
              else Seq((3, 0), (2, 1))
          }
          pairs.foreach { case (a, b) =>
            val (ax, ay) = pt(a); val (bx, by) = pt(b)
            emit(ax, ay, bx, by)
          }
        }
      }
    }
    out.toMap
  }

  test("contour distributed == driver-global (two tile sizes); all cases exercised") {
    val want = globalContour(Synth.demRef, Synth.demValue)
    for (res <- Seq(6, 4)) {
      val tiles = TileOps.tileGrid(spark, Synth.demRef, res)(Synth.demValue)
      val rows = Contour.segments(tiles, Synth.demRef, res, L).collect()
      val got = rows.map(r =>
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got.values.sum == want.values.sum, s"res=$res segment count")
      assert(got == want, s"res=$res segment multiset")
    }
    assert(want.nonEmpty)
  }

  test("multi-level contour == per-level single passes") {
    val tiles = TileOps.tileGrid(spark, Synth.demRef, 6)(Synth.demValue)
    val levels = Seq(50.125, 100.125, 200.125)
    val multi = Contour.segmentSet(tiles, Synth.demRef, 6, levels).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val singles = levels.flatMap { lv =>
      Contour.segments(tiles, Synth.demRef, 6, lv).collect()
        .map(r => (lv, r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(multi == singles)
    assert(levels.forall(lv => multi.keys.exists(_._1 == lv)))
  }

  test("contour endpoints lie on block edges and interpolate to the level") {
    val tiles = TileOps.tileGrid(spark, Synth.demRef, 6)(Synth.demValue)
    val rows = Contour.segments(tiles, Synth.demRef, 6, L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((x, y) <- Seq((r.getDouble(0), r.getDouble(1)), (r.getDouble(2), r.getDouble(3)))) {
        // exactly one coordinate is integral (on a lattice line), the other
        // strictly interior to its unit interval
        val xInt = x == math.floor(x)
        val yInt = y == math.floor(y)
        assert(xInt ^ yInt, s"endpoint ($x,$y) not on a single edge")
        // the fractional coordinate reproduces the level by interpolation
        if (!xInt) {
          val c = math.floor(x).toInt; val rr = y.toInt
          val za = Synth.demValue(rr, c); val zb = Synth.demValue(rr, c + 1)
          val t = x - c
          assert(math.abs(za + t * (zb - za) - L) < 1e-9)
        } else {
          val rr = math.floor(y).toInt; val c = x.toInt
          val za = Synth.demValue(rr, c); val zb = Synth.demValue(rr + 1, c)
          val t = y - rr
          assert(math.abs(za + t * (zb - za) - L) < 1e-9)
        }
      }
    }
  }
}
