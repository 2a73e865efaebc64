package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

class DelaunaySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("triangulation + barycentric: unit square hand-check") {
    // square with one diagonal: center = mean of the shared-edge triangle
    val pts = Array(PtRec(0, 0, 0, 0.0), PtRec(1, 1, 0, 2.0),
      PtRec(2, 0, 1, 4.0), PtRec(3, 1, 1, 6.0))
    val xs = pts.map(_.x); val ys = pts.map(_.y)
    val tris = Delaunay.triangulate(xs, ys)
    assert(tris.length == 2)
    val ids = pts.map(_.pid); val vs = pts.map(_.v)
    // interior of the lower-left triangle (whichever diagonal): exact plane
    val got = Delaunay.interpolate(tris, ids, xs, ys, vs, 0.25, 0.25).get._1
    // v is linear in (x, y) on this data: v = 2x + 4y  -> 0.5 + 1.0
    assert(math.abs(got - 1.5) < 1e-12)
    // outside hull -> None
    assert(Delaunay.interpolate(tris, ids, xs, ys, vs, -0.5, 0.5).isEmpty)
    // exact at data points
    pts.foreach { p =>
      val v = Delaunay.interpolate(tris, ids, xs, ys, vs, p.x, p.y).get._1
      assert(math.abs(v - p.v) < 1e-12, s"pid ${p.pid}")
    }
  }

  test("distributed Delaunay-linear == driver-global oracle (dense fixture)") {
    import spark.implicits._
    val ptsArr = Synth.knnPoints.map(p => PtRec(p._1, p._2, p._3, p._4))
    val want = Delaunay.interpolateGridLocal(ptsArr, Synth.knnRef)
    val got = Delaunay.linearBucketed(spark,
        spark.createDataset(ptsArr.toSeq), Synth.knnRef, res = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == Synth.knnRef.numCells)
    var inHull = 0
    for (r <- 0 until Synth.knnRef.nrows; c <- 0 until Synth.knnRef.ncols) {
      val w = want(r * Synth.knnRef.ncols + c)
      val g = got((r, c))
      if (w.isNaN) assert(g.isNaN, s"($r,$c): want NaN got $g")
      else {
        assert(!g.isNaN && math.abs(g - w) < 1e-9, s"($r,$c): want $w got $g")
        inHull += 1
      }
    }
    assert(inHull > 1000, s"hull too small: $inHull")
  }

  test("sparse points force escalation to the exhaustive ring; still exact") {
    import spark.implicits._
    val sparse = Array(PtRec(0L, -4.75, 0.25, 1.0), PtRec(1L, -4.25, 25.75, 2.0),
      PtRec(2L, 55.25, 0.75, 3.0), PtRec(3L, 30.25, 29.75, 4.0))
    val want = Delaunay.interpolateGridLocal(sparse, Synth.knnRef)
    val got = Delaunay.linearBucketed(spark,
        spark.createDataset(sparse.toSeq), Synth.knnRef, res = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == Synth.knnRef.numCells)
    for (r <- 0 until Synth.knnRef.nrows; c <- 0 until Synth.knnRef.ncols) {
      val w = want(r * Synth.knnRef.ncols + c)
      val g = got((r, c))
      if (w.isNaN) assert(g.isNaN, s"($r,$c)")
      else assert(math.abs(g - w) < 1e-9, s"($r,$c): want $w got $g")
    }
  }

  test("5k-point stress: distributed == driver-global on a 200x200 grid") {
    import spark.implicits._
    val ref = GridRef(ncols = 200, nrows = 200, xll = 0, yll = 0, cellsize = 1)
    // deterministic scatter with clumps, exact-lattice coordinates (the
    // degeneracy-heavy regime) and a NaN-free value field
    val pts = Array.tabulate(5000) { i =>
      val x = ((i * 193) % 3200) * 0.0625
      val y = ((i * 389) % 3200) * 0.0625
      PtRec(i.toLong, x, y, ((i * 31) % 977) / 8.0)
    }
    val want = Delaunay.interpolateGridLocal(pts, ref)
    val got = Delaunay.linearBucketed(spark, spark.createDataset(pts.toSeq), ref, res = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == ref.numCells)
    var inHull = 0
    for (r <- 0 until ref.nrows; c <- 0 until ref.ncols) {
      val w = want(r * ref.ncols + c)
      val g = got((r, c))
      if (w.isNaN) assert(g.isNaN, s"($r,$c): want NaN got $g")
      else { assert(math.abs(g - w) < 1e-9, s"($r,$c): want $w got $g"); inHull += 1 }
    }
    assert(inHull > 30000, s"hull too small: $inHull")
  }

  test("degenerate inputs: <3 points and collinear sets yield all-NaN") {
    import spark.implicits._
    for (pts <- Seq(
      Array(PtRec(0, 1.0, 1.0, 5.0)),
      Array(PtRec(0, 1.0, 1.0, 5.0), PtRec(1, 2.0, 2.0, 6.0), PtRec(2, 3.0, 3.0, 7.0)))) {
      val got = Delaunay.linearBucketed(spark,
          spark.createDataset(pts.toSeq), Synth.knnRef, res = 5)
        .collect()
      assert(got.length == Synth.knnRef.numCells)
      assert(got.forall(r => r.getDouble(2).isNaN))
    }
  }
}
