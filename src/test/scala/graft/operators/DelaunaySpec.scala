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

  test("30k-point scale smoke: bucketed escalation holds at 100 buckets") {
    import spark.implicits._
    val ref = GridRef(ncols = 300, nrows = 300, xll = 0, yll = 0, cellsize = 1)
    val pts = spark.range(30000).map { i =>
      PtRec(i, ((i * 193) % 4800) * 0.0625, ((i * 389) % 4800) * 0.0625,
        ((i * 31) % 977) / 8.0)
    }
    val out = Delaunay.linearBucketed(spark, pts, ref, res = 5)
      .select($"row", $"col", $"v")
    val n = out.count()
    assert(n == ref.numCells)
    // the hull covers nearly the whole grid at this density: almost every
    // cell interpolates (points span the full extent)
    val valid = out.filter(!org.apache.spark.sql.functions.isnan($"v")).count()
    assert(valid > ref.numCells * 9 / 10, s"valid=$valid of ${ref.numCells}")
  }

  test("CT element: quadratic precision with exact gradients; C0/C1 across edges") {
    // mesh of 4 points -> 2-3 triangles; f = x^2 + xy - 2y^2 with exact grads
    def fq(x: Double, y: Double) = x * x + x * y - 2 * y * y
    def gq(x: Double, y: Double) = (2 * x + y, x - 4 * y)
    val pts = Array((0.0, 0.0), (4.0, 0.5), (1.0, 3.0), (5.0, 3.5))
    val xs = pts.map(_._1); val ys = pts.map(_._2)
    val vs = pts.map(p => fq(p._1, p._2))
    val gxs = pts.map(p => gq(p._1, p._2)._1)
    val gys = pts.map(p => gq(p._1, p._2)._2)
    val tris = Delaunay.triangulate(xs, ys)
    assert(tris.length >= 2)
    val mesh = new Delaunay.CtMesh(Array(0L, 1L, 2L, 3L), xs, ys, vs, tris,
      gradOverride = Some((gxs, gys)))
    // quadratic precision: CT with exact data reproduces the quadratic
    val rng = new scala.util.Random(5)
    for (_ <- 1 to 200) {
      val w1 = rng.nextDouble(); val w2 = rng.nextDouble() * (1 - w1)
      val ti = tris(rng.nextInt(tris.length))
      val px = xs(ti.a) * w1 + xs(ti.b) * w2 + xs(ti.c) * (1 - w1 - w2)
      val py = ys(ti.a) * w1 + ys(ti.b) * w2 + ys(ti.c) * (1 - w1 - w2)
      val got = mesh.eval(px, py)
      assert(got.isDefined, s"($px,$py) not located")
      assert(math.abs(got.get._1 - fq(px, py)) < 1e-9, s"($px,$py)")
    }
    // C1 across the shared macro edge: find the shared edge of two tris
    val pairs = for {
      i <- tris.indices; j <- tris.indices if i < j
      shared = Seq(tris(i).a, tris(i).b, tris(i).c)
        .intersect(Seq(tris(j).a, tris(j).b, tris(j).c))
      if shared.length == 2
    } yield (i, j, shared)
    assert(pairs.nonEmpty)
    val (ti, tj, Seq(u, w)) = pairs.head
    // random (non-quadratic-consistent!) data: C1 must hold structurally
    val vs2 = Array(1.0, -2.0, 0.5, 3.0)
    val g2x = Array(0.3, -1.0, 2.0, 0.1); val g2y = Array(-0.7, 0.4, 1.1, -2.2)
    val mesh2 = new Delaunay.CtMesh(Array(0L, 1L, 2L, 3L), xs, ys, vs2, tris,
      gradOverride = Some((g2x, g2y)))
    val ex = xs(w) - xs(u); val ey = ys(w) - ys(u)
    val el = math.sqrt(ex * ex + ey * ey)
    val nx = ey / el; val ny = -ex / el
    for (t <- Seq(0.2, 0.5, 0.8); h <- Seq(1e-4, 1e-5)) {
      val px = xs(u) + t * ex; val py = ys(u) + t * ey
      // values from both specific patches agree ON the edge (C0)
      val va = mesh2.evalTri(ti, px, py); val vb = mesh2.evalTri(tj, px, py)
      assert(math.abs(va - vb) < 1e-9, s"C0 t=$t")
      // one-sided normal derivatives converge to each other (C1): the gap
      // at offset h comes from the 2nd-derivative jump, so it must scale
      // down linearly with h
      def dn(k: Int, sgn: Double) = (mesh2.evalTri(k, px + sgn * 3 * h * nx, py + sgn * 3 * h * ny) -
        mesh2.evalTri(k, px + sgn * h * nx, py + sgn * h * ny)) / (sgn * 2 * h)
      val gap = math.abs(dn(ti, 1) - dn(tj, 1)) min math.abs(dn(ti, -1) - dn(tj, -1))
      assert(gap < 60 * h, s"C1 gap $gap at h=$h t=$t")
    }
  }

  test("CT mesh with ESTIMATED gradients reproduces linear fields exactly") {
    def fl(x: Double, y: Double) = 3.0 * x - 2.0 * y + 7.0
    val ptsArr = Synth.knnPoints.map(p => PtRec(p._1, p._2, p._3, fl(p._2, p._3)))
    val got = Delaunay.interpolateGridLocalCubic(ptsArr, Synth.knnRef)
    var checked = 0
    for (r <- 0 until Synth.knnRef.nrows; c <- 0 until Synth.knnRef.ncols) {
      val v = got(r * Synth.knnRef.ncols + c)
      if (!v.isNaN) {
        val (cx, cy) = Synth.knnRef.sub2map(r, c)
        // accuracy bound = O(jitter * |grad|): delta = 1e-6 * cellsize
        // shifts the sites while values stay from the unjittered field
        assert(math.abs(v - fl(cx, cy)) < 1e-5, s"($r,$c): $v vs ${fl(cx, cy)}")
        checked += 1
      }
    }
    assert(checked > 1000)
  }

  test("distributed CT cubic == driver-global oracle (dense + sparse)") {
    import spark.implicits._
    for (ptsArr <- Seq(
      Synth.knnPoints.map(p => PtRec(p._1, p._2, p._3, p._4)),
      Array(PtRec(0L, -4.75, 0.25, 1.0), PtRec(1L, -4.25, 25.75, 2.0),
        PtRec(2L, 55.25, 0.75, 3.0), PtRec(3L, 30.25, 29.75, 4.0),
        PtRec(4L, 20.125, 14.875, -2.0)))) {
      val want = Delaunay.interpolateGridLocalCubic(ptsArr, Synth.knnRef)
      val got = Delaunay.cubicBucketed(spark,
          spark.createDataset(ptsArr.toSeq), Synth.knnRef, res = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(got.size == Synth.knnRef.numCells)
      for (r <- 0 until Synth.knnRef.nrows; c <- 0 until Synth.knnRef.ncols) {
        val w = want(r * Synth.knnRef.ncols + c)
        val g = got((r, c))
        if (w.isNaN) assert(g.isNaN, s"($r,$c): want NaN got $g")
        else assert(math.abs(g - w) < 1e-9, s"($r,$c): want $w got $g")
      }
    }
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
