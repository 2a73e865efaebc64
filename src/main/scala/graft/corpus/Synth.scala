package graft.corpus

import graft.core._

/** Deterministic synthetic raster fixtures shared by queries, tests and
  * benchmarks (FIXTURES.md §2). All cell values are INTEGER-DERIVED and then
  * divided by 4 — exact in IEEE double and reproducible bit-for-bit by any
  * SQL engine (no libm sin/cos divergence), so DuckDB oracles hash-match.
  */
object Synth {

  /** FIXTURES.md §2 synthetic DEM header (stand-in for the reference's
    * stripped CA1_5m.tif; covers the tutorial clip extent with margin). */
  val demRef = GridRef(ncols = 154, nrows = 203, xll = 340760, yll = 554667,
    cellsize = 5, nodata = -9999)

  /** value = ((r*31 + c*17) % 1000) / 4.0, NaN holes where
    * (r*ncols + c) % 97 == 13 (tests NODATA->NaN canonicalization). */
  def demValue(r: Int, c: Int): Double =
    if ((r * demRef.ncols + c) % 97 == 13) Double.NaN
    else ((r * 31 + c * 17) % 1000) / 4.0

  /** The tutorial's clip extent (demo/tutorial_edit_DEM.ipynb cell 4). */
  val tutorialClip = Extent(340761, 341528, 554668, 555682)

  /** Mosaic fixture: two overlapping aligned 5m grids (A below-left, B
    * upper-right overlap), distinct value formulas and hole patterns. */
  val gridARef = GridRef(ncols = 100, nrows = 80, xll = 0, yll = 0, cellsize = 5)
  val gridBRef = GridRef(ncols = 90, nrows = 70, xll = 250, yll = 150, cellsize = 5)

  def gridAValue(r: Int, c: Int): Double =
    if ((r * gridARef.ncols + c) % 89 == 7) Double.NaN
    else ((r * 13 + c * 7) % 100) / 4.0

  def gridBValue(r: Int, c: Int): Double =
    if ((r * gridBRef.ncols + c) % 71 == 3) Double.NaN
    else ((r * 5 + c * 3) % 80) / 4.0

  /** Union-extent target of the A+B mosaic (combine_raster union rule,
    * spatial_analysis.py:267-279). */
  val mosaicRef: GridRef = {
    val xmin = math.min(gridARef.left, gridBRef.left)
    val xmax = math.max(gridARef.right, gridBRef.right)
    val ymin = math.min(gridARef.bottom, gridBRef.bottom)
    val ymax = math.max(gridARef.top, gridBRef.top)
    GridRef(((xmax - xmin) / 5).toInt, ((ymax - ymin) / 5).toInt, xmin, ymin, 5)
  }

  /** FIXTURES.md §1: exact decode of the reference's 4 CA1 overhead-feature
    * polygons (CA1_overhead_features.shp); seq = feature index (= the
    * reference's default burn value), attr = dbf `id`. */
  val ca1Features: Seq[Feature] = Seq(
    Feature(0, "polygon",
      Array(341431.4458, 341455.5102, 341412.3603, 341384.9767, 341431.4458),
      Array(555569.2773, 555565.9580, 555417.4228, 555420.7420, 555569.2773),
      attr = 2.0, seq = 0),
    Feature(1, "polygon",
      Array(341313.7866, 341342.7971, 341353.9178, 341327.8084, 341313.7866),
      Array(554692.3337, 554708.2894, 554694.2677, 554679.2790, 554692.3337),
      attr = 4.0, seq = 1),
    Feature(2, "polygon",
      Array(341365.6132, 341391.1149, 341395.3652, 341374.1138, 341365.6132),
      Array(554999.1120, 554998.2619, 554948.9587, 554950.6588, 554999.1120),
      attr = 5.0, seq = 2),
    Feature(3, "polygon",
      Array(341020.0371, 341019.2848, 341116.3402, 341120.1020, 341020.0371),
      Array(554941.3361, 554953.3739, 554956.3834, 554944.3455, 554941.3361),
      attr = 9.0, seq = 3))

  /** paste_on fixture (Raster.py:517-551): a small aligned 5 m grid whose
    * window overlaps the DEM's right edge (cols 130..159 in DEM pixel
    * coords, rows 103..142) so the paste exercises out-of-range clipping.
    * Values are eighths (integer/8) — exact in IEEE double — on a hole
    * pattern distinct from the DEM's. */
  val pasteRef = GridRef(ncols = 30, nrows = 40,
    xll = 340760 + 130 * 5, yll = 554667 + 60 * 5, cellsize = 5)

  def pasteValue(r: Int, c: Int): Double =
    if ((r * 31 + c) % 41 == 5) Double.NaN
    else ((r * 13 + c * 7) % 400) / 8.0

  /** Scattered-point fixture for kNN interpolation: 60 deterministic points
    * on the interpolation grid below, integer-derived coords/values, laid
    * out so no grid center is equidistant from two points (tie-free by
    * construction is NOT assumed — ties break by lowest point id). */
  val knnRef = GridRef(ncols = 120, nrows = 60, xll = -5, yll = 0, cellsize = 0.5)

  /** Blocky value field for vectorize: 8x8-pixel blocks of 5 value classes
    * with NaN holes — yields a few hundred connected components. */
  def blockyValue(r: Int, c: Int): Double =
    if ((r * gridARef.ncols + c) % 53 == 11) Double.NaN
    else (((r / 8) * 31 + (c / 8) * 17) % 5).toDouble

  /** Resample target for r6: 10m grid offset +1.25m from the DEM so every
    * map2sub fraction lands on .25/.75 (round-half-even can never diverge
    * from round-half-away — the oracle rule). Gather hits source pixel
    * (2r+1, 2c+1). */
  val resampleTargetRef = GridRef(ncols = 77, nrows = 101,
    xll = 340761.25, yll = 554668.25, cellsize = 10)

  /** Polyline fixture for line2sub with integer-only linspace values
    * (each segment's steps-1 divides both deltas): centers of
    * (50,10) -> (40,10) -> (30,20) -> (30,60) on knnRef. */
  def fixtureLine: (Array[Double], Array[Double]) = {
    val cells = Array((50, 10), (40, 10), (30, 20), (30, 60))
    val xs = cells.map { case (_, c) => knnRef.sub2map(0, c)._1 }
    val ys = cells.map { case (r, _) => knnRef.sub2map(r, 0)._2 }
    (xs, ys)
  }

  /** The same polyline shape anchored on the DEM grid — the r50
    * cross-section fixture (vertical, diagonal, horizontal runs, so the
    * cell walk has a closed form the SQL oracle can regenerate). */
  def demLine: (Array[Double], Array[Double]) = {
    val cells = Array((50, 10), (40, 10), (30, 20), (30, 60))
    val xs = cells.map { case (_, c) => demRef.sub2map(0, c)._1 }
    val ys = cells.map { case (r, _) => demRef.sub2map(r, 0)._2 }
    (xs, ys)
  }

  /** Linear-precision fixture for the Delaunay oracles: the knnPoints
    * scatter re-valued by a dyadic linear polynomial a + bx*x + cy*y, plus
    * the 4 exact hull corners of knnRef so every cell center is strictly
    * inside the convex hull (no NaN mask to replicate in SQL). Barycentric
    * interpolation reproduces a plane exactly (linear precision), and the
    * reduced-HCT cubic does too (its WLS gradients are exact on linear
    * fields — DelaunaySpec gates this), so the DuckDB oracle is the
    * closed-form polynomial at cell centers; the deterministic 1e-6*cs
    * coordinate jitter perturbs values by <= |grad f| * delta * sqrt(2)
    * ~ 1e-6 — four orders below the round(v*10^4) quantum, whose lattice
    * the polynomial values land exactly on (multiples of 625e-4). */
  def delaunayPlanePoints(a: Double, bx: Double, cy: Double): Array[(Long, Double, Double, Double)] = {
    val corners = Array((-5.0, 0.0), (55.0, 0.0), (-5.0, 30.0), (55.0, 30.0))
    knnPoints.map { case (id, x, y, _) => (id, x, y, a + bx * x + cy * y) } ++
      corners.zipWithIndex.map { case ((x, y), i) =>
        (60L + i, x, y, a + bx * x + cy * y) }
  }

  def knnPoints: Array[(Long, Double, Double, Double)] =
    (0 until 60).map { i =>
      val px = -5.0 + ((i * 37) % 113) * 0.5 + 0.125 // off-center -> no PIP ties
      val py = ((i * 53) % 107) * 0.25 + 0.0625
      val pv = ((i * 29) % 400) / 4.0
      (i.toLong, px, py, pv)
    }.toArray
}
