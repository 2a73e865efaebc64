package graft.core

/** Shared deterministic fixtures (FIXTURES.md). CA1 polygon coordinates are
  * the exact decode of the reference's sample shapefile
  * (`/root/reference/hydro_raster/sample/CA1_overhead_features.shp`). */
object Fixtures {

  /** FIXTURES.md §2 synthetic DEM header (stand-in for stripped CA1_5m.tif). */
  val demRef = GridRef(ncols = 154, nrows = 203, xll = 340760, yll = 554667,
    cellsize = 5, nodata = -9999)

  /** Deterministic INTEGER-derived terrain (exact in IEEE double and in any
    * SQL engine — no libm divergence): value = ((r*31 + c*17) % 1000) / 4.0,
    * with nodata holes where (r*ncols + c) % 97 == 13. */
  def demValue(r: Int, c: Int): Double =
    if ((r * demRef.ncols + c) % 97 == 13) Double.NaN
    else ((r * 31 + c * 17) % 1000) / 4.0

  def demGrid: RefKernel.Grid = {
    val data = new Array[Double](demRef.ncols * demRef.nrows)
    for (r <- 0 until demRef.nrows; c <- 0 until demRef.ncols)
      data(r * demRef.ncols + c) = demValue(r, c)
    RefKernel.Grid(demRef, data)
  }

  /** FIXTURES.md §1: the 4 CA1 overhead-feature polygons (exact decode).
    * seq = feature index (= reference default burn value); attr = id. */
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

  /** FIXTURES.md §4 cross-section fixture grid. */
  val xsecRef = GridRef(ncols = 120, nrows = 60, xll = -5, yll = 0,
    cellsize = 0.5, nodata = -9999)

  /** crossline2 from FIXTURES.md §4 (21 pts, x/y/z). */
  val crossline2: Array[(Double, Double, Double)] = Array(
    (14.0, 10.0, 6.0), (14.3, 10.35, 5.75791), (14.6, 10.7, 5.536864),
    (14.9, 11.05, 5.336864), (15.2, 11.4, 5.15791), (15.5, 11.75, 5.0),
    (15.8, 12.1, 4.863136), (16.1, 12.45, 4.747316), (16.4, 12.8, 4.631497),
    (16.7, 13.15, 4.389407), (17.0, 13.5, 4.0), (17.3, 13.85, 3.463277),
    (17.6, 14.2, 3.0), (17.9, 14.55, 2.83093), (18.2, 14.9, 2.956067),
    (18.5, 15.25, 3.375411), (18.8, 15.6, 3.933552), (19.1, 15.95, 4.475082),
    (19.4, 16.3, 5.0), (19.7, 16.65, 5.508306), (20.0, 17.0, 6.0))
}
