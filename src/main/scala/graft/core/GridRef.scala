package graft.core

/** Georeference of a regular square-cell grid in a projected (meter) CRS.
  *
  * Mirrors the reference header semantics (hydro-raster
  * `spatial_analysis.py:38-96`, `Raster.py:94-101`): origin at the lower-left
  * corner of the SW cell, row 0 = north/top row, square cells.
  *
  * All methods are pure; this is the "key encoding" of the engine
  * (SURVEY.md §1.2).
  */
final case class GridRef(
    ncols: Int,
    nrows: Int,
    xll: Double,
    yll: Double,
    cellsize: Double,
    nodata: Double = -9999.0,
    crs: String = "") {

  /** Set the CRS from an EPSG code (reference `set_crs(int)`,
    * Raster.py:167-181; the WKT form passes a WKT string to `copy(crs=)`). */
  def withEpsg(epsg: Int): GridRef = copy(crs = s"EPSG:$epsg")

  /** EPSG code when the crs is the EPSG:<n> token (else 0). */
  def epsg: Int =
    if (crs.startsWith("EPSG:")) crs.drop(5).toInt else 0

  /** Header summary incl. crs — reference `Raster.summary`
    * (Raster.py:139-147). */
  def summary: Map[String, String] = Map(
    "ncols" -> ncols.toString, "nrows" -> nrows.toString,
    "xllcorner" -> xll.toString, "yllcorner" -> yll.toString,
    "cellsize" -> cellsize.toString, "nodata_value" -> nodata.toString) ++
    (if (crs.nonEmpty) Map("crs" -> crs) else Map.empty)

  def left: Double = xll
  def bottom: Double = yll
  def right: Double = xll + ncols * cellsize
  def top: Double = yll + nrows * cellsize

  /** (left, right, bottom, top) — reference `header2extent`
    * (spatial_analysis.py:310-319). */
  def extent: Extent = Extent(left, right, bottom, top)

  /** Map coords -> fractional (row, col). Row 0 is the top row.
    * Reference `map2sub` header branch (spatial_analysis.py:371-376). */
  def map2subFrac(x: Double, y: Double): (Double, Double) = {
    val x0 = xll + 0.5 * cellsize
    val y0 = yll + (nrows - 0.5) * cellsize
    ((y0 - y) / cellsize, (x - x0) / cellsize)
  }

  /** Map coords -> (row, col) with round-half-even (the reference's ndarray
    * path uses np.round == rint, spatial_analysis.py:384-386; the scalar
    * truncate path :387-389 is a reference quirk we do NOT standardize on —
    * the parity oracle uses this array path). */
  def map2sub(x: Double, y: Double): (Int, Int) = {
    val (r, c) = map2subFrac(x, y)
    (Math.rint(r).toInt, Math.rint(c).toInt)
  }

  /** (row, col) -> map coords of the CELL CENTER.
    * Reference `sub2map` (spatial_analysis.py:392-413). */
  def sub2map(row: Double, col: Double): (Double, Double) =
    (left + (col + 0.5) * cellsize, top - (row + 0.5) * cellsize)

  def inBounds(row: Int, col: Int): Boolean =
    row >= 0 && row < nrows && col >= 0 && col < ncols

  def numCells: Long = ncols.toLong * nrows.toLong

  /** Clip window snapped to the grid: clamp the requested extent to this
    * grid's extent, then snap via the map2sub of the corner points and clamp
    * subscripts to valid range. Mirrors `Raster.rect_clip` (Raster.py:197-222):
    * slice is [minRow, maxRow] x [minCol, maxCol] INCLUSIVE.
    * Returns (minRow, maxRow, minCol, maxCol). */
  def clipWindow(e: Extent): (Int, Int, Int, Int) = {
    val x0 = math.max(e.left, left)
    val x1 = math.min(e.right, right)
    val y0 = math.max(e.bottom, bottom)
    val y1 = math.min(e.top, top)
    // corner subscripts (reference computes map2sub of the 4 corners)
    val (rTop, cLeft) = map2sub(x0, y1)
    val (rBot, cRight) = map2sub(x1, y0)
    val minRow = math.max(0, math.min(rTop, rBot))
    val maxRow = math.min(nrows - 1, math.max(rTop, rBot))
    val minCol = math.max(0, math.min(cLeft, cRight))
    val maxCol = math.min(ncols - 1, math.max(cLeft, cRight))
    (minRow, maxRow, minCol, maxCol)
  }

  /** New GridRef for the inclusive window [minRow..maxRow, minCol..maxCol]
    * (Raster.py:217-229 header recompute). */
  def windowRef(minRow: Int, maxRow: Int, minCol: Int, maxCol: Int): GridRef = {
    val newNcols = maxCol - minCol + 1
    val newNrows = maxRow - minRow + 1
    val newXll = xll + minCol * cellsize
    val newYll = yll + (nrows - 1 - maxRow) * cellsize
    GridRef(newNcols, newNrows, newXll, newYll, cellsize, nodata, crs)
  }
}

/** (left, right, bottom, top) in map units. */
final case class Extent(left: Double, right: Double, bottom: Double, top: Double) {
  def intersects(o: Extent): Boolean =
    left < o.right && o.left < right && bottom < o.top && o.bottom < top

  def contains(o: Extent): Boolean =
    o.left >= left && o.right <= right && o.bottom >= bottom && o.top <= top

  /** Classify this vs other: 0 = this contains other (inclusive), 1 = this
    * STRICTLY inside other on all four sides, 2 = partial/other. Reference
    * `compare_extent` (spatial_analysis.py:416-441): branch 0 uses <=/>=,
    * branch 1 requires all four inclusive comparisons FALSE, i.e. strict —
    * a contained extent sharing an edge classifies 2, not 1. */
  def compare(o: Extent): Int =
    if (contains(o)) 0
    else if (left > o.left && right < o.right && bottom > o.bottom && top < o.top) 1
    else 2
}
