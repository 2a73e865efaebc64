package graft.core

/** One shard of a global raster grid: a `2^res × 2^res`-pixel block keyed by
  * its [[CellId]]. Missing cells are NaN inside the payload (the reference's
  * NODATA→NaN canonicalization, `Raster.py:104-109`); payload is row-major
  * with `h` rows × `w` cols anchored at global pixel `(row0, col0)`.
  *
  * Edge tiles may be smaller than the full cell block (h, w < 2^res).
  * `Dataset[Tile]` is the engine's vectorization unit: kernels run tight
  * JVM loops over the primitive payload (SURVEY.md §1.3).
  */
final case class Tile(
    cellId: Long,
    row0: Int,
    col0: Int,
    h: Int,
    w: Int,
    payload: Array[Double]) {

  def value(r: Int, c: Int): Double = payload((r - row0) * w + (c - col0))

  def validCount: Long = {
    var n = 0L
    var i = 0
    while (i < payload.length) {
      if (!payload(i).isNaN) n += 1
      i += 1
    }
    n
  }
}

/** A partial overwrite of one tile by one mosaic source: `seq` is the source
  * precedence (later seq wins, mirroring the reference's sequential paste,
  * `spatial_analysis.py:288-295`), `cov` a per-pixel coverage bitset —
  * distinct from NaN because combine_raster pastes NODATA cells too
  * (it overwrites with the raw sub-rectangle including NODATA) while
  * merge/paste_on(ignore_nan) skip invalid source pixels. */
final case class TilePatch(
    cellId: Long,
    row0: Int,
    col0: Int,
    h: Int,
    w: Int,
    seq: Int,
    payload: Array[Double],
    cov: Array[Long]) {

  def covered(i: Int): Boolean = (cov(i >> 6) & (1L << (i & 63))) != 0
}

object TilePatch {
  def fullCover(n: Int): Array[Long] = {
    val words = (n + 63) >> 6
    val a = Array.fill(words)(-1L)
    if ((n & 63) != 0) a(words - 1) = (1L << (n & 63)) - 1
    a
  }

  def emptyCover(n: Int): Array[Long] = new Array[Long]((n + 63) >> 6)

  def setBit(cov: Array[Long], i: Int): Unit =
    cov(i >> 6) |= (1L << (i & 63))
}

/** A vector feature: polygon/polyline ring(s) with attributes. Geometry is
  * held as flat coordinate arrays (x, y interleaved per ring) — enough for
  * the reference's feature surface (single-ring polygons + polylines,
  * `spatial_analysis.py:229-241`); WKB/JTS interop lives in graft.functions.
  */
final case class Feature(
    featureId: Long,
    kind: String, // "polygon" | "polyline"
    xs: Array[Double],
    ys: Array[Double],
    attr: Double, // burn attribute; NaN = absent (reference NULL dbf field)
    seq: Int) // burn order: later overwrites earlier (Raster.py:330-335)
