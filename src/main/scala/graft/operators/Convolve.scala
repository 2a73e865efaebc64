package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core._

/** Separable convolution resample kernels — the remaining reference
  * `resample` methods cubic / cubic_spline / lanczos / gauss
  * (Raster.py:382-384 via rasterio Resampling; kernel formulas are the
  * public GDAL/Keys/Lanczos definitions):
  *
  *   cubic        Keys cubic convolution, a = -0.5, 4x4 window
  *   cubic_spline cubic B-spline approximation, 4x4 window
  *   lanczos      a = 3 windowed sinc, 6x6 window
  *   gauss        exp(-2 t^2) truncated at |t| <= 2, 4x4 window
  *                (standardized: GDAL's gauss is an overview kernel with
  *                no single published resample definition)
  *
  * NODATA handling standardized as masked renormalization: NaN source
  * pixels drop out and the remaining weights renormalize; an all-NaN
  * window yields NaN. Runs on the same tile-granular gather harness as
  * bilinear (halo = kernel radius). */
object Convolve {

  val methods = Seq("cubic", "cubic_spline", "lanczos", "gauss")

  /** 1-D kernel weight at offset t (t >= 0). */
  def weight(method: String, t: Double): Double = method match {
    case "cubic" =>
      val a = -0.5
      if (t <= 1) (a + 2) * t * t * t - (a + 3) * t * t + 1
      else if (t < 2) a * (t * t * t - 5 * t * t + 8 * t - 4)
      else 0.0
    case "cubic_spline" =>
      if (t <= 1) (3 * t * t * t - 6 * t * t + 4) / 6.0
      else if (t < 2) { val u = 2 - t; u * u * u / 6.0 }
      else 0.0
    case "lanczos" =>
      if (t == 0) 1.0
      else if (t < 3) {
        val pt = math.Pi * t
        3 * math.sin(pt) * math.sin(pt / 3) / (pt * pt)
      } else 0.0
    case "gauss" =>
      if (t <= 2) math.exp(-2.0 * t * t) else 0.0
    case other => throw new IllegalArgumentException(s"kernel $other")
  }

  /** Window radius in source pixels (window spans 2*radius around the
    * fractional position). */
  def radius(method: String): Int = if (method == "lanczos") 3 else 2

  def resample(srcTiles: Dataset[Tile], srcRef: GridRef, targetRef: GridRef,
      res: Int, method: String): DataFrame =
    TileOps.cells(resampleTiles(srcTiles, srcRef, targetRef, res, method))

  def resampleTiles(srcTiles: Dataset[Tile], srcRef: GridRef,
      targetRef: GridRef, res: Int, method: String): Dataset[Tile] = {
    require(methods.contains(method), s"unknown kernel $method")
    val rad = radius(method)
    val (sNrows, sNcols) = (srcRef.nrows, srcRef.ncols)
    Gather.gatherTileDs(srcTiles, srcRef, targetRef, res, halo = rad) {
      (tr, tc, byCell) =>
        val (x, y) = targetRef.sub2map(tr, tc)
        val (fr, fc) = srcRef.map2subFrac(x, y)
        val r0 = math.floor(fr).toInt - (rad - 1)
        val c0 = math.floor(fc).toInt - (rad - 1)
        var num = 0.0
        var den = 0.0
        var any = false
        var r = r0
        while (r < r0 + 2 * rad) {
          if (r >= 0 && r < sNrows) {
            val wr = weight(method, math.abs(fr - r))
            if (wr != 0.0) {
              var c = c0
              while (c < c0 + 2 * rad) {
                if (c >= 0 && c < sNcols) {
                  val wc = weight(method, math.abs(fc - c))
                  if (wc != 0.0) {
                    val v = byCell.get(CellId.ofPixel(r.toLong, c.toLong, res)) match {
                      case Some(t) => t.value(r, c)
                      case None => Double.NaN
                    }
                    if (!v.isNaN) {
                      val w = wr * wc
                      num += w * v
                      den += w
                      any = true
                    }
                  }
                }
                c += 1
              }
            }
          }
          r += 1
        }
        if (!any || den == 0.0) Double.NaN else num / den
    }
  }
}
