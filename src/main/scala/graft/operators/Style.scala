package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.Dataset
import graft.core._

/** Styled map rendering — the PIXEL CONTENT of the reference's
  * `grid_show.py` figures, without matplotlib chrome (fonts/ticks/axes
  * are platform-dependent text rendering; everything that carries DATA —
  * the colormapped raster, the colorbar/legend ramp, quiver arrows,
  * shape outlines — is produced deterministically here):
  *
  *  - [[mapshowPng]]  — `mapshow` (grid_show.py:33-95): continuous
  *    colormap + right-hand colorbar strip.
  *  - [[rankshowPng]] — `rankshow` (grid_show.py:96-135): discrete
  *    rank classes from `breaks` (values below the first break are
  *    nodata, like the reference), Blues-style ramp, rank legend strip.
  *  - [[quiverPng]]   — `vectorshow` (grid_show.py:160-186): U/V arrow
  *    field at cell centers, Bresenham lines + arrowheads.
  *  - [[plotShapePng]] — `plot_shape_file` (grid_show.py:239-292):
  *    polygon outlines / polyline paths rasterized onto a canvas.
  *
  * All four mirror the reference's single-figure, driver-side semantics
  * (bounded like `Raster.toArray`); the DISTRIBUTED styled path for
  * tile-served maps is [[rgbTiles]] — per-tile colormapped PNGs, the
  * mapshow analog of `TileFns.renderPng`, safe at any raster size. */
object Style {

  /** Packed 0xRRGGBB at t in [0,1] over piecewise-linear anchors.
    * Serializable so ramps ride into executor closures ([[rgbTiles]]). */
  final class Ramp(anchors: Array[(Double, Int, Int, Int)]) extends Serializable {
    def apply(t0: Double): Int = {
      val t = math.max(0.0, math.min(1.0, t0))
      var i = 0
      while (i < anchors.length - 2 && anchors(i + 1)._1 < t) i += 1
      val (ta, ra, ga, ba) = anchors(i)
      val (tb, rb, gb, bb) = anchors(i + 1)
      val f = if (tb == ta) 0.0 else (t - ta) / (tb - ta)
      def mix(a: Int, b: Int): Int = math.round(a + f * (b - a)).toInt
      (mix(ra, rb) << 16) | (mix(ga, gb) << 8) | mix(ba, bb)
    }
  }

  /** gist_earth-like terrain ramp (the reference mapshow default family):
    * deep blue -> teal -> green -> tan -> white. Fixed anchors, so every
    * pixel is a deterministic function of (v, lo, hi). */
  val Terrain = new Ramp(Array(
    (0.00, 18, 48, 119), (0.25, 40, 135, 124), (0.50, 95, 160, 82),
    (0.75, 188, 168, 109), (1.00, 253, 250, 250)))

  /** Blues ramp (the reference rankshow default), light -> dark. */
  val Blues = new Ramp(Array(
    (0.00, 247, 251, 255), (0.50, 106, 174, 214), (1.00, 8, 48, 107)))

  val NoDataRgb: Int = 0xC8C8C8 // matplotlib's "bad" grey family
  val Background: Int = 0xFFFFFF

  /** matplotlib `Normalize` semantics: a degenerate range (lo == hi, or
    * a non-finite span) maps every value to 0 rather than dividing to
    * NaN — a flat raster renders as the ramp's low color, not black. */
  private def normed(v: Double, lo: Double, span: Double): Double =
    if (span > 0 && !span.isInfinite) (v - lo) / span else 0.0

  private def toPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Continuous colormap + colorbar (mapshow). `values` row-major with
    * NaN holes; colorbar = an 8-px ramp strip (hi at top) after a 2-px
    * gap, exactly the data content of the reference's `cax`. */
  def mapshowPng(values: Array[Double], w: Int, h: Int, lo: Double,
      hi: Double, ramp: Ramp = Terrain, colorbar: Boolean = true): Array[Byte] = {
    require(values.length == w.toLong * h, "values/shape mismatch")
    val cbW = if (colorbar) 10 else 0
    val img = new BufferedImage(w + cbW, h, BufferedImage.TYPE_INT_RGB)
    val span = hi - lo
    var i = 0
    while (i < values.length) {
      val v = values(i)
      img.setRGB(i % w, i / w,
        if (v.isNaN) NoDataRgb else ramp(normed(v, lo, span)))
      i += 1
    }
    if (colorbar) {
      var y = 0
      while (y < h) {
        val t = if (h == 1) 1.0 else 1.0 - y.toDouble / (h - 1) // hi at top
        val c = ramp(t)
        var x = w
        while (x < w + 2) { img.setRGB(x, y, Background); x += 1 }
        while (x < w + cbW) { img.setRGB(x, y, c); x += 1 }
        y += 1
      }
    }
    toPng(img)
  }

  /** Discrete rank map + legend (rankshow). Values below `breaks(0)`
    * are NODATA (the reference rule); class k covers
    * [breaks(k), breaks(k+1)), the last class is open-topped. The
    * legend strip paints one block per class, class 0 at the bottom
    * (colorbar orientation). */
  def rankshowPng(values: Array[Double], w: Int, h: Int,
      breaks: Array[Double], ramp: Ramp = Blues,
      legend: Boolean = true): Array[Byte] = {
    require(values.length == w.toLong * h, "values/shape mismatch")
    require(breaks.length >= 1 && breaks.sameElements(breaks.sorted),
      "breaks must be non-empty ascending")
    val n = breaks.length
    val colors = Array.tabulate(n)(k =>
      ramp(if (n == 1) 1.0 else k.toDouble / (n - 1)))
    val cbW = if (legend) 10 else 0
    val img = new BufferedImage(w + cbW, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      val rgb =
        if (v.isNaN || v < breaks(0)) NoDataRgb
        else {
          var k = n - 1
          while (k > 0 && v < breaks(k)) k -= 1
          colors(k)
        }
      img.setRGB(i % w, i / w, rgb)
      i += 1
    }
    if (legend) {
      var y = 0
      while (y < h) {
        val k = math.min(n - 1, ((h - 1 - y).toLong * n / math.max(1, h)).toInt)
        var x = w
        while (x < w + 2) { img.setRGB(x, y, Background); x += 1 }
        while (x < w + cbW) { img.setRGB(x, y, colors(k)); x += 1 }
        y += 1
      }
    }
    toPng(img)
  }

  /** Segment raster with BOUNDED work: endpoints are clipped in double
    * space (Liang-Barsky) to the canvas padded by max(w, h) pixels per
    * side, then rounded and Bresenham-drawn. Without the clip, an
    * endpoint far off-canvas (a huge quiver `u*scale`, a shapefile
    * vertex thousands of cells outside the grid — `Double.toInt`
    * SATURATES at Int.MaxValue) makes the per-pixel-clipped Bresenham
    * walk up to ~2^31 steps: an effective hang. Endpoints inside the
    * padded box are untouched, so all in/near-canvas rendering is
    * pixel-identical; a clipped far segment's visible strokes drift
    * <= 1 px over the canvas span (the clip point rounds once).
    * Non-finite endpoints skip the stroke (quiver's NaN masking). */
  private def drawLineD(img: BufferedImage, x0d: Double, y0d: Double,
      x1d: Double, y1d: Double, rgb: Int): Unit = {
    if (!java.lang.Double.isFinite(x0d) || !java.lang.Double.isFinite(y0d) ||
        !java.lang.Double.isFinite(x1d) || !java.lang.Double.isFinite(y1d))
      return
    val pad = math.max(img.getWidth, img.getHeight).toDouble
    val (xlo, xhi) = (-pad, img.getWidth - 1 + pad)
    val (ylo, yhi) = (-pad, img.getHeight - 1 + pad)
    var t0 = 0.0; var t1 = 1.0
    val dx = x1d - x0d; val dy = y1d - y0d
    def clip(p: Double, q: Double): Boolean =
      if (p == 0.0) q >= 0.0 // parallel: inside iff q >= 0 (NaN q rejects)
      else {
        val r = q / p
        if (p < 0) { if (r > t1) false else { if (r > t0) t0 = r; true } }
        else { if (r < t0) false else { if (r < t1) t1 = r; true } }
      }
    val visible =
      clip(-dx, x0d - xlo) && clip(dx, xhi - x0d) &&
        clip(-dy, y0d - ylo) && clip(dy, yhi - y0d) && t0 <= t1
    if (visible)
      drawLine(img,
        math.round(x0d + t0 * dx).toInt, math.round(y0d + t0 * dy).toInt,
        math.round(x0d + t1 * dx).toInt, math.round(y0d + t1 * dy).toInt, rgb)
  }

  private def drawLine(img: BufferedImage, x0: Int, y0: Int, x1: Int,
      y1: Int, rgb: Int): Unit = {
    // Bresenham, clipped per-pixel
    val dx = math.abs(x1 - x0); val dy = -math.abs(y1 - y0)
    val sx = if (x0 < x1) 1 else -1
    val sy = if (y0 < y1) 1 else -1
    var err = dx + dy
    var x = x0; var y = y0
    var going = true
    while (going) {
      if (x >= 0 && x < img.getWidth && y >= 0 && y < img.getHeight)
        img.setRGB(x, y, rgb)
      if (x == x1 && y == y1) going = false
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
  }

  /** U/V arrow field (vectorshow): one arrow per `step`-strided cell,
    * anchored at the cell center, displaced by (u, -v) * scale pixels
    * (y grows downward in image space), with a two-stroke arrowhead.
    * NaN in either component skips the cell, like quiver's masking. */
  def quiverPng(u: Array[Double], v: Array[Double], w: Int, h: Int,
      step: Int, scale: Double, arrowRgb: Int = 0x000000): Array[Byte] = {
    require(u.length == w.toLong * h && v.length == u.length, "shape mismatch")
    require(step >= 1 && scale > 0, "need step >= 1, scale > 0")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, Background); x += 1 }
      y += 1
    }
    var r = step / 2
    while (r < h) {
      var c = step / 2
      while (c < w) {
        val uu = u(r * w + c); val vv = v(r * w + c)
        if (!uu.isNaN && !vv.isNaN && (uu != 0 || vv != 0)) {
          val x1 = c + uu * scale
          val y1 = r - vv * scale
          drawLineD(img, c, r, x1, y1, arrowRgb)
          // arrowhead: two strokes at +-150 degrees off the shaft
          val ang = math.atan2(y1 - r, x1 - c)
          val hl = math.max(2.0, math.hypot(x1 - c, y1 - r) * 0.3)
          for (da <- Seq(2.618, -2.618)) { // pi - pi/6
            val hx = x1 + hl * math.cos(ang + da)
            val hy = y1 + hl * math.sin(ang + da)
            drawLineD(img, x1, y1, hx, hy, arrowRgb)
          }
        }
        c += step
      }
      r += step
    }
    toPng(img)
  }

  /** Shape outlines (plot_shape_file): every feature's vertex chain maps
    * through the grid georeference and rasterizes as Bresenham strokes —
    * polygons close their ring (reference uses a Polygon patch), lines
    * don't. */
  def plotShapePng(features: Seq[Feature], ref: GridRef,
      lineRgb: Int = 0xFF0000): Array[Byte] = {
    val w = ref.ncols; val h = ref.nrows
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, Background); x += 1 }
      y += 1
    }
    // Double pixel coords (floored to the containing cell, no .toInt —
    // Double.toInt saturates far-off vertices at Int.MaxValue); drawLineD
    // bounds the stroke work for vertices any distance off-canvas
    def px(mx: Double): Double = math.floor((mx - ref.left) / ref.cellsize)
    def py(my: Double): Double = math.floor((ref.top - my) / ref.cellsize)
    features.foreach { f =>
      val n = f.xs.length
      require(f.ys.length == n, s"plotShapePng: feature with ${n} xs but " +
        s"${f.ys.length} ys")
      // a degenerate record with no vertices draws nothing (and must not
      // index xs(0)/xs(-1) below)
      val closed = n > 0 && f.kind == "polygon" &&
        (f.xs(0) != f.xs(n - 1) || f.ys(0) != f.ys(n - 1))
      var i = 0
      while (i < n - 1) {
        drawLineD(img, px(f.xs(i)), py(f.ys(i)),
          px(f.xs(i + 1)), py(f.ys(i + 1)), lineRgb)
        i += 1
      }
      if (closed)
        drawLineD(img, px(f.xs(n - 1)), py(f.ys(n - 1)),
          px(f.xs(0)), py(f.ys(0)), lineRgb)
    }
    toPng(img)
  }

  /** DISTRIBUTED styled rendering — per-tile colormapped RGB PNGs (the
    * tile-served mapshow; scale path: one task per tile, nothing on the
    * driver). Output (cellId, png). */
  def rgbTiles(tiles: Dataset[Tile], lo: Double, hi: Double,
      ramp: Ramp = Terrain): Dataset[(Long, Array[Byte])] = {
    import tiles.sparkSession.implicits._
    val span = hi - lo
    tiles.map { t =>
      val img = new BufferedImage(t.w, t.h, BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < t.payload.length) {
        val v = t.payload(i)
        img.setRGB(i % t.w, i / t.w,
          if (v.isNaN) NoDataRgb else ramp(normed(v, lo, span)))
        i += 1
      }
      (t.cellId, toPng(img))
    }
  }
}
