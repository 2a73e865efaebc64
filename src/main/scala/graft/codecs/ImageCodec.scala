package graft.codecs

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Pure-JVM grayscale image codec for the engine's image+caption corpus
  * (BASELINE.json input_hint: rows carry encoded `bytes` whose decoded pixel
  * buffer is one raster tile).
  *
  * Quantization rule (part of the fixture spec, FIXTURES.md §3):
  *   - PNG: 16-bit gray, code = round(v * 64) clamped to [0, 65534];
  *     NaN -> sentinel 65535. Exact for quarter-step fixture values, so
  *     decode(encode(x)) == x and PSNR is infinite (lossless gate).
  *   - JPEG: 8-bit gray, code = round(v * 2) clamped [0, 254]; NaN -> 255;
  *     quality 0.92 -> PSNR >= 40 dB on smooth terrain (lossy gate).
  * All methods are executor-safe (no shared state).
  */
object ImageCodec {

  // ImageIO's default stream cache is FILE-backed — 32 executor threads
  // contend on /tmp and serialize; in-memory cache restores parallel
  // encode/decode throughput.
  ImageIO.setUseCache(false)

  final val PngScale = 64.0
  final val PngNaN = 65535
  final val JpgScale = 2.0
  final val JpgNaN = 255

  def encodePng(values: Array[Double], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < values.length) {
      val v = values(i)
      val code =
        if (v.isNaN) PngNaN
        else math.max(0, math.min(65534, Math.rint(v * PngScale).toInt))
      raster.setSample(i % w, i / w, 0, code)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeJpg(values: Array[Double], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < values.length) {
      val v = values(i)
      val code =
        if (v.isNaN) JpgNaN
        else math.max(0, math.min(254, Math.rint(v * JpgScale).toInt))
      raster.setSample(i % w, i / w, 0, code)
      i += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.92f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Decode to the grid-value domain (inverse quantization; NaN sentinel
    * restored for PNG — JPEG NaN cells come back lossy, callers that need
    * the nodata mask must carry it out-of-band or use PNG). */
  def decode(bytes: Array[Byte], fmt: String): (Array[Double], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](w * h)
    val raster = img.getRaster
    val png = fmt == "png"
    var i = 0
    while (i < out.length) {
      val code = raster.getSample(i % w, i / w, 0)
      out(i) =
        if (png && code == PngNaN) Double.NaN
        else if (png) code / PngScale
        else if (code == JpgNaN) Double.NaN
        else code / JpgScale
      i += 1
    }
    (out, w, h)
  }

  /** Fused decode+stats: NaN-aware (validCount, max) computed directly on
    * the code plane — aggregation pushdown into the codec domain, so the
    * 512KB double[] per tile is never materialized when only stats are
    * needed (the decoded buffer lives only as the codec's short raster). */
  def decodeStats(bytes: Array[Byte], fmt: String): (Long, Double, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val png = fmt == "png"
    val nanCode = if (png) PngNaN else JpgNaN
    val scale = if (png) PngScale else JpgScale
    var maxCode = -1
    var valid = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val code = raster.getSample(x, y, 0)
        if (code != nanCode) {
          valid += 1
          if (code > maxCode) maxCode = code
        }
        x += 1
      }
      y += 1
    }
    (valid, if (maxCode < 0) Double.NaN else maxCode / scale, w * h)
  }

  /** Raw 8/16-bit code plane (for PSNR in code space). */
  def decodeCodes(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    var i = 0
    while (i < out.length) {
      out(i) = raster.getSample(i % w, i / w, 0)
      i += 1
    }
    (out, w, h)
  }

  /** PSNR in dB between two same-length planes; Infinity when identical.
    * The >= 40 dB invariant for lossy formats (BASELINE.json input_hint). */
  def psnr(a: Array[Double], b: Array[Double], maxVal: Double): Double = {
    require(a.length == b.length)
    var se = 0.0
    var n = 0
    var i = 0
    while (i < a.length) {
      if (!a(i).isNaN && !b(i).isNaN) {
        val d = a(i) - b(i)
        se += d * d
        n += 1
      }
      i += 1
    }
    if (n == 0 || se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(maxVal * maxVal / (se / n))
  }

  /** 64-bit average-hash: 8x8 block-mean downsample thresholded at the
    * global mean (FIXTURES.md §3 phash spec). NaN cells excluded. */
  def phash64(values: Array[Double], w: Int, h: Int): Long = {
    val means = new Array[Double](64)
    var bi = 0
    while (bi < 64) {
      val bx = bi % 8
      val by = bi / 8
      val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var s = 0.0
      var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val v = values(y * w + x)
          if (!v.isNaN) { s += v; n += 1 }
          x += 1
        }
        y += 1
      }
      means(bi) = if (n == 0) 0.0 else s / n
      bi += 1
    }
    val mean = means.sum / 64
    var hash = 0L
    bi = 0
    while (bi < 64) {
      if (means(bi) > mean) hash |= (1L << bi)
      bi += 1
    }
    hash
  }
}
