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
    val (codes, w, h) = allCodes(bytes)
    val out = new Array[Double](w * h)
    val png = fmt == "png"
    var i = 0
    while (i < out.length) {
      val code = codes(i)
      out(i) =
        if (png && code == PngNaN) Double.NaN
        else if (png) code / PngScale
        else if (code == JpgNaN) Double.NaN
        else code / JpgScale
      i += 1
    }
    (out, w, h)
  }

  /** Minimal PNG decoder for the codec's OWN output shape — 16-bit gray,
    * colorType 0, non-interlaced (public PNG spec: IHDR/IDAT chunks,
    * zlib inflate, per-row filters 0-4) — skipping ImageIO's reader
    * machinery costs ~2x less per 256x256 tile, and decode is the
    * pipeline's wall-clock floor. Returns None for anything else (JPEG,
    * foreign PNGs) and the caller falls back to ImageIO. */
  private def fastPngCodes(bytes: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    if (bytes.length < 33 ||
      bytes(0) != 0x89.toByte || bytes(1) != 'P' || bytes(2) != 'N') return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    // IHDR is always first
    if (new String(bytes, 12, 4, "ASCII") != "IHDR") return None
    val w = be32(16)
    val h = be32(20)
    val bitDepth = bytes(24)
    val colorType = bytes(25)
    val interlace = bytes(28)
    if (bitDepth != 16 || colorType != 0 || interlace != 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return None
    // concatenate IDAT payloads; every chunk is bounds-checked (a corrupt
    // length must yield None — the ImageIO fallback — not a throw or a
    // backwards-walking offset loop)
    val idat = new ByteArrayOutputStream()
    var o = 8
    var ok = true
    while (o + 8 <= bytes.length && ok) {
      val len = be32(o)
      if (len < 0 || o + 8 + len > bytes.length) return None // corrupt chunk
      val typ = new String(bytes, o + 4, 4, "ASCII")
      if (typ == "IDAT") idat.write(bytes, o + 8, len)
      if (typ == "IEND") ok = false
      o += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val stride = w * 2
    val raw = new Array[Byte]((stride + 1) * h)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // needsDictionary (FDICT zlib streams) also yields n == 0 with
        // finished() false — treat as corrupt, never spin
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got != raw.length) return None
    // unfilter rows (bpp = 2) in place into the code array
    val out = new Array[Int](w * h)
    val cur = new Array[Int](stride) // unfiltered byte values of this row
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      val ft = raw(base) & 0xFF
      var x = 0
      while (x < stride) {
        val rawB = raw(base + 1 + x) & 0xFF
        val a = if (x >= 2) cur(x - 2) else 0
        val b = prev(x)
        val c = if (x >= 2) prev(x - 2) else 0
        cur(x) = ft match {
          case 0 => rawB
          case 1 => (rawB + a) & 0xFF
          case 2 => (rawB + b) & 0xFF
          case 3 => (rawB + ((a + b) >> 1)) & 0xFF
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (rawB + pred) & 0xFF
          case _ => return None
        }
        x += 1
      }
      var px = 0
      while (px < w) {
        out(y * w + px) = (cur(px * 2) << 8) | cur(px * 2 + 1)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some((out, w, h))
  }

  /** Raw code plane as a flat int array, bypassing per-pixel SampleModel
    * indirection when the decoded gray image is array-backed (it always is
    * for ImageIO's gray PNG/JPEG outputs): ~5x over getSample loops. */
  private def codesOf(img: BufferedImage): Array[Int] = {
    import java.awt.image.{DataBufferByte, DataBufferUShort}
    val raster = img.getRaster
    val n = img.getWidth * img.getHeight
    raster.getDataBuffer match {
      case us: DataBufferUShort if us.getData.length == n =>
        val d = us.getData
        Array.tabulate(n)(i => d(i) & 0xFFFF)
      case b: DataBufferByte if b.getData.length == n =>
        val d = b.getData
        Array.tabulate(n)(i => d(i) & 0xFF)
      case _ =>
        val w = img.getWidth
        Array.tabulate(n)(i => raster.getSample(i % w, i / w, 0))
    }
  }

  /** Fused decode+stats: NaN-aware (validCount, max) computed directly on
    * the code plane — aggregation pushdown into the codec domain, so the
    * 512KB double[] per tile is never materialized when only stats are
    * needed. For the engine's own 16-bit-gray PNGs the stats run FULLY
    * STREAMING over thread-local row scratch (~3KB live per thread): no
    * IDAT copy, no whole-image inflate buffer, no code-plane array. At
    * 16k tiles the eager path allocated ~450KB/tile (7+ GB of traffic on
    * the shared memory bus — the measured local[32] scaling ceiling); the
    * streaming path is cache-resident. */
  def decodeStats(bytes: Array[Byte], fmt: String): (Long, Double, Int) = {
    val png = fmt == "png"
    val nanCode = if (png) PngNaN else JpgNaN
    val scale = if (png) PngScale else JpgScale
    val streamed = if (png) fastPngStats(bytes, nanCode) else None
    val (valid, maxCode, npx) = streamed.getOrElse {
      val (codes, _, _) = allCodes(bytes)
      var mx = -1
      var v = 0L
      var i = 0
      while (i < codes.length) {
        val code = codes(i)
        if (code != nanCode) {
          v += 1
          if (code > mx) mx = code
        }
        i += 1
      }
      (v, mx, codes.length)
    }
    (valid, if (maxCode < 0) Double.NaN else maxCode / scale, npx)
  }

  /** Per-thread row scratch for the streaming PNG stats path. */
  private final class PngScratch {
    var rowRaw: Array[Byte] = new Array[Byte](0) // filter byte + one filtered row
    var cur: Array[Int] = new Array[Int](0) // unfiltered bytes, this row
    var prev: Array[Int] = new Array[Int](0)
    def ensure(stride: Int): Unit = {
      if (rowRaw.length < stride + 1) {
        rowRaw = new Array[Byte](stride + 1)
        cur = new Array[Int](stride)
        prev = new Array[Int](stride)
      }
      java.util.Arrays.fill(prev, 0, stride, 0)
    }
  }
  private val pngScratch = ThreadLocal.withInitial[PngScratch](() => new PngScratch)

  /** Streaming (valid, maxCode, npx) over a 16-bit-gray non-interlaced PNG:
    * the Inflater is fed IDAT chunk REGIONS of the source array directly
    * (no concatenation copy) and pulled one scanline at a time; rows
    * unfilter into reused thread-local scratch and fold straight into the
    * stats. None for foreign/corrupt PNGs -> caller falls back to the
    * materializing path. */
  private def fastPngStats(bytes: Array[Byte], nanCode: Int): Option[(Long, Int, Int)] = {
    if (bytes.length < 33 ||
      bytes(0) != 0x89.toByte || bytes(1) != 'P' || bytes(2) != 'N') return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    if (new String(bytes, 12, 4, "ASCII") != "IHDR") return None
    val w = be32(16)
    val h = be32(20)
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return None
    if (bytes(24) != 16 || bytes(25) != 0 || bytes(28) != 0) return None
    val stride = w * 2
    val s = pngScratch.get()
    s.ensure(stride)
    val rowRaw = s.rowRaw
    var cur = s.cur
    var prev = s.prev
    val inf = new java.util.zip.Inflater()
    // walk chunks lazily; o points at the next unread chunk header
    var o = 8
    def feed(): Boolean = {
      while (o + 8 <= bytes.length) {
        val len = be32(o)
        if (len < 0 || o + 8 + len > bytes.length) return false // corrupt
        val typ = new String(bytes, o + 4, 4, "ASCII")
        if (typ == "IDAT") { inf.setInput(bytes, o + 8, len); o += 12 + len; return true }
        if (typ == "IEND") return false
        o += 12 + len
      }
      false
    }
    try {
      var valid = 0L
      var maxCode = -1
      var y = 0
      while (y < h) {
        // pull exactly one scanline (filter byte + stride)
        var got = 0
        while (got < stride + 1) {
          val n = inf.inflate(rowRaw, got, stride + 1 - got)
          got += n
          if (n == 0) {
            // finished-early, FDICT dictionary request, or input exhausted:
            // all corrupt/foreign streams -> None (fall back to ImageIO)
            if (inf.finished() || inf.needsDictionary() ||
                (inf.needsInput() && !feed())) return None
          }
        }
        val ft = rowRaw(0) & 0xFF
        if (ft > 4) return None
        var x = 0
        while (x < stride) {
          val rawB = rowRaw(1 + x) & 0xFF
          val a = if (x >= 2) cur(x - 2) else 0
          val b = prev(x)
          val un = ft match {
            case 0 => rawB
            case 1 => (rawB + a) & 0xFF
            case 2 => (rawB + b) & 0xFF
            case 3 => (rawB + ((a + b) >> 1)) & 0xFF
            case _ =>
              val c = if (x >= 2) prev(x - 2) else 0
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              (rawB + pred) & 0xFF
          }
          cur(x) = un
          if ((x & 1) == 1) { // low byte closes one 16-bit sample
            val code = (cur(x - 1) << 8) | un
            if (code != nanCode) {
              valid += 1
              if (code > maxCode) maxCode = code
            }
          }
          x += 1
        }
        val t = prev; prev = cur; cur = t // rotate row buffers, no copy
        y += 1
      }
      Some((valid, maxCode, w * h))
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Raw 8/16-bit code plane (for PSNR in code space). */
  def decodeCodes(bytes: Array[Byte]): (Array[Int], Int, Int) = allCodes(bytes)

  // thread-local reader reuse: ImageIO.read scans the registry and
  // instantiates a fresh reader per call — measurable per-tile overhead
  // on small images; setInput resets reader state (the standard reuse
  // pattern), one reader per executor thread.
  private val jpegReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("jpeg").next())

  private def readJpeg(bytes: Array[Byte]): BufferedImage = {
    val r = jpegReader.get()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      r.setInput(iis, true, true)
      r.read(0)
    } finally iis.close()
  }

  private def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8

  /** Code plane via the fast PNG path when applicable, then the reused
    * JPEG reader, else generic ImageIO. */
  private def allCodes(bytes: Array[Byte]): (Array[Int], Int, Int) =
    fastPngCodes(bytes).getOrElse {
      val img =
        if (isJpeg(bytes)) readJpeg(bytes)
        else ImageIO.read(new ByteArrayInputStream(bytes))
      (codesOf(img), img.getWidth, img.getHeight)
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

  /** Horizontal mirror: dst(r, c) = src(r, w-1-c). */
  def flipH(src: Array[Double], w: Int, h: Int): Array[Double] = {
    require(src.length == w * h)
    val out = new Array[Double](src.length)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { out(r * w + c) = src(r * w + (w - 1 - c)); c += 1 }
      r += 1
    }
    out
  }

  /** ViT-style patchification: split an h x w plane into non-overlapping
    * ps x ps patches in raster order (patch-row major, each patch itself
    * raster order) — the vision-model input prep that turns one image
    * into (h/ps)*(w/ps) token vectors. Requires exact tiling (the
    * resize/crop kernels produce it); concatenating the output in order
    * does NOT reproduce the plane (patches interleave rows), which is
    * what the reassembly test pins down. Per-image kernel, no shuffle. */
  def patchify(src: Array[Double], w: Int, h: Int,
      ps: Int): Array[Array[Double]] = {
    require(ps > 0 && w % ps == 0 && h % ps == 0,
      s"patchify: $w x $h not tiled by $ps")
    val pw = w / ps; val ph = h / ps
    val out = new Array[Array[Double]](pw * ph)
    var pr = 0
    while (pr < ph) {
      var pc = 0
      while (pc < pw) {
        val p = new Array[Double](ps * ps)
        var r = 0
        while (r < ps) {
          var c = 0
          while (c < ps) {
            p(r * ps + c) = src((pr * ps + r) * w + (pc * ps + c)); c += 1
          }
          r += 1
        }
        out(pr * pw + pc) = p
        pc += 1
      }
      pr += 1
    }
    out
  }

  /** Clockwise quarter-turn: for an h x w source the output is w x h with
    * dst(r, c) = src(h-1-c, r). */
  def rot90cw(src: Array[Double], w: Int, h: Int): Array[Double] = {
    require(src.length == w * h)
    val out = new Array[Double](src.length)
    var r = 0
    while (r < w) { // output rows = w
      var c = 0
      while (c < h) { out(r * h + c) = src((h - 1 - c) * w + r); c += 1 }
      r += 1
    }
    out
  }

  /** Center crop of cw x ch (top-left at ((h-ch)/2, (w-cw)/2)). */
  def cropCenter(src: Array[Double], w: Int, h: Int,
      cw: Int, ch: Int): Array[Double] = {
    require(src.length == w * h && cw <= w && ch <= h)
    val r0 = (h - ch) / 2; val c0 = (w - cw) / 2
    val out = new Array[Double](cw * ch)
    var r = 0
    while (r < ch) {
      System.arraycopy(src, (r0 + r) * w + c0, out, r * cw, cw)
      r += 1
    }
    out
  }

  /** Bilinear resize of a row-major plane with pixel-center alignment
    * (output pixel (r, c) samples the source at
    * ((r+0.5)*h/h2 - 0.5, (c+0.5)*w/w2 - 0.5), edges clamped) — the image
    * `resize` feature-pipeline op; a purely per-image kernel, so the
    * Spark shape is one map over decoded rows (no shuffle). Any NaN
    * among the four taps propagates (sentinel pixels stay sentinels). */
  def resizeBilinear(src: Array[Double], w: Int, h: Int,
      w2: Int, h2: Int): Array[Double] = {
    require(src.length == w * h && w2 > 0 && h2 > 0)
    val out = new Array[Double](w2 * h2)
    val sx = w.toDouble / w2
    val sy = h.toDouble / h2
    var r = 0
    while (r < h2) {
      val fy = (r + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var c = 0
      while (c < w2) {
        val fx = (c + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        val v00 = src(y0 * w + x0); val v01 = src(y0 * w + x1)
        val v10 = src(y1 * w + x0); val v11 = src(y1 * w + x1)
        out(r * w2 + c) =
          (v00 * (1 - wx) + v01 * wx) * (1 - wy) +
            (v10 * (1 - wx) + v11 * wx) * wy
        c += 1
      }
      r += 1
    }
    out
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

  /** Per-image quality statistics in the PNG fixed-point code domain
    * (q = rint(v * PngScale)) — the gates a multimodal curation pipeline
    * applies before training: contrast (qMin/qMax span), texture richness
    * (distinct code count — near-constant images are screensaver/solid-fill
    * junk), and an L1 gradient energy `gradL1 = Σ|Δq|` over horizontal +
    * vertical neighbor pairs (the blur/sharpness proxy: blurred content has
    * low gradient energy). All-Long arithmetic so results are exact and
    * order-free; NaN pixels are skipped (and break gradient pairs). */
  final case class QualityStats(qMin: Long, qMax: Long, nValid: Long,
      nDistinct: Long, gradL1: Long)

  def qualityStats(values: Array[Double], w: Int, h: Int): QualityStats = {
    var qMin = Long.MaxValue
    var qMax = Long.MinValue
    var nValid = 0L
    val seen = new java.util.HashSet[Long]()
    var grad = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = values(r * w + c)
        if (!v.isNaN) {
          val q = Math.rint(v * PngScale).toLong
          if (q < qMin) qMin = q
          if (q > qMax) qMax = q
          nValid += 1
          seen.add(q)
          if (c + 1 < w) {
            val vr = values(r * w + c + 1)
            if (!vr.isNaN) grad += math.abs(Math.rint(vr * PngScale).toLong - q)
          }
          if (r + 1 < h) {
            val vd = values((r + 1) * w + c)
            if (!vd.isNaN) grad += math.abs(Math.rint(vd * PngScale).toLong - q)
          }
        }
        c += 1
      }
      r += 1
    }
    QualityStats(if (nValid == 0) 0L else qMin, if (nValid == 0) 0L else qMax,
      nValid, seen.size.toLong, grad)
  }

  /** Histogram equalization in the integer code domain: remap each pixel
    * code q to `floor((cdf(q) - cdfMin) * (levels-1) / (n - cdfMin))` where
    * cdf(q) counts pixels <= q and cdfMin is the cdf of the smallest present
    * code — the classic per-image contrast-normalization pass an image
    * training pipeline runs before augmentation (the reference normalizes
    * contrast driver-side via matplotlib vmin/vmax at render time,
    * grid_show.py:33-135; this is the engine-side, per-row analogue that
    * rewrites the pixels themselves). All-Long arithmetic with floor
    * division over non-negative operands, so the remap is exact and
    * engine-independent; a constant image (n == cdfMin) maps to the top
    * level. Codes must be non-negative and their range driver-independent
    * small (one histogram per IMAGE, never per partition — the 2^20 bound
    * keeps a hostile code from allocating gigabytes inside a task). */
  def equalizeCodes(codes: Array[Int], levels: Int): Array[Int] = {
    require(levels >= 2, s"equalizeCodes: levels must be >= 2, got $levels")
    val n = codes.length
    if (n == 0) return new Array[Int](0)
    var maxCode = 0
    var i = 0
    while (i < n) {
      val q = codes(i)
      require(q >= 0, s"equalizeCodes: negative code $q at index $i")
      if (q > maxCode) maxCode = q
      i += 1
    }
    require(maxCode <= (1 << 20),
      s"equalizeCodes: max code $maxCode exceeds the 2^20 histogram bound")
    val hist = new Array[Long](maxCode + 1)
    i = 0
    while (i < n) { hist(codes(i)) += 1; i += 1 }
    val eq = new Array[Int](maxCode + 1)
    var cum = 0L
    var cdfMin = -1L
    var q = 0
    while (q <= maxCode) {
      if (hist(q) > 0) {
        cum += hist(q)
        if (cdfMin < 0) cdfMin = cum
        eq(q) =
          if (n == cdfMin) levels - 1
          else (((cum - cdfMin) * (levels - 1)) / (n - cdfMin)).toInt
      }
      q += 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = eq(codes(i)); i += 1 }
    out
  }
}
