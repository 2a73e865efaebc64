package graft.sources

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Motion-JPEG-in-AVI export of a raster sequence — the engine's analog of
  * the reference `make_mp4` (grid_show.py:217-237, matplotlib.animation
  * shelling out to ffmpeg). No video codec ships with the JVM, so the
  * container is written directly from the public AVI RIFF spec
  * (MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER / idx1) with each
  * frame a baseline JPEG `00dc` chunk — the oldest, most widely decodable
  * video container+codec pair (VLC/ffmpeg/mplayer all play it).
  *
  * Grids render with the same grayscale convention as [[GifWriter]]:
  * values scaled [lo, hi] -> 0..255, NaN -> black. */
object MjpegAvi {

  private def grayJpeg(data: Array[Double], w: Int, h: Int,
      lo: Double, hi: Double): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val span = if (hi > lo) hi - lo else 1.0
    var i = 0
    while (i < data.length) {
      val v = data(i)
      val g =
        if (v.isNaN) 0
        else math.max(0, math.min(255, ((v - lo) / span * 255.0).toInt))
      raster.setSample(i % w, i / w, 0, g)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private final class W {
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("ASCII"))
    def u32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >>> 8) & 0xFF)
      bos.write((v >>> 16) & 0xFF); bos.write((v >>> 24) & 0xFF)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >>> 8) & 0xFF) }
  }

  /** Write `frames` (row-major grids, all w x h) as one MJPEG AVI. */
  def writeAnimated(path: String, frames: Seq[Array[Double]], w: Int, h: Int,
      lo: Double, hi: Double, fps: Int = 10): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      writeAnimatedBytes(frames, w, h, lo, hi, fps))

  /** Same AVI stream in memory (binary-column producer form). */
  def writeAnimatedBytes(frames: Seq[Array[Double]], w: Int, h: Int,
      lo: Double, hi: Double, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(fps > 0, s"fps must be positive, got $fps")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == w * h, s"frame $i size ${f.length} != ${w * h}")
    }
    val jpegs = frames.map(f => grayJpeg(f, w, h, lo, hi)).toArray
    val n = jpegs.length
    val maxSz = jpegs.map(_.length).max
    def chunkLen(sz: Int) = 8 + sz + (sz & 1) // chunks pad to even

    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + jpegs.map(j => chunkLen(j.length)).sum
    val idxSize = 16 * n
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)

    val o = new W
    o.cc("RIFF"); o.u32(riffSize); o.cc("AVI ")
    o.cc("LIST"); o.u32(hdrlSize); o.cc("hdrl")
    // MainAVIHeader
    o.cc("avih"); o.u32(56)
    o.u32(1000000 / fps) // dwMicroSecPerFrame
    o.u32(maxSz * fps) // dwMaxBytesPerSec
    o.u32(0) // dwPaddingGranularity
    o.u32(0x10) // dwFlags: AVIF_HASINDEX
    o.u32(n); o.u32(0) // dwTotalFrames, dwInitialFrames
    o.u32(1) // dwStreams
    o.u32(maxSz) // dwSuggestedBufferSize
    o.u32(w); o.u32(h)
    o.u32(0); o.u32(0); o.u32(0); o.u32(0) // dwReserved[4]
    o.cc("LIST"); o.u32(strlSize); o.cc("strl")
    // AVIStreamHeader
    o.cc("strh"); o.u32(56)
    o.cc("vids"); o.cc("MJPG")
    o.u32(0) // dwFlags
    o.u16(0); o.u16(0) // wPriority, wLanguage
    o.u32(0) // dwInitialFrames
    o.u32(1); o.u32(fps) // dwScale, dwRate -> fps frames/sec
    o.u32(0); o.u32(n) // dwStart, dwLength
    o.u32(maxSz) // dwSuggestedBufferSize
    o.u32(-1); o.u32(0) // dwQuality (default), dwSampleSize (varying)
    o.u16(0); o.u16(0); o.u16(w); o.u16(h) // rcFrame
    // BITMAPINFOHEADER with biCompression = 'MJPG'
    o.cc("strf"); o.u32(40)
    o.u32(40); o.u32(w); o.u32(h)
    o.u16(1); o.u16(24) // biPlanes, biBitCount
    o.cc("MJPG")
    o.u32(w * h * 3) // biSizeImage
    o.u32(0); o.u32(0); o.u32(0); o.u32(0)
    // movi: one keyframe JPEG chunk per frame
    o.cc("LIST"); o.u32(moviSize); o.cc("movi")
    val offsets = new Array[Int](n)
    var off = 4 // idx1 offsets are relative to the 'movi' fourcc
    var i = 0
    while (i < n) {
      offsets(i) = off
      o.cc("00dc"); o.u32(jpegs(i).length); o.bos.write(jpegs(i))
      if ((jpegs(i).length & 1) == 1) o.bos.write(0)
      off += chunkLen(jpegs(i).length)
      i += 1
    }
    // idx1: every frame a keyframe
    o.cc("idx1"); o.u32(idxSize)
    i = 0
    while (i < n) {
      o.cc("00dc"); o.u32(0x10); o.u32(offsets(i)); o.u32(jpegs(i).length)
      i += 1
    }
    o.bos.toByteArray
  }

  /** Extract the per-frame JPEG byte streams back out of an AVI produced
    * by [[writeAnimatedBytes]] (RIFF walk of the movi list) — each element
    * decodes with ImageIO directly. */
  def readFrameJpegs(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def cc(o: Int): String = new String(bytes, o, 4, "ASCII")
    require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      "not an AVI stream")
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = cc(pos)
      val sz = le32(pos + 4)
      if (id == "LIST" && pos + 12 <= bytes.length && cc(pos + 8) == "movi") {
        var q = pos + 12
        val end = math.min(bytes.length, pos + 8 + sz)
        while (q + 8 <= end) {
          val cid = cc(q)
          val csz = le32(q + 4)
          if (cid == "00dc" && q + 8 + csz <= end)
            out += java.util.Arrays.copyOfRange(bytes, q + 8, q + 8 + csz)
          q += 8 + csz + (csz & 1)
        }
      }
      pos += 8 + sz + (sz & 1)
    }
    out.toSeq
  }
}
