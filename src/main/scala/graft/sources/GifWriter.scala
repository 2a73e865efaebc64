package graft.sources

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode

/** Animated-GIF export of a raster sequence — the reference `make_gif`
  * (grid_show.py:187-215, matplotlib.animation -> imagemagick). Re-done on
  * the JDK's built-in GIF89a codec: each grid renders as an 8-bit
  * grayscale frame (values scaled [lo, hi] -> 0..255, NaN -> 0/black, the
  * nodata-renders-dark convention), with per-frame delay and infinite
  * looping via the NETSCAPE2.0 application extension. `make_mp4`
  * (grid_show.py:217-237) stays out of scope: no video codec ships with
  * the JVM, and the reference itself shells out to ffmpeg. */
object GifWriter {

  private def grayFrame(data: Array[Double], w: Int, h: Int,
      lo: Double, hi: Double): BufferedImage = {
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
    img
  }

  /** Write `frames` (row-major grids, all w x h) as one looping GIF. */
  def writeAnimated(path: String, frames: Seq[Array[Double]], w: Int, h: Int,
      lo: Double, hi: Double, delayCs: Int = 50): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      writeAnimatedBytes(frames, w, h, lo, hi, delayCs))

  /** Same GIF89a stream as [[writeAnimated]] but in memory — the video
    * binary-column producer (clips-as-bytes tables).
    *
    * KNOWN JDK QUIRK: at very small frame heights (observed at 8x4) the
    * JDK GIF writer drops the last pixel row on round trip; at the
    * engine's clip sizes (48x32 and up) round trips are exact — pinned
    * by the v1/v2 integer hash gates and the CodecSpec round-read. Keep
    * test fixtures at 48x32+. */
  def writeAnimatedBytes(frames: Seq[Array[Double]], w: Int, h: Int,
      lo: Double, hi: Double, delayCs: Int = 50): Array[Byte] = {
    require(frames.nonEmpty)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.zipWithIndex.foreach { case (data, idx) =>
      require(data.length == w * h, s"frame $idx size")
      val img = grayFrame(data, w, h, lo, hi)
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      // per-frame delay
      val gce = {
        var n: IIOMetadataNode = null
        val kids = root.getChildNodes
        for (i <- 0 until kids.getLength)
          if (kids.item(i).getNodeName == "GraphicControlExtension")
            n = kids.item(i).asInstanceOf[IIOMetadataNode]
        if (n == null) {
          n = new IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n)
        }
        n
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      if (idx == 0) { // NETSCAPE2.0 loop-forever extension on frame 1
        val apps = new IIOMetadataNode("ApplicationExtensions")
        val app = new IIOMetadataNode("ApplicationExtension")
        app.setAttribute("applicationID", "NETSCAPE")
        app.setAttribute("authenticationCode", "2.0")
        app.setUserObject(Array[Byte](1, 0, 0)) // loop count 0 = forever
        apps.appendChild(app)
        root.appendChild(apps)
      }
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }
}
