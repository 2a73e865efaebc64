package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.core.Feature

/** Minimal pure-JVM ESRI shapefile reader (reference
  * `read_shapefile_as_list`, spatial_analysis.py:229-241, which returns
  * geometry dicts + attribute records via pyshp). Supports the shapes the
  * reference exercises: Polygon (5) and PolyLine (3), single or multi part,
  * plus numeric ('N') dbf fields; that is the entire surface the reference
  * consumes (FIXTURES.md §1 decodes the sample: shapeType=5, fields
  * id N(10,0), adjust_val N(21,2) with NULL padding). */
object ShpReader {

  final case class Shape(kind: String, parts: Seq[(Array[Double], Array[Double])])
  final case class ShpFile(shapes: Seq[Shape], records: Seq[Map[String, Option[Double]]])

  def read(shpPath: String): ShpFile = {
    val shapes = readShp(shpPath)
    val dbfPath = shpPath.stripSuffix(".shp") + ".dbf"
    val records =
      if (Files.exists(Paths.get(dbfPath))) readDbf(dbfPath)
      else Seq.fill(shapes.size)(Map.empty[String, Option[Double]])
    ShpFile(shapes, records)
  }

  /** Shapes + numeric attrs as engine Features (burn attribute chosen by
    * `attrField`; NULL attr -> NaN, the reference's null-dbf path). */
  def readFeatures(shpPath: String, attrField: String): Seq[Feature] = {
    val f = read(shpPath)
    f.shapes.zip(f.records).zipWithIndex.map { case ((shape, rec), i) =>
      val (xs, ys) = shape.parts.head // reference burns outer rings
      Feature(i.toLong, shape.kind, xs, ys,
        rec.get(attrField).flatten.getOrElse(Double.NaN), seq = i)
    }
  }

  private def readShp(path: String): Seq[Shape] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"not a shapefile: $path")
    val shapes = Seq.newBuilder[Shape]
    var pos = 100
    while (pos < bytes.length) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val contentWords = buf.getInt(pos + 4)
      // record content length is untrusted input: <= 0 would stall the
      // walk or move it backwards (infinite loop on a truncated file)
      require(contentWords > 0 && pos + 8 + contentWords * 2L <= bytes.length,
        s"shapefile record at $pos claims $contentWords words of " +
          s"${(bytes.length - pos - 8) / 2} remaining: $path")
      val content = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = buf.getInt(content)
      if (shapeType == 5 || shapeType == 3) {
        val numParts = buf.getInt(content + 36)
        val numPoints = buf.getInt(content + 40)
        val partsOff = content + 44
        val pointsOff = partsOff + 4 * numParts
        val partStarts = (0 until numParts).map(i => buf.getInt(partsOff + 4 * i))
        val bounds = partStarts :+ numPoints
        val parts = (0 until numParts).map { p =>
          val n = bounds(p + 1) - bounds(p)
          val xs = new Array[Double](n)
          val ys = new Array[Double](n)
          var i = 0
          while (i < n) {
            xs(i) = buf.getDouble(pointsOff + 16 * (bounds(p) + i))
            ys(i) = buf.getDouble(pointsOff + 16 * (bounds(p) + i) + 8)
            i += 1
          }
          (xs, ys)
        }
        shapes += Shape(if (shapeType == 5) "polygon" else "polyline", parts)
      }
      pos = content + contentWords * 2
    }
    shapes.result()
  }

  private def readDbf(path: String): Seq[Map[String, Option[Double]]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF
    // field descriptors: 32 bytes each from offset 32 until terminator 0x0D
    val fields = Seq.newBuilder[(String, Char, Int)]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0D) {
      val name = new String(bytes, off, 11, "ASCII").takeWhile(_ != 0).trim
      val ftype = bytes(off + 11).toChar
      val flen = bytes(off + 16) & 0xFF
      fields += ((name, ftype, flen))
      off += 32
    }
    val fs = fields.result()
    (0 until numRecords).map { r =>
      var p = headerSize + r * recordSize + 1 // skip deletion flag
      fs.map { case (name, ftype, flen) =>
        val raw = new String(bytes, p, flen, "ASCII").trim
        p += flen
        val v =
          if (ftype == 'N' && raw.nonEmpty && raw != "*" * raw.length)
            try Some(raw.toDouble) catch { case _: NumberFormatException => None }
          else None
        name -> v
      }.toMap
    }
  }
}
