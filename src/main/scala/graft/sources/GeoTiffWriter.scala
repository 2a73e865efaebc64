package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.core.GridRef

/** Minimal pure-JVM single-band Float32 GeoTIFF writer (reference
  * `write_tif`, Raster.py:586-630 via rasterio — no GDAL in the sandbox,
  * SURVEY.md §7.5, so the subset needed for parity artifacts is written
  * by hand from the public TIFF 6.0 + GeoTIFF 1.1 specs):
  * little-endian, uncompressed, SampleFormat=IEEE float, single strip OR
  * tiled layout (`tileSize` > 0, multiple of 16 per spec), ModelPixelScale
  * + ModelTiepoint georeferencing (north-up, square pixels — the only
  * affine the reference supports), projected-CRS GeoKeys, GDAL_NODATA
  * ascii tag; NaN -> nodata fill on egress (Raster.py:623-624). */
object GeoTiffWriter {

  def write(path: String, ref: GridRef, data: Array[Double],
      epsg: Int = 27700, tileSize: Int = 0): Unit = {
    require(data.length == ref.ncols * ref.nrows)
    require(tileSize == 0 || tileSize % 16 == 0, "TIFF tiles must be n*16")
    // an EPSG-coded crs on the header wins over the parameter default
    val epsgEff = if (ref.epsg > 0) ref.epsg else epsg
    val tiled = tileSize > 0
    // padded to >= 5 bytes (extra NULs are legal ASCII padding): a count
    // <= 4 would require the value INLINE in the tag slot per the TIFF
    // spec, but this writer always emits an offset — short nodata strings
    // like "0" would otherwise round-trip as garbage
    val nodataAscii = (AscIO.formatG(ref.nodata) + "\u0000")
      .padTo(5, '\u0000').getBytes("ASCII")

    val tilesX = if (tiled) (ref.ncols + tileSize - 1) / tileSize else 1
    val tilesY = if (tiled) (ref.nrows + tileSize - 1) / tileSize else 1
    val nTiles = tilesX * tilesY
    val tileBytes = if (tiled) tileSize * tileSize * 4 else ref.ncols * ref.nrows * 4

    val nTags = if (tiled) 15 else 14
    val headerSize = 8
    val ifdSize = 2 + nTags * 12 + 4
    // out-of-line value areas, placed after the IFD
    var cursor = headerSize + ifdSize
    val pixelScaleOff = cursor; cursor += 3 * 8
    val tiepointOff = cursor; cursor += 6 * 8
    val geoKeysOff = cursor
    val geoKeys: Array[Short] = Array(
      1, 1, 0, 3, // version, rev 1.0, 3 keys follow
      1024, 0, 1, 1, // GTModelTypeGeoKey = Projected
      1025, 0, 1, 1, // GTRasterTypeGeoKey = PixelIsArea
      3072, 0, 1, epsgEff.toShort) // ProjectedCSTypeGeoKey
    cursor += geoKeys.length * 2
    val nodataOff = cursor; cursor += nodataAscii.length
    if (cursor % 2 == 1) cursor += 1
    // tile offset/count arrays (out-of-line when nTiles > 1)
    val offsArrayOff = cursor
    if (tiled && nTiles > 1) cursor += nTiles * 4 * 2 // offsets + counts
    val dataOff = cursor

    val buf = ByteBuffer.allocate(dataOff + nTiles * tileBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerSize)
    // IFD
    buf.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(id.toShort).putShort(typ.toShort).putInt(count)
      typ match {
        case 3 if count == 1 => buf.putShort(value.toShort).putShort(0)
        case _ => buf.putInt(value.toInt)
      }
    }
    // dims and RowsPerStrip as LONG (type 4), not SHORT: a SHORT value
    // silently truncates any dimension > 65535 (value.toShort)
    tag(256, 4, 1, ref.ncols) // ImageWidth
    tag(257, 4, 1, ref.nrows) // ImageLength
    tag(258, 3, 1, 32) // BitsPerSample
    tag(259, 3, 1, 1) // Compression = none
    tag(262, 3, 1, 1) // Photometric = BlackIsZero
    if (!tiled) tag(273, 4, 1, dataOff) // StripOffsets
    tag(277, 3, 1, 1) // SamplesPerPixel
    if (!tiled) {
      tag(278, 4, 1, ref.nrows) // RowsPerStrip (single strip)
      tag(279, 4, 1, tileBytes) // StripByteCounts
    } else {
      tag(322, 3, 1, tileSize) // TileWidth
      tag(323, 3, 1, tileSize) // TileLength
      if (nTiles == 1) {
        tag(324, 4, 1, dataOff) // TileOffsets
        tag(325, 4, 1, tileBytes) // TileByteCounts
      } else {
        tag(324, 4, nTiles, offsArrayOff)
        tag(325, 4, nTiles, offsArrayOff + nTiles * 4)
      }
    }
    tag(339, 3, 1, 3) // SampleFormat = IEEE float
    tag(33550, 12, 3, pixelScaleOff) // ModelPixelScaleTag
    tag(33922, 12, 6, tiepointOff) // ModelTiepointTag
    tag(34735, 3, geoKeys.length, geoKeysOff) // GeoKeyDirectoryTag
    tag(42113, 2, nodataAscii.length, nodataOff) // GDAL_NODATA
    buf.putInt(0) // next IFD
    // value areas
    buf.position(pixelScaleOff)
    buf.putDouble(ref.cellsize).putDouble(ref.cellsize).putDouble(0.0)
    buf.position(tiepointOff)
    buf.putDouble(0).putDouble(0).putDouble(0)
    buf.putDouble(ref.left).putDouble(ref.top).putDouble(0)
    buf.position(geoKeysOff)
    geoKeys.foreach(s => buf.putShort(s))
    buf.position(nodataOff)
    buf.put(nodataAscii)
    if (tiled && nTiles > 1) {
      buf.position(offsArrayOff)
      (0 until nTiles).foreach(i => buf.putInt(dataOff + i * tileBytes))
      (0 until nTiles).foreach(_ => buf.putInt(tileBytes))
    }
    // pixels: row-major float32, NaN -> nodata; tile edges padded w/ nodata
    def px(r: Int, c: Int): Float = {
      if (r >= ref.nrows || c >= ref.ncols) ref.nodata.toFloat
      else {
        val v = data(r * ref.ncols + c)
        if (v.isNaN) ref.nodata.toFloat else v.toFloat
      }
    }
    buf.position(dataOff)
    if (tiled) {
      for (ty <- 0 until tilesY; tx <- 0 until tilesX;
           r <- 0 until tileSize; c <- 0 until tileSize)
        buf.putFloat(px(ty * tileSize + r, tx * tileSize + c))
    } else {
      var i = 0
      while (i < data.length) {
        val v = data(i)
        buf.putFloat(if (v.isNaN) ref.nodata.toFloat else v.toFloat)
        i += 1
      }
    }
    Files.write(Paths.get(path), buf.array())
  }
}
