package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core._
import graft.operators.TileOps

/** ESRI ASCII-grid source/sink (reference `arc_header_read`/`arcgridread`/
  * `arcgridwrite`, spatial_analysis.py:38-172; byte_file_read :211-227).
  *
  * Semantics preserved: 6 header lines, keys normalized to lowercase on
  * read (the reference case-preserves the canonical `NODATA_value`
  * spelling, :73-75, and looks it up case-preserved, :118 — we accept any
  * case), values parsed as float with ncols/nrows coerced int, NODATA ->
  * NaN on ingest, NaN -> NODATA with %g formatting on egress, transparent
  * .gz. Distributed ingest path: `spark.read.format("binaryFile")` +
  * the same bytes decoder + tile split on executors. */
object AscIO {

  /** Parse the 6-line header (spatial_analysis.py:38-96). */
  def parseHeader(lines: Seq[String]): GridRef = {
    val kv = lines.take(6).map { ln =>
      val parts = ln.trim.split("\\s+", 2)
      // normalize ALL keys to lowercase: the reference keeps the canonical
      // 12-char 'NODATA_value' case-preserved (spatial_analysis.py:73-75)
      // and looks it up case-preserved (:118); one lowercase key space on
      // our side honors every spelling without a dual lookup.
      parts(0).toLowerCase -> parts(1).trim.toDouble
    }.toMap
    GridRef(
      ncols = kv("ncols").toInt,
      nrows = kv("nrows").toInt,
      xll = kv("xllcorner"),
      yll = kv("yllcorner"),
      cellsize = kv("cellsize"),
      nodata = kv.getOrElse("nodata_value", -9999.0))
  }

  /** Decode a whole ASC payload (optionally gzipped) from bytes —
    * the byte_file_read kernel (spatial_analysis.py:211-227). */
  def decodeBytes(bytes: Array[Byte], gzipped: Boolean): (GridRef, Array[Double]) = {
    val in =
      if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes))
      else new ByteArrayInputStream(bytes)
    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.US_ASCII))
    val header = (1 to 6).map(_ => reader.readLine())
    val ref = parseHeader(header)
    val data = new Array[Double](ref.ncols * ref.nrows)
    var i = 0
    var line = reader.readLine()
    while (line != null && i < data.length) {
      val tok = new java.util.StringTokenizer(line)
      while (tok.hasMoreTokens && i < data.length) {
        val v = tok.nextToken().toDouble
        data(i) = if (v == ref.nodata) Double.NaN else v
        i += 1
      }
      line = reader.readLine()
    }
    reader.close()
    require(i == data.length, s"ASC body short: $i of ${data.length} values")
    (ref, data)
  }

  /** The .prj sidecar path: strip .gz, swap the extension for .prj
    * (reference arcgridread, spatial_analysis.py:120-124; standardized to
    * strip .gz first — the reference's [:-4] slice garbles .asc.gz names). */
  def prjPath(path: String): String = {
    val base = path.stripSuffix(".gz")
    val dot = base.lastIndexOf('.')
    (if (dot >= 0) base.substring(0, dot) else base) + ".prj"
  }

  /** Driver-side single-file read; a .prj sidecar (WKT) populates crs. */
  def readFile(path: String): (GridRef, Array[Double]) = {
    val (ref, data) = decodeBytes(Files.readAllBytes(Paths.get(path)), path.endsWith(".gz"))
    val prj = Paths.get(prjPath(path))
    if (Files.exists(prj)) (ref.copy(crs = Files.readString(prj).trim), data)
    else (ref, data)
  }

  /** Distributed ingest: binaryFile scan -> decode + tile split on
    * executors. Each ASC becomes a tile set on ITS OWN grid; cross-file
    * mosaic goes through alignedPatches + MosaicAgg with file seq. */
  def readTiles(spark: SparkSession, pathGlob: String, res: Int)
      : Dataset[(String, Tile)] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val (ref, data) = decodeBytes(bytes, path.endsWith(".gz"))
        val size = 1 << res
        val tilesX = (ref.ncols + size - 1) / size
        val tilesY = (ref.nrows + size - 1) / size
        for {
          ty <- 0 until tilesY
          tx <- 0 until tilesX
        } yield {
          val row0 = ty * size
          val col0 = tx * size
          val h = math.min(size, ref.nrows - row0)
          val w = math.min(size, ref.ncols - col0)
          val payload = new Array[Double](h * w)
          var r = 0
          while (r < h) {
            System.arraycopy(data, (row0 + r) * ref.ncols + col0, payload, r * w, w)
            r += 1
          }
          (path, Tile(CellId.encode(res, tx, ty), row0, col0, h, w, payload))
        }
      }
  }

  /** %g-equivalent formatter (reference writes '%g', arcgridwrite
    * spatial_analysis.py:163-170): shortest of %e/%f at 6 significant
    * digits, trailing zeros trimmed — matches C printf %g. */
  def formatG(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v == 0.0) return "0"
    def trim(s: String): String =
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else s
    // the %e-vs-%f branch is chosen from the exponent AFTER rounding to
    // 6 significant digits (C %g rounds first): 999999.5 must print
    // "1e+06", not a 7-digit "1000000"; 9.9999951e-5 must print
    // "0.0001", not "1e-04". (Residual divergence from C: Java %e
    // rounds decimal ties HALF_UP where C uses the FP rounding mode —
    // only exact-tie mantissas differ.)
    val sci = String.format("%.5e", Double.box(v)) // 6 significant digits
    val Array(mant, e) = sci.split("[eE]")
    val exp = e.toInt
    if (exp < -4 || exp >= 6) s"${trim(mant)}e$e"
    else trim(String.format(s"%.${5 - exp}f", Double.box(v)))
  }

  /** Write one grid as ASC (gzip if path ends .gz) — arcgridwrite parity
    * (spatial_analysis.py:128-172): header `%d`/`%g`, NaN -> NODATA. */
  def writeFile(path: String, ref: GridRef, data: Array[Double]): Unit = {
    val sb = new StringBuilder
    sb.append(s"ncols    ${ref.ncols}\n")
    sb.append(s"nrows    ${ref.nrows}\n")
    sb.append(s"xllcorner    ${formatG(ref.xll)}\n")
    sb.append(s"yllcorner    ${formatG(ref.yll)}\n")
    sb.append(s"cellsize    ${formatG(ref.cellsize)}\n")
    sb.append(s"NODATA_value    ${formatG(ref.nodata)}\n")
    var r = 0
    while (r < ref.nrows) {
      var c = 0
      while (c < ref.ncols) {
        if (c > 0) sb.append(' ')
        val v = data(r * ref.ncols + c)
        sb.append(formatG(if (v.isNaN) ref.nodata else v))
        c += 1
      }
      sb.append('\n')
      r += 1
    }
    val bytes = sb.toString.getBytes(StandardCharsets.US_ASCII)
    if (path.endsWith(".gz")) {
      val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
      out.write(bytes)
      out.close()
    } else Files.write(Paths.get(path), bytes)
    // CRS travels as the .prj sidecar (reference write pairs the WKT file)
    if (ref.crs.nonEmpty)
      Files.writeString(Paths.get(prjPath(path)), ref.crs)
  }

  /** Export a tile dataset as one ASC — DISTRIBUTED: executors group the
    * tiles by row band (same row0), format each band's text block, and
    * write it as a shard file; the driver then stitches header + shards in
    * row order with a streaming copy (and nodata lines for empty bands).
    * The driver never materializes the pixel array — only O(bands)
    * descriptors — so the exportable grid is bounded by the filesystem,
    * not driver memory. The shard directory lives next to the output path;
    * on a multi-host cluster that path is shared storage by nature (it is
    * the export destination). Output is byte-identical to the previous
    * whole-array writer (golden-gated). */
  def writeTiles(tiles: Dataset[Tile], ref: GridRef, path: String): Unit = {
    import tiles.sparkSession.implicits._
    val shardDir = Paths.get(path + ".shards")
    Files.createDirectories(shardDir)
    val ncols = ref.ncols
    val nodata = ref.nodata
    val shardDirStr = shardDir.toString
    // one shard per tile-row band, formatted and written on executors
    val bands = tiles.groupByKey(_.row0).mapGroups { (row0, it) =>
      val ts = it.toArray.sortBy(_.col0)
      val h = ts.map(_.h).max
      val sb = new StringBuilder(ncols * 8 * h)
      val row = new Array[Double](ncols)
      var r = 0
      while (r < h) {
        java.util.Arrays.fill(row, Double.NaN)
        ts.foreach { t =>
          if (r < t.h) {
            var c = 0
            while (c < t.w) { row(t.col0 + c) = t.payload(r * t.w + c); c += 1 }
          }
        }
        var c = 0
        while (c < ncols) {
          if (c > 0) sb.append(' ')
          val v = row(c)
          sb.append(formatG(if (v.isNaN) nodata else v))
          c += 1
        }
        sb.append('\n')
        r += 1
      }
      val f = Paths.get(shardDirStr, f"band-$row0%09d")
      Files.write(f, sb.toString.getBytes(StandardCharsets.US_ASCII))
      (row0, h, f.toString)
    }.collect().sortBy(_._1) // O(bands) descriptors only
    // driver stitch: header, then shards in row order; missing bands
    // (sparse tile sets) become nodata rows
    val header = new StringBuilder
    header.append(s"ncols    ${ref.ncols}\n")
    header.append(s"nrows    ${ref.nrows}\n")
    header.append(s"xllcorner    ${formatG(ref.xll)}\n")
    header.append(s"yllcorner    ${formatG(ref.yll)}\n")
    header.append(s"cellsize    ${formatG(ref.cellsize)}\n")
    header.append(s"NODATA_value    ${formatG(ref.nodata)}\n")
    val nodataLine = {
      val s = formatG(nodata)
      (Seq.fill(ncols)(s).mkString(" ") + "\n").getBytes(StandardCharsets.US_ASCII)
    }
    val raw = Files.newOutputStream(Paths.get(path))
    val out =
      if (path.endsWith(".gz")) new GZIPOutputStream(raw, 1 << 16)
      else new java.io.BufferedOutputStream(raw, 1 << 20)
    try {
      out.write(header.toString.getBytes(StandardCharsets.US_ASCII))
      var nextRow = 0
      bands.foreach { case (row0, h, f) =>
        // bands must be disjoint and row-aligned; overlapping/staggered
        // tile sets would silently shift rows — fail loudly instead
        require(row0 >= nextRow,
          s"writeTiles: tile band starting at row $row0 overlaps previous band ending at $nextRow — tiles must be row-band aligned")
        while (nextRow < row0) { out.write(nodataLine); nextRow += 1 }
        val p = Paths.get(f)
        Files.copy(p, out)
        Files.delete(p)
        nextRow = row0 + h
      }
      require(nextRow <= ref.nrows,
        s"writeTiles: tile bands extend to row $nextRow past nrows ${ref.nrows}")
      while (nextRow < ref.nrows) { out.write(nodataLine); nextRow += 1 }
    } finally out.close()
    Files.deleteIfExists(shardDir)
    if (ref.crs.nonEmpty)
      Files.writeString(Paths.get(prjPath(path)), ref.crs)
  }
}
