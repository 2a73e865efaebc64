package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.codecs.ImageCodec
import graft.core._

/** One row of the engine's input table — schema exactly per
  * BASELINE.json input_hint:
  * (image_id string, bytes binary, w int, h int, fmt string,
  *  caption string, phash long). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** A decoded tile with input lineage (image_id + caption ride along so the
  * caption-equality invariant is checkable at any pipeline stage). */
final case class DecodedTile(
    cellId: Long,
    row0: Int,
    col0: Int,
    h: Int,
    w: Int,
    payload: Array[Double],
    imageId: String,
    caption: String)

/** Deterministic synthetic image+caption corpus (FIXTURES.md §3): each row
  * is one 256x256 grayscale tile of a smooth analytic terrain, tiles form a
  * global mosaic grid G tiles wide. fmt alternates png (lossless gate) /
  * jpg (lossy, PSNR >= 40 dB gate); rows with i % 251 == 0 (i > 0) repeat
  * the previous payload under a new image_id (dedup diagnostics).
  * Seeded by construction — no wall-clock, no RNG state.
  */
object ImageCorpus {

  final val TileSize = 256
  final val TileRes = 8 // 2^8 = 256 -> one corpus image per engine cell
  final val CellSizeM = 5.0

  /** Smooth analytic terrain sampled at pixel (row, col) of the global grid
    * (top row 0 at y=0, y decreasing southward). Smoothness matters: JPEG
    * PSNR >= 40 dB needs low-frequency content. */
  def terrain(row: Int, col: Int): Double = {
    val x = (col + 0.5) * CellSizeM
    val y = -(row + 0.5) * CellSizeM
    30.0 + 12.0 * math.sin(x / 150.0) + 9.0 * math.cos(y / 210.0) +
      4.0 * math.sin((x + y) / 90.0)
  }

  /** Quantized ground truth as the codec will round-trip it (png 16-bit). */
  def truthPng(row: Int, col: Int): Double =
    Math.rint(terrain(row, col) * ImageCodec.PngScale) / ImageCodec.PngScale

  def tilePayload(tx: Int, ty: Int): Array[Double] = {
    val p = new Array[Double](TileSize * TileSize)
    var r = 0
    while (r < TileSize) {
      var c = 0
      while (c < TileSize) {
        p(r * TileSize + c) = terrain(ty * TileSize + r, tx * TileSize + c)
        c += 1
      }
      r += 1
    }
    p
  }

  def fmtOf(i: Long): String = if (i % 4 == 3) "jpg" else "png"

  def rowOf(i: Long, gridW: Int): ImageRow = {
    // duplicate rule: payload of i-1 under a new id
    val src = if (i > 0 && i % 251 == 0) i - 1 else i
    val tx = (src % gridW).toInt
    val ty = (src / gridW).toInt
    val fmt = fmtOf(src)
    val payload = tilePayload(tx, ty)
    val bytes =
      if (fmt == "png") ImageCodec.encodePng(payload, TileSize, TileSize)
      else ImageCodec.encodeJpg(payload, TileSize, TileSize)
    ImageRow(
      image_id = f"img-$i%08d",
      bytes = bytes,
      w = TileSize,
      h = TileSize,
      fmt = fmt,
      caption = s"tile $tx,$ty of synthetic terrain; seed=42; fmt=$fmt",
      phash = ImageCodec.phash64(payload, TileSize, TileSize))
  }

  /** Distributed corpus generation: one task per partition, rows built on
    * executors (the 10^12-scale analogue is an Iceberg scan — this stands in
    * for it with identical schema). */
  def generate(spark: SparkSession, n: Long, gridW: Int): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => rowOf(i, gridW)))
  }

  /** Pixel value of the EXACT (oracle-grade) corpus: integer-derived code
    * divided by PngScale, so the 16-bit PNG encode->decode round trip is
    * bit-identity and any SQL engine can regenerate the decoded plane from
    * the closed-form formula without an image codec. */
  def exactValue(gr: Int, gc: Int): Double =
    ((gr * 31 + gc * 17) % 1000) / ImageCodec.PngScale

  /** PNG-only corpus variant with [[exactValue]] payloads — same schema and
    * decode path as [[generate]], but every decoded pixel is a dyadic
    * rational reproducible by formula (the i2 resize oracle's input). */
  def generateExact(spark: SparkSession, n: Long, gridW: Int): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val tx = (i % gridW).toInt
      val ty = (i / gridW).toInt
      val payload = new Array[Double](TileSize * TileSize)
      var r = 0
      while (r < TileSize) {
        var c = 0
        while (c < TileSize) {
          payload(r * TileSize + c) = exactValue(ty * TileSize + r, tx * TileSize + c)
          c += 1
        }
        r += 1
      }
      ImageRow(
        image_id = f"img-$i%08d",
        bytes = ImageCodec.encodePng(payload, TileSize, TileSize),
        w = TileSize,
        h = TileSize,
        fmt = "png",
        caption = s"tile $tx,$ty of exact ramp; seed=42; fmt=png",
        phash = ImageCodec.phash64(payload, TileSize, TileSize))
    })
  }

  /** Block code of the PERCEPTUAL corpus (i4): payloads are piecewise-
    * constant on the phash 8x8 block lattice (32x32 px at 256x256), block
    * b of image i carries integer code K(i, b) from a multiply-xorshift
    * hash (a LINEAR hash — e.g. plain Knuth multiplicative — leaks: a
    * constant input delta becomes a near-constant code delta, and the
    * phash bit rule is invariant under adding a constant to every block,
    * so unrelated images would collide; the xorshift kills the
    * linearity — verified 0 chance pairs at hamming <= 12 over all 523k
    * pairs). Two plant rules re-emit the previous row's codes perturbed:
    * i % 167 == 0 raises blocks b < 2 + i/167 by +128 (perceptual
    * NEAR-dups, hamming 1-5 — inside the <=6 gate), i % 311 == 0 raises
    * blocks b < 24 by +257 (hamming 10-16 — near-MISSES the gate must
    * exclude). Because every pixel is K/64 (dyadic, 16-bit-PNG
    * round-trip exact) the phash bit rule `blockMean(b) > globalMean`
    * reduces to the pure integer comparison `64*K(i,b) > sum_b K(i,b)` —
    * a SQL engine regenerates every hash bit, every hamming distance and
    * therefore the exact pair set from the formula alone. No separation
    * assumption: the oracle replicates the full kernel (the same grade
    * of gate as d5 simhash). */
  def perceptualCode(i: Long, b: Int): Long = {
    val src = if (i > 0 && (i % 167 == 0 || i % 311 == 0)) i - 1 else i
    val x = src * 64L + b
    val h1 = (x * 2654435761L) & 0xffffffffL
    val h3 = ((h1 ^ (h1 >>> 16)) * 60493L) & 0xffffffffL
    val k = (h3 ^ (h3 >>> 16)) % 512L
    val bump =
      if (i > 0 && i % 167 == 0 && b < 2 + i / 167) 128L
      else if (i > 0 && i % 311 == 0 && b < 24) 257L
      else 0L
    k + bump
  }

  /** Perceptual-dedup corpus — see [[perceptualCode]]. Same schema and
    * decode path as [[generate]]; all PNG. */
  def generatePerceptual(spark: SparkSession, n: Long): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val payload = new Array[Double](TileSize * TileSize)
      var r = 0
      while (r < TileSize) {
        var c = 0
        while (c < TileSize) {
          val b = (r / 32) * 8 + (c / 32)
          payload(r * TileSize + c) = perceptualCode(i, b) / ImageCodec.PngScale
          c += 1
        }
        r += 1
      }
      ImageRow(
        image_id = f"img-$i%08d",
        bytes = ImageCodec.encodePng(payload, TileSize, TileSize),
        w = TileSize,
        h = TileSize,
        fmt = "png",
        caption = s"block tile $i of perceptual corpus; seed=42; fmt=png",
        phash = ImageCodec.phash64(payload, TileSize, TileSize))
    })
  }

  /** Decode join key + payload: each image row becomes one engine tile keyed
    * by its Z-order cell id at res 8, carrying image_id + caption lineage.
    * The tile position comes from the CAPTION-INDEPENDENT source index
    * embedded in the grid layout (tx, ty parsed back from pixel geometry is
    * not needed — the corpus is position-keyed by construction). */
  def decodeTiles(corpus: Dataset[ImageRow], gridW: Int,
      plantedDups: Boolean = true): Dataset[DecodedTile] = {
    import corpus.sparkSession.implicits._
    corpus.map { row =>
      val i = row.image_id.stripPrefix("img-").toLong
      // the i % 251 re-key mirrors generate()'s PLANTED duplicate rule
      // (row i carries a copy of row i-1's tile). Corpora without that
      // rule (generateExact/generatePerceptual at n > 251) must pass
      // plantedDups = false or tile 251k would land on 251k-1's cell.
      val src = if (plantedDups && i > 0 && i % 251 == 0) i - 1 else i
      val tx = (src % gridW).toInt
      val ty = (src / gridW).toInt
      val (payload, w, h) = ImageCodec.decode(row.bytes, row.fmt)
      DecodedTile(CellId.encode(TileRes, tx, ty), ty * TileSize, tx * TileSize,
        h, w, payload, row.image_id, row.caption)
    }
  }

  /** GridRef of an n-row corpus laid out gridW tiles wide. */
  def corpusRef(n: Long, gridW: Int): GridRef = {
    val rows = ((n + gridW - 1) / gridW).toInt
    GridRef(gridW * TileSize, rows * TileSize, 0.0,
      -rows.toDouble * TileSize * CellSizeM, CellSizeM)
  }
}
