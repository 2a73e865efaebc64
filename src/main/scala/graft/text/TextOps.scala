package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (dedup, quality,
  * language-id, fingerprinting) — all built from codegen'd built-ins
  * (`functions._` / SQL lambda expressions), no Python/row UDFs; the two
  * bit-twiddling kernels (simhash, rolling fingerprint) are typed Dataset
  * kernels like the raster ops. */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** n-word shingles as strings; empty array when fewer than n tokens. */
  def wordShingles(words: Column, n: Int): Column = {
    val parts = (1 to n).map(k => s"element_at(w, CAST(i + $k AS INT))").mkString(", ")
    when(size(words) >= n,
      expr(s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $parts))"))
      .otherwise(array())
  }

  /** MinHash signature (k hashes) over a distinct-shingle array: ONE string
    * xxhash64 per shingle (the `hs` column), then k fixed-width
    * xxhash64(long, i) rehashes — no string re-hashing, no allocation, and
    * ANSI-safe (wrapping (a*h+b) arithmetic would trip Spark 4's overflow
    * checks). All one codegen'd expression. */
  def minhashSig(shingles: Column, k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), i -> " +
      "array_min(transform(hs, h -> xxhash64(h, i))))")

  /** LSH candidate pairs via banded minhash + exact-Jaccard verification.
    * Scale shape: explode (band, bandHash) -> self-join on band bucket ->
    * distinct pairs -> verify with exact integer Jaccard (c, na, nb).
    * threshold10 = Jaccard threshold in tenths (integer math, no float). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold10: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = k / bands
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .select($"doc_id", array_distinct(wordShingles($"w", shingleN)).as("sh"))
      .filter(size($"sh") > 0)
    val sig = sh
      .withColumn("hs", expr("transform(sh, s -> xxhash64(s))")) // hash ONCE
      .select($"doc_id", minhashSig($"sh", k).as("sig"))
    // band join on IDS ONLY (the shingle arrays would otherwise be
    // replicated through every bucket collision); sets re-attached to the
    // few surviving candidate pairs afterwards
    val banded = sig.select($"doc_id",
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
        s"hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bhash")
    val candIds = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bhash" === $"b.bhash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"))
      .dropDuplicates("ia", "ib")
    val cand = candIds
      .join(sh.toDF("ia", "sha"), "ia")
      .join(sh.toDF("ib", "shb"), "ib")
    cand
      .withColumn("inter", size(array_intersect($"sha", $"shb")))
      .withColumn("na", size($"sha"))
      .withColumn("nb", size($"shb"))
      .filter($"inter" * 10 >= lit(threshold10) * ($"na" + $"nb" - $"inter"))
      .select($"ia", $"ib", $"inter".cast("long").as("inter"),
        $"na".cast("long").as("na"), $"nb".cast("long").as("nb"))
  }

  /** 64-bit SimHash over whitespace tokens (kernel; ties at bit-sum 0 set
    * the bit, matching the >= 0 convention). */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          // FNV-1a 64 of the token, then spread bits
          var h = 0xcbf29ce484222325L
          var j = start
          while (j < i) {
            h ^= text.charAt(j)
            h *= 0x100000001b3L
            j += 1
          }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling polynomial document fingerprint (mod 2^61-1): order-sensitive,
    * whitespace-normalized — equal iff texts equal up to runs of spaces. */
  def fingerprint(text: String): Long = {
    val M = (1L << 61) - 1
    var h = 0L
    var lastSpace = false
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      val isSpace = ch == ' '
      if (!(isSpace && lastSpace)) {
        h = mulMod61(h, 131) + ch.toLong
        if (h >= M) h -= M
      }
      lastSpace = isSpace
      i += 1
    }
    h
  }

  private def mulMod61(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 without overflow via 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val M = (1L << 61) - 1
    var r = (lo & M) + ((lo >>> 61) | (hi << 3))
    while (r >= M) r -= M
    r
  }

  /** Language-ID heuristic: count language-marker substrings (padded with
    * spaces so they match whole words), argmax with deterministic
    * preference order, "und" when no marker hits. Pure arithmetic on
    * integers -> SQL-oracle-safe. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " et ", " les "))

  private def occurrences(text: Column, marker: String): Column =
    (length(text) - length(regexp_replace(text, marker, ""))) / marker.length

  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers(lang).map(m => occurrences(padded, m))
      .reduce(_ + _).cast("long")
  }

  def langId(text: Column): Column = {
    val en = langScore(text, "en")
    val de = langScore(text, "de")
    val es = langScore(text, "es")
    val fr = langScore(text, "fr")
    val mx = greatest(en, de, es, fr)
    when(mx === 0, "und")
      .when(en === mx, "en")
      .when(de === mx, "de")
      .when(es === mx, "es")
      .otherwise("fr")
  }
}
