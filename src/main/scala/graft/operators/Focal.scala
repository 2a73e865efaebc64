package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point focal (moving-window) statistics over a (2k+1)^2
  * neighborhood — the map-algebra FocalStatistics primitive. Values enter
  * as LONGS (fixed-point: callers scale, e.g. quarter-units for the
  * engine's DEM fixtures, centimetres for survey DEMs), which makes the
  * windowed sums EXACT and therefore partitioning-stable — a
  * floating-point focal sum changes with summation order, so at 1000
  * executors its low bits would depend on the physical plan; fixed-point
  * is the scale-sane contract and what the hash gate pins.
  *
  * Shape: the rectangular window separates — pass 1 groups by ROW and
  * emits per-cell horizontal (sum, count) strips; pass 2 groups by COLUMN
  * and stacks the strips vertically. Two descriptor shuffles, O(k) work
  * per cell per pass (never O(k^2)); same line-band caveat as
  * [[DistanceTransform]] for 10^6-px lines. */
object Focal {

  /** Windowed (n, sum_q) for every grid position with >= 1 valid value in
    * its window. `vals`: (row, col, q: Long) for VALID cells only. */
  def window(vals: DataFrame, nrows: Int, ncols: Int, k: Int): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    require(k >= 1, s"window half-width must be >= 1, got $k")
    val strips = vals
      .select(col("row").cast("long").as("r"), col("col").cast("int").as("c"),
        col("q").cast("long").as("q"))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (r, it) =>
        val q = new Array[Long](ncols)
        val m = new Array[Boolean](ncols)
        it.foreach { case (_, c, v) => q(c) = v; m(c) = true }
        (0 until ncols).iterator.map { c =>
          var s = 0L; var n = 0
          var j = math.max(0, c - k)
          val jEnd = math.min(ncols - 1, c + k)
          while (j <= jEnd) { if (m(j)) { s += q(j); n += 1 }; j += 1 }
          (r, c, s, n)
        }
      }
    strips.groupByKey(_._2)
      .flatMapGroups { (c, it) =>
        val s = new Array[Long](nrows)
        val n = new Array[Int](nrows)
        it.foreach { case (r, _, sq, cnt) => s(r.toInt) = sq; n(r.toInt) = cnt }
        (0 until nrows).iterator.flatMap { r =>
          var sum = 0L; var cnt = 0L
          var i = math.max(0, r - k)
          val iEnd = math.min(nrows - 1, r + k)
          while (i <= iEnd) { sum += s(i); cnt += n(i); i += 1 }
          if (cnt > 0) Iterator.single((r.toLong, c.toLong, cnt, sum))
          else Iterator.empty
        }
      }
      .toDF("row", "col", "n", "sum_q")
  }

  /** Sliding-window min over a sentinel-marked array: out(c) = min of the
    * PRESENT values in [c-k, c+k], or Long.MaxValue if none. Monotone
    * deque (van Herk/Gil-Werman family) — O(1) amortized per cell, so a
    * 10^6-px line band costs the same as a plain copy. */
  private[operators] def slideMin(a: Array[Long], present: Array[Boolean],
      k: Int): Array[Long] = {
    val n = a.length
    val out = Array.fill(n)(Long.MaxValue)
    val idx = new Array[Int](n)
    var head = 0; var tail = 0; var j = 0
    var c = 0
    while (c < n) {
      val hi = math.min(n - 1, c + k)
      while (j <= hi) {
        if (present(j)) {
          while (tail > head && a(idx(tail - 1)) >= a(j)) tail -= 1
          idx(tail) = j; tail += 1
        }
        j += 1
      }
      while (tail > head && idx(head) < c - k) head += 1
      if (tail > head) out(c) = a(idx(head))
      c += 1
    }
    out
  }

  /** Sliding-window max — [[slideMin]] with the comparison reversed
    * (no negation trick: -Long.MinValue overflows). Long.MinValue marks
    * an empty window; callers must gate emission on window OCCUPANCY
    * ([[slideCount]]), never on sentinel equality, so the full Long
    * range stays valid data. */
  private[operators] def slideMax(a: Array[Long], present: Array[Boolean],
      k: Int): Array[Long] = {
    val n = a.length
    val out = Array.fill(n)(Long.MinValue)
    val idx = new Array[Int](n)
    var head = 0; var tail = 0; var j = 0
    var c = 0
    while (c < n) {
      val hi = math.min(n - 1, c + k)
      while (j <= hi) {
        if (present(j)) {
          while (tail > head && a(idx(tail - 1)) <= a(j)) tail -= 1
          idx(tail) = j; tail += 1
        }
        j += 1
      }
      while (tail > head && idx(head) < c - k) head += 1
      if (tail > head) out(c) = a(idx(head))
      c += 1
    }
    out
  }

  /** Number of PRESENT entries in each clipped window [c-k, c+k] — one
    * prefix-sum pass; the occupancy gate for the extrema emission. */
  private[operators] def slideCount(present: Array[Boolean], k: Int): Array[Int] = {
    val n = present.length
    val pre = new Array[Int](n + 1)
    var i = 0
    while (i < n) { pre(i + 1) = pre(i) + (if (present(i)) 1 else 0); i += 1 }
    Array.tabulate(n)(c =>
      pre(math.min(n - 1, c + k) + 1) - pre(math.max(0, c - k)))
  }

  /** Windowed (min_q, max_q) for every grid position with >= 1 valid value
    * in its (2k+1)^2 window — morphological EROSION and DILATION in one
    * pass pair. Same separable two-pass shape as [[window]], but each pass
    * is a monotone-deque sliding extremum (O(1)/cell amortized vs the
    * O(k) scan): rectangle min == vertical min of horizontal row minima.
    * Emission is gated on window occupancy, not sentinel values, so the
    * FULL Long range is valid input. `vals`: (row, col, q: Long) for
    * VALID cells only. */
  def extrema(vals: DataFrame, nrows: Int, ncols: Int, k: Int): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    require(k >= 1, s"window half-width must be >= 1, got $k")
    val strips = vals
      .select(col("row").cast("long").as("r"), col("col").cast("int").as("c"),
        col("q").cast("long").as("q"))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (r, it) =>
        val q = new Array[Long](ncols)
        val m = new Array[Boolean](ncols)
        it.foreach { case (_, c, v) => q(c) = v; m(c) = true }
        val hmin = slideMin(q, m, k)
        val hmax = slideMax(q, m, k)
        val hn = slideCount(m, k)
        (0 until ncols).iterator
          .filter(c => hn(c) > 0)
          .map(c => (r, c, hmin(c), hmax(c)))
      }
    strips.groupByKey(_._2)
      .flatMapGroups { (c, it) =>
        val lo = new Array[Long](nrows)
        val hi = new Array[Long](nrows)
        val m = new Array[Boolean](nrows)
        it.foreach { case (r, _, mn, mx) =>
          lo(r.toInt) = mn; hi(r.toInt) = mx; m(r.toInt) = true
        }
        val vmin = slideMin(lo, m, k)
        val vmax = slideMax(hi, m, k)
        val vn = slideCount(m, k)
        (0 until nrows).iterator
          .filter(r => vn(r) > 0)
          .map(r => (r.toLong, c.toLong, vmin(r), vmax(r)))
      }
      .toDF("row", "col", "min_q", "max_q")
  }

  /** Focal MAJORITY (mode) filter over the (2k+1)^2 window — the
    * categorical-raster Expand/Nibble primitive: each position takes the
    * most frequent class among its valid neighbors, ties to the SMALLEST
    * class id (deterministic, so the gate hashes). Unlike the median,
    * the mode IS separable in count space: per-class window counts are
    * sums, so pass 1 emits per-row horizontal count VECTORS (one Long
    * per class) and pass 2 stacks them vertically — two descriptor
    * shuffles whatever k, O(k + nClasses)/cell. `vals`: (row, col,
    * cls: Int in [0, nClasses)) for VALID cells only. */
  def majority(vals: DataFrame, nrows: Int, ncols: Int, k: Int,
      nClasses: Int): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    require(k >= 1, s"window half-width must be >= 1, got $k")
    require(nClasses >= 1 && nClasses <= 4096,
      s"nClasses must be in [1, 4096], got $nClasses")
    val strips = vals
      .select(col("row").cast("long").as("r"), col("col").cast("int").as("c"),
        col("cls").cast("int").as("cls"))
      .as[(Long, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (r, it) =>
        val cls = new Array[Int](ncols)
        val m = new Array[Boolean](ncols)
        it.foreach { case (_, c, g) =>
          require(g >= 0 && g < nClasses, s"class $g out of [0, $nClasses)")
          cls(c) = g; m(c) = true
        }
        (0 until ncols).iterator.flatMap { c =>
          val cnt = new Array[Long](nClasses)
          var any = false
          var j = math.max(0, c - k)
          val jEnd = math.min(ncols - 1, c + k)
          while (j <= jEnd) {
            if (m(j)) { cnt(cls(j)) += 1; any = true }
            j += 1
          }
          if (any) Iterator.single((r, c, cnt)) else Iterator.empty
        }
      }
    strips.groupByKey(_._2)
      .flatMapGroups { (c, it) =>
        val cnt = Array.ofDim[Long](nrows, nClasses)
        val m = new Array[Boolean](nrows)
        it.foreach { case (r, _, v) => cnt(r.toInt) = v; m(r.toInt) = true }
        (0 until nrows).iterator.flatMap { r =>
          val tot = new Array[Long](nClasses)
          var any = false
          var i = math.max(0, r - k)
          val iEnd = math.min(nrows - 1, r + k)
          while (i <= iEnd) {
            if (m(i)) {
              var g = 0
              while (g < nClasses) { tot(g) += cnt(i)(g); g += 1 }
              any = true
            }
            i += 1
          }
          if (!any) Iterator.empty
          else {
            var best = 0
            var g = 1
            while (g < nClasses) {
              if (tot(g) > tot(best)) best = g // ties keep the smaller id
              g += 1
            }
            Iterator.single((r.toLong, c.toLong, best.toLong, tot(best)))
          }
        }
      }
      .toDF("row", "col", "mode_cls", "n_mode")
  }

  /** Focal median (the despeckle filter) over the (2k+1)^2 window: the
    * middle valid value, or the mean of the two middles for even counts
    * (SQL median semantics — `(a+b)/2.0` of exact Longs is an exact
    * dyadic double, so the gate hashes). Median does not separate, so the
    * shape differs from [[window]]: each cell replicates to its 2k+1
    * destination ROWS (one descriptor shuffle, x(2k+1) volume — k is
    * single-digit in every real filter), and each destination row group
    * materializes its (2k+1) x ncols band and selection-sorts each
    * window. O(k^2 log k) per cell, no driver state, row bands cap
    * executor memory at (2k+1) x ncols descriptors. */
  def median(vals: DataFrame, nrows: Int, ncols: Int, k: Int): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    require(k >= 1, s"window half-width must be >= 1, got $k")
    vals
      .select(col("row").cast("int").as("r"), col("col").cast("int").as("c"),
        col("q").cast("long").as("q"))
      .as[(Int, Int, Long)]
      .flatMap { case (r, c, q) =>
        (math.max(0, r - k) to math.min(nrows - 1, r + k)).iterator
          .map(dr => (dr, r, c, q))
      }
      .groupByKey(_._1)
      .flatMapGroups { (dr, it) =>
        val band = 2 * k + 1
        val q = new Array[Long](band * ncols)
        val m = new Array[Boolean](band * ncols)
        it.foreach { case (_, sr, c, v) =>
          val i = (sr - dr + k) * ncols + c
          q(i) = v; m(i) = true
        }
        val buf = new Array[Long](band * band)
        (0 until ncols).iterator.flatMap { c =>
          var n = 0
          var i = 0
          while (i < band) {
            var j = math.max(0, c - k)
            val jEnd = math.min(ncols - 1, c + k)
            while (j <= jEnd) {
              if (m(i * ncols + j)) { buf(n) = q(i * ncols + j); n += 1 }
              j += 1
            }
            i += 1
          }
          if (n == 0) Iterator.empty
          else {
            java.util.Arrays.sort(buf, 0, n)
            val med =
              if (n % 2 == 1) buf(n / 2).toDouble
              else {
                // exact midpoint without the (a+b) Long overflow:
                // floor(a/2) + floor(b/2) + (parities)/2 == (a+b)/2
                val a = buf(n / 2 - 1)
                val b = buf(n / 2)
                (Math.floorDiv(a, 2) + Math.floorDiv(b, 2)).toDouble +
                  ((a & 1L) + (b & 1L)) / 2.0
              }
            Iterator.single((dr.toLong, c.toLong, med))
          }
        }
      }
      .toDF("row", "col", "med_q")
  }
}
