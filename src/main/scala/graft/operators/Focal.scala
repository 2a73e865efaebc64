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
}
