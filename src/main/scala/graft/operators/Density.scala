package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kernel-density heatmap (the point-density / hotspot primitive): each
  * point scatters a radially decaying weight onto every grid cell within
  * `radius`, and the per-cell density is the sum. The kernel is the
  * quartic (biweight) profile in SCALED-INTEGER form, `(R^2 - d^2)^2`
  * with d^2 the integer squared cell distance — the classic
  * `(1 - d^2/R^2)^2` shape times the constant R^4, kept in Longs so the
  * per-cell sums are exact and order-free (a float kernel sum would be
  * plan-dependent in its low bits). Callers divide by R^4 and the
  * normalization constant at presentation time.
  *
  * Shape: fully declarative scatter-gather — the offset disk (dr, dc, w)
  * is a tiny broadcast relation (O(R^2) rows), each point cross-joins it
  * (BroadcastNestedLoopJoin over ~3R^2 rows per point, never a shuffle of
  * the grid), and ONE partial/final hash aggregation on the landing cell
  * produces the surface. Cost is O(points x R^2) descriptors — the same
  * work any scatter KDE does, with map-side combine collapsing overlaps
  * before the exchange. At 10^12 points the plan is unchanged: broadcast
  * stays O(R^2), the single shuffle carries at most one row per touched
  * cell per input partition. */
object Density {

  /** `points`: (row, col) in cell units. Returns (row, col, n_pts,
    * density) for every in-bounds cell with >= 1 point inside `radius`
    * (strictly: d^2 <= R^2); `density` = sum of (R^2 - d^2)^2. */
  def quartic(points: DataFrame, nrows: Int, ncols: Int, radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val spark = points.sparkSession
    import spark.implicits._
    val r2 = radius.toLong * radius
    val offsets = (for {
      dr <- -radius to radius
      dc <- -radius to radius
      d2 = dr.toLong * dr + dc.toLong * dc
      if d2 <= r2
    } yield (dr, dc, (r2 - d2) * (r2 - d2))).toSeq
    val offDf = offsets.toDF("dr", "dc", "w")
    points
      .select(col("row").cast("long").as("pr"), col("col").cast("long").as("pc"))
      .crossJoin(broadcast(offDf))
      .select(($"pr" + $"dr").as("row"), ($"pc" + $"dc").as("col"), $"w")
      .filter($"row" >= 0 && $"row" < nrows && $"col" >= 0 && $"col" < ncols)
      .groupBy($"row", $"col")
      .agg(count(lit(1)).as("n_pts"), sum($"w").as("density"))
  }
}
