package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CellId

/** Distributed cell-set algebra over the Z-order cell index — the
  * DataFrame forms of [[graft.core.CellId.compact]]/children for covers
  * too large to materialize on the driver (a continental polygon cover
  * at res 0 is billions of cells; the driver-array compact in CellId is
  * for the per-feature covers the rasterize planner builds).
  *
  * Both directions are pure 64-bit arithmetic on the id layout
  * ([res: 5][z-interleaved cx,cy: 58], `CellId.scala`): a parent's z is
  * the child's z >> 2, and a parent's 4^d descendants at resolution
  * r-d are the CONTIGUOUS id block [(z << 2d), (z << 2d) + 4^d) — so
  * compaction never decodes coordinates and uncompaction is a
  * codegen'd sequence/explode, no UDF anywhere.
  */
object CellOps {

  private val ZMask = (1L << 58) - 1

  /** S2/H3-style compact: replace any 4 complete siblings by their
    * parent, repeatedly, yielding the minimal mixed-res cover of the
    * same pixel set. Input must be a DISJOINT cell set (e.g. any
    * single-res cover; duplicates are dropped). One groupBy-parent
    * shuffle + one anti-join per merge level, data shrinking 4x per
    * round on merge-heavy inputs; rounds are bounded by the res span
    * (<= 28), and the loop exits the first round nothing merges.
    * Plans are localCheckpoint'd each round so the lineage stays
    * constant-size over any level count. Output column: `cell`. */
  def compactCells(cells: DataFrame, cellCol: String): DataFrame = {
    val parentExpr = expr(
      s"shiftleft(shiftrightunsigned(cell, 58) + 1L, 58) | " +
        s"shiftrightunsigned(cell & ${ZMask}L, 2)")
    var cur = cells.select(col(cellCol).cast("long").as("cell"))
      // lazy: round 1's complete-agg scans every partition (the per-round
      // checkpoints stay EAGER — isEmpty is a partial action and a lazy
      // checkpoint materialized by take(1) caches only the partitions it
      // touched)
      .distinct().localCheckpoint(false)
    var changed = true
    while (changed) {
      val withP = cur.withColumn("p",
        when(expr("shiftrightunsigned(cell, 58)") < CellId.MaxRes, parentExpr))
      val complete = withP.where(col("p").isNotNull)
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .where(col("n") === 4)
        .select(col("p").as("cell"))
        .localCheckpoint()
      if (complete.isEmpty) changed = false
      else {
        val kept = withP
          .join(complete.select(col("cell").as("cp")),
            col("p") === col("cp"), "left_anti")
          .select(col("cell"))
        cur = kept.unionByName(complete).localCheckpoint()
      }
    }
    cur
  }

  /** Inverse of [[compactCells]]: expand a (possibly mixed-res) cell set
    * to uniform `targetRes` — each cell becomes its contiguous id block
    * of 4^(res - targetRes) descendants via sequence/explode, all
    * codegen'd column arithmetic. Cells already at `targetRes` pass
    * through; cells FINER than it are rejected loudly (expanding
    * downward is ill-posed). The fan-out happens inside each input
    * split — no shuffle at all. */
  def uncompactCells(cells: DataFrame, cellCol: String, targetRes: Int): DataFrame = {
    require(targetRes >= 0 && targetRes <= CellId.MaxRes,
      s"targetRes out of range: $targetRes")
    cells.select(col(cellCol).cast("long").as("cell"))
      .withColumn("d", expr(
        s"cast(shiftrightunsigned(cell, 58) AS INT) - $targetRes"))
      .withColumn("d", when(col("d") >= 0, col("d")).otherwise(raise_error(
        concat(lit(s"uncompactCells: cell finer than targetRes $targetRes: "),
          col("cell").cast("string")))))
      .select(
        expr(s"shiftleft(${targetRes}L, 58) | " +
          s"shiftleft(cell & ${ZMask}L, 2 * d)").as("b"),
        explode(sequence(lit(0L),
          expr("shiftleft(1L, 2 * d) - 1L"))).as("k"))
      .select((col("b") + col("k")).as("cell"))
  }
}
