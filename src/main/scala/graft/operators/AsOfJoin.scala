package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively — backward as-of join and
  * tolerance range join — built as single-shuffle declarative plans
  * (no cartesian, no per-key window-over-join blowup).
  *
  * Not derived from the reference (hydro-raster is batch-raster-only);
  * these are the event/time-series companions a training-data pipeline
  * needs next to the spatial joins, implemented with the same
  * "one equi-shuffle + streaming kernel" discipline as J1-J8.
  */
object AsOfJoin {

  /** Backward as-of join: for every left row, the single most recent
    * right row with the same `key` and `rightTs` <= `leftTs` (exact
    * matches allowed). Ties on `rightTs` resolve to the largest right
    * payload in struct order — put a unique id first in `rightCols` to
    * make the pick total and deterministic.
    *
    * Plan shape (the part that matters at 100 TB): both sides are
    * union-tagged and shuffled ONCE on `key`; the match is a running
    * `last(_, ignoreNulls)` over an UNBOUNDED PRECEDING..CURRENT ROW
    * frame — WindowExec streams it, holding O(1) state per key, so a
    * hot key costs linear work in one task, exactly like a sort-merge
    * join, never the O(rows_l x rows_r) of the naive
    * `join(l.ts >= r.ts) + row_number` formulation.
    *
    * Output: every left row (left-join semantics) + the matched right
    * payload columns renamed with `rightPrefix`, null when no right row
    * precedes. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(rightCols.map(right(_)): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    // side 0 (right) sorts before side 1 (left) at equal ts, so an
    // exact-timestamp right row is visible to the left row
    val lu = left.select(left(key).as("__k"), left(leftTs).as("__ts"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // a NULL right timestamp would sort nulls-first and become "earlier
    // than everything" — SQL as-of semantics (ts <= ts) never match it,
    // so drop such rows up front. A NULL right KEY is dropped for the
    // same reason: Window.partitionBy groups NULLs together, which would
    // match NULL-key left rows (an equi/sort-merge join never matches
    // NULL = NULL; pandas merge_asof and DuckDB ASOF JOIN agree).
    // NULL-key LEFT rows stay — left-join semantics, payload null.
    val ru = right.filter(right(rightTs).isNotNull && right(key).isNotNull)
      .select(right(key).as("__k"), right(rightTs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightCols.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    matched.select(outCols: _*)
  }

  /** Tolerance range join: all (left, right) pairs with the same `key`
    * whose timestamps differ by at most `tolSec` seconds.
    *
    * Scale shape: the right side is exploded to its three tolerance
    * buckets (floor(ts/tol) - 1 .. + 1) and the match is an EQUI-join on
    * (key, bucket) + an exact |dt| filter — one shuffle whose volume is
    * 3x the right side's (key, ts, payload-id) descriptors, never the
    * inequality-join cartesian. Each true pair is produced exactly once
    * (the left row owns one bucket; each right row visits it once). */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tolSec: Long,
      leftCols: Seq[String], rightCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    require(tolSec > 0, // tol=0 would divide __lus by zero -> NULL
      s"rangeJoin: tolSec must be positive, got $tolSec (for exact-" +
        "timestamp pairing use an equi-join on the timestamp)")
    val tolUs = tolSec * 1000000L
    val l = left.select((Seq(left(key).as("__k"),
      unix_micros(left(leftTs).cast("timestamp")).as("__lus")) ++ leftCols.map(left(_))): _*)
      .withColumn("__b", expr(s"__lus div $tolUs")) // exact long division
    val r = right.select((Seq(right(key).as("__k"),
      unix_micros(right(rightTs).cast("timestamp")).as("__rus")) ++
      rightCols.map(c => right(c).as(s"$rightPrefix$c"))): _*)
      .withColumn("__b0", expr(s"__rus div $tolUs"))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
    l.join(r, Seq("__k", "__b"))
      .filter(abs(col("__rus") - col("__lus")) <= tolUs)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"$rightPrefix$c")) :+
        ((col("__rus") - col("__lus")) / 1000000.0).as("dt_sec")): _*)
  }
}
