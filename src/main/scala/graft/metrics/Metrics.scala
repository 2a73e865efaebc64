package graft.metrics

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Accumulator-backed job metrics — the north rule pairs these with the
  * per-partition lineage rows icelite already writes: counters increment
  * inside tasks, Spark merges them per-stage, and the driver reads the
  * rolled-up totals mid-flight or after the job (they also surface in the
  * UI / event log under their registered names).
  *
  * Instances are created on the driver and CAPTURED into operator
  * closures (never reached through a singleton object, which would be a
  * fresh uninitialized copy on remote executors), so the same wiring is
  * correct on a multi-executor cluster.
  *
  * Caveat (standard Spark accumulator semantics): task retries and
  * recomputation of unpersisted lineage re-add their increments, so these
  * are throughput/progress METRICS, not exactly-once counts — the
  * correctness gates stay on query output and lineage checksums.
  */
final case class PipelineMetrics(
    tilesDecoded: LongAccumulator,
    pixelsDecoded: LongAccumulator,
    cellsBurned: LongAccumulator,
    rowsCommitted: LongAccumulator) {

  /** Driver-side snapshot of the merged totals (stable key order). */
  def snapshot: Seq[(String, Long)] = Seq(
    "tiles_decoded" -> tilesDecoded.value,
    "pixels_decoded" -> pixelsDecoded.value,
    "cells_burned" -> cellsBurned.value,
    "rows_committed" -> rowsCommitted.value)

  def json: String =
    snapshot.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}

object PipelineMetrics {
  /** Register one named LongAccumulator per counter on the session's
    * SparkContext. Call once per job on the driver. */
  def register(spark: SparkSession): PipelineMetrics = {
    val sc = spark.sparkContext
    PipelineMetrics(
      tilesDecoded = sc.longAccumulator("graft.tiles_decoded"),
      pixelsDecoded = sc.longAccumulator("graft.pixels_decoded"),
      cellsBurned = sc.longAccumulator("graft.cells_burned"),
      rowsCommitted = sc.longAccumulator("graft.rows_committed"))
  }
}
