package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-batch construction for contrastive multimodal learning
  * (the CLIP/ALIGN data-prep step over an image+caption pair table —
  * the north-star table shape). */
object Batching {

  /** CLIP-style contrastive batch construction. Three rules, each of
    * which exists for a training-correctness reason:
    *
    *  1. CONTENT DEDUP (min-id keeper per `keyCol`, e.g. md5(bytes) or
    *     phash): two copies of the same image inside one batch would be
    *     FALSE in-batch negatives — the loss would push identical
    *     content apart. One window shuffle on the content key.
    *  2. DETERMINISTIC SHUFFLE (order by md5(id)): batches must be
    *     well-mixed but reproducible run-to-run — md5 of the id is a
    *     stable pseudo-random permutation, no RNG state.
    *  3. GLOBAL POSITION via a DISTRIBUTED index: the shuffled stream
    *     is range-partitioned by the md5 key and indexed with
    *     zipWithIndex (one per-partition count pass + per-partition
    *     offsets — the same two-pass prefix shape as
    *     TextOps.packContiguous, NEVER a single-partition global
    *     window). batch = idx / B, position-in-batch = idx % B.
    *
    * Returns (idCol, batch_id, pos). The tail batch may be short. */
  def contrastiveBatches(pairs: DataFrame, idCol: String, keyCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = pairs.sparkSession
    import spark.implicits._
    val keep = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    val deduped = pairs
      .withColumn("__r", row_number().over(keep))
      .filter(col("__r") === 1)
      .select(col(idCol).as("id"), md5(col(idCol)).as("k"))
    val indexed = deduped
      .repartitionByRange(col("k"))
      .sortWithinPartitions(col("k"), col("id"))
      .as[(String, String)]
      .rdd.zipWithIndex()
      .map { case ((id, _), idx) => (id, idx / batchSize, idx % batchSize) }
    spark.createDataset(indexed).toDF(idCol, "batch_id", "pos")
  }
}
