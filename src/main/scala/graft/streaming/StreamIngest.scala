package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.corpus.{ImageCorpus, ImageRow}
import graft.icelite.IceLite

/** Incremental corpus ingest via Structured Streaming: a file stream of
  * image+caption rows is deduped (last-wins by image index, the mosaic seq
  * rule) per micro-batch and committed as an icelite snapshot. The
  * reference is batch-only (SURVEY.md §2.10), so this is engine surface
  * beyond it: `Trigger.AvailableNow` drains a backlog exactly once and the
  * stream's checkpoint + icelite's lineage make the ingest doubly
  * resumable (source offsets + per-bucket data checkpoints). */
object StreamIngest {

  /** Start (and await) an available-now ingest of `srcDir` into `table`.
    * Returns the number of micro-batches committed. */
  def runAvailableNow(spark: SparkSession, srcDir: String, table: String,
      checkpoint: String, gridW: Int, buckets: Int = 4): Long = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[ImageRow].schema
    var batches = 0L
    val q = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .as[ImageRow]
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[ImageRow], batchId: Long) =>
        import batch.sparkSession.implicits._
        // last-wins by image index per micro-batch (the mosaic seq
        // rule the class doc promises): generate()-style corpora plant
        // duplicate-cell rows, and icelite treats cellId as the row
        // key — committing both would double-count the cell
        val tiles = ImageCorpus.decodeTiles(batch, gridW)
          .groupByKey(_.cellId)
          .reduceGroups { (a: graft.corpus.DecodedTile,
              b: graft.corpus.DecodedTile) =>
            // compare the PARSED image index, not the id string: the
            // %08d zero-padding keeps lexicographic == numeric order
            // only below 10^8 images; past it ("img-99999999" vs
            // "img-100000000") the string compare inverts and the OLDER
            // image would win last-wins (decodeTiles already parses
            // this format, so the contract is established)
            if (a.imageId.stripPrefix("img-").toLong >=
                b.imageId.stripPrefix("img-").toLong) a else b
          }
          .map { case (_, d) =>
            graft.core.Tile(d.cellId, d.row0, d.col0, d.h, d.w, d.payload)
          }(org.apache.spark.sql.Encoders.product[graft.core.Tile])
        IceLite.commitResumable(batch.sparkSession, tiles, table, buckets,
          snap = batchId + 1)
        batches += 1
      }
      .start()
    q.awaitTermination()
    batches
  }
}
