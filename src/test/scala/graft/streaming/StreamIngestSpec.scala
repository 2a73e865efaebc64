package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.ImageCorpus
import graft.icelite.IceLite

class StreamIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("available-now stream drains a backlog into icelite snapshots") {
    import spark.implicits._
    val src = Files.createTempDirectory("stream-src").toString
    val table = Files.createTempDirectory("stream-table").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val gridW = 4

    // backlog: 16 tiles in two files
    ImageCorpus.generate(spark, 16, gridW).coalesce(1)
      .write.mode("append").parquet(src)
    StreamIngest.runAvailableNow(spark, src, table, ckpt, gridW)
    val snap1 = IceLite.currentSnapshot(table)
    assert(snap1.nonEmpty)
    val n1 = IceLite.read(spark, table, snap1.get).count()
    assert(n1 == 16)

    // new arrivals -> second run picks up ONLY the new file (checkpointed
    // source offsets), commits a new snapshot
    spark.range(16, 24).map(i => ImageCorpus.rowOf(i, gridW)).coalesce(1)
      .write.mode("append").parquet(src)
    StreamIngest.runAvailableNow(spark, src, table, ckpt, gridW)
    val snap2 = IceLite.currentSnapshot(table)
    assert(snap2.nonEmpty && snap2 != snap1)
    val n2 = IceLite.read(spark, table, snap2.get).count()
    assert(n2 == 8) // the incremental batch only
    // both snapshots remain readable (time travel)
    assert(IceLite.read(spark, table, snap1.get).count() == 16)
  }
}
