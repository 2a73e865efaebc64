package graft.icelite

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Synth
import graft.operators.TileOps

/** Resumability gate (BASELINE.md): kill mid-ingest -> re-run skips
  * committed buckets -> final table identical to a clean run. */
class IceLiteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def demTiles = TileOps.tileGrid(spark, Synth.demRef, 6)(Synth.demValue)

  test("kill/re-run resume: committed buckets are skipped, result identical") {
    val table = Files.createTempDirectory("icelite").toString
    val buckets = 4

    // first attempt dies before bucket 2
    val died = intercept[RuntimeException] {
      IceLite.commitResumable(spark, demTiles, table, buckets, snap = 1L,
        failAtBucket = Some(2))
    }
    assert(died.getMessage.contains("injected failure"))
    // lineage rows 0 and 1 checkpointed; no metadata committed yet
    assert(IceLite.committedBuckets(table, 1L) == Set(0, 1))
    assert(IceLite.currentSnapshot(table).isEmpty)

    // re-run completes, skipping 0 and 1 (their lineage mtimes are reused)
    val before = IceLite.lineage(table, 1L).map(l => l.bucket -> l.checksum).toMap
    IceLite.commitResumable(spark, demTiles, table, buckets, snap = 1L)
    assert(IceLite.currentSnapshot(table).contains(1L))
    val after = IceLite.lineage(table, 1L).map(l => l.bucket -> l.checksum).toMap
    assert(after.size == buckets)
    assert(before.forall { case (b, c) => after(b) == c }) // untouched

    // read back: full parity with the source
    val got = IceLite.read(spark, table, 1L).collect()
      .map(t => t.cellId -> t.payload.toSeq).toMap
    val want = demTiles.collect().map(t => t.cellId -> t.payload.toSeq).toMap
    assert(got.keySet == want.keySet)
    assert(got.forall { case (k, v) =>
      v.zip(want(k)).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) }
    })
  }

  test("manifest min/max pruning skips non-overlapping buckets") {
    val table = Files.createTempDirectory("icelite2").toString
    IceLite.commitResumable(spark, demTiles, table, 4, snap = 7L)
    val all = IceLite.read(spark, table, 7L).count()
    val lo = IceLite.read(spark, table, 7L, cellRange = Some((Long.MinValue, -1L)))
    assert(lo.count() == 0) // fully pruned, no file read
    val some = IceLite.read(spark, table, 7L,
      cellRange = Some((0L, Long.MaxValue)))
    assert(some.count() == all)
  }

  test("metadata versions advance; new snapshot becomes current") {
    val table = Files.createTempDirectory("icelite3").toString
    IceLite.commitResumable(spark, demTiles, table, 2, snap = 1L)
    assert(IceLite.currentVersion(table) == 1)
    IceLite.commitResumable(spark, demTiles, table, 2, snap = 2L)
    assert(IceLite.currentVersion(table) == 2)
    assert(IceLite.currentSnapshot(table).contains(2L))
  }
}
