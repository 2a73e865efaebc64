package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flagship entry: rows > 0, caption lineage intact, burn stats present") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length >= 6)
    val byStage = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("corpus_caption_ok") == 64L)
    assert(byStage("corpus_mosaic_valid_px") > 0L)
    assert(rows.count(_.getString(0).startsWith("edit_burn_")) == 4)
  }

  test("every oracleSql key has a matching queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
