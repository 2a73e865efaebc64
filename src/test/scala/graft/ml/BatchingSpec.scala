package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BatchingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("contrastiveBatches: dedup keeper, full batches, no dup content, determinism") {
    import spark.implicits._
    // 100 items, content key collides in pairs for k < 20 (id '0a'/'0b'
    // share content 'c0' etc.) — the keeper is the min id of each pair
    val rows = (0 until 100).map { i =>
      val id = f"x$i%03d"
      val key = if (i < 40) s"c${i / 2}" else s"u$i"
      (id, key)
    }
    val df = rows.toDF("id", "key")
    val out = Batching.contrastiveBatches(df, "id", "key", batchSize = 8)
      .as[(String, Long, Long)].collect()
    // 100 - 20 collapsed = 80 kept; keepers are the even-index ids
    assert(out.length == 80)
    val kept = out.map(_._1).toSet
    (0 until 40 by 2).foreach(i => assert(kept.contains(f"x$i%03d")))
    (1 until 40 by 2).foreach(i => assert(!kept.contains(f"x$i%03d")))
    // batches 0..9 of size 8 exactly; positions 0..7 once each
    val byBatch = out.groupBy(_._2)
    assert(byBatch.keySet == (0L until 10L).toSet)
    byBatch.values.foreach { b =>
      assert(b.map(_._3).sorted.toSeq == (0L until 8L).toSeq)
    }
    // no duplicate content inside any batch
    val keyOf = rows.toMap
    byBatch.values.foreach { b =>
      val ks = b.map(r => keyOf(r._1))
      assert(ks.distinct.length == ks.length)
    }
    // deterministic under a different input partitioning
    val out2 = Batching.contrastiveBatches(df.repartition(7), "id", "key", 8)
      .as[(String, Long, Long)].collect().toSet
    assert(out2 == out.toSet)
    intercept[IllegalArgumentException] {
      Batching.contrastiveBatches(df, "id", "key", 0)
    }
  }
}
