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

  test("mixtureInterleave: exact ratio per period, complete-period truncation") {
    import spark.implicits._
    val a = (0 until 23).map(i => s"a$i").toDF("id") // 23/2 = 11 periods
    val b = (0 until 9).map(i => s"b$i").toDF("id")  // 9/1  =  9 periods <- min
    val out = Batching.mixtureInterleave(
        Seq(("A", a, 2), ("B", b, 1)), "id")
      .as[(String, String, Long)].collect().sortBy(_._3)
    // 9 complete periods of 3 slots -> 27 rows, positions 0..26 contiguous
    assert(out.length == 27)
    assert(out.map(_._3).toSeq == (0L until 27L).toSeq)
    // every period is exactly [A, A, B]
    out.grouped(3).foreach { p =>
      assert(p.map(_._1).toSeq == Seq("A", "A", "B"))
    }
    // items within a modality appear in md5 order (stable shuffle)
    val aOrder = out.filter(_._1 == "A").sortBy(_._3).map(_._2).toSeq
    val aWant = (0 until 23).map(i => s"a$i")
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString, id))
      .take(18)
    assert(aOrder == aWant)
    intercept[IllegalArgumentException] {
      Batching.mixtureInterleave(Seq(("A", a, 0)), "id") }
  }

  test("curriculumOrder: tiers train in order, md5 shuffle within tier, partition-invariant") {
    import spark.implicits._
    val docs = (0 until 90).map(i => (f"d$i%02d", (i % 3).toLong))
      .toDF("id", "tier")
    val out = Batching.curriculumOrder(docs, "id", "tier")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.length == 90)
    // positions are contiguous 0..89 and tier is non-decreasing along them
    assert(out.map(_._3).toSeq == (0L until 90L).toSeq)
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(identity).toSeq)
    // all of tier 0 precedes all of tier 1 precedes all of tier 2
    assert(out.take(30).forall(_._2 == 0L) && out.slice(30, 60).forall(_._2 == 1L))
    // within a tier: md5(id) order (the deterministic shuffle)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val t1 = out.filter(_._2 == 1L).sortBy(_._3).map(_._1).toSeq
    assert(t1 == t1.sortBy(id => (md5hex(id), id)))
    // partition-invariance: a different input layout gives identical output
    val out2 = Batching.curriculumOrder(docs.repartition(13), "id", "tier")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out2.toSeq == out.toSeq)
  }

  test("epochOrder: contiguous epoch blocks, distinct permutations, determinism") {
    import spark.implicits._
    val docs = (0 until 60).map(i => f"d$i%02d").toDF("id")
    val out = Batching.epochOrder(docs, "id", epochs = 3)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.length == 180)
    assert(out.map(_._3).toSeq == (0L until 180L).toSeq)
    // epoch e occupies exactly [e*60, (e+1)*60)
    (0 until 3).foreach { e =>
      assert(out.slice(e * 60, (e + 1) * 60).forall(_._2 == e.toLong))
      assert(out.slice(e * 60, (e + 1) * 60).map(_._1).toSet ==
        docs.as[String].collect().toSet)
    }
    // the per-epoch permutations DIFFER (salted hash re-randomizes)
    val p0 = out.slice(0, 60).map(_._1).toSeq
    val p1 = out.slice(60, 120).map(_._1).toSeq
    val p2 = out.slice(120, 180).map(_._1).toSeq
    assert(p0 != p1 && p1 != p2 && p0 != p2)
    // deterministic under a different input layout
    val out2 = Batching.epochOrder(docs.repartition(7), "id", 3)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out2.toSeq == out.toSeq)
    intercept[IllegalArgumentException] { Batching.epochOrder(docs, "id", 0) }
  }

  test("scale smoke: 1M-row batch indexing is contiguous, full and driver-light") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 1000000L
    val ids = spark.range(n).select(
      concat(lit("x"), lpad($"id".cast("string"), 8, "0")).as("id"),
      concat(lit("x"), lpad($"id".cast("string"), 8, "0")).as("key"))
    val out = Batching.contrastiveBatches(ids, "id", "key", batchSize = 1024)
    // aggregate-only checks: nothing row-sized ever reaches the driver
    val agg = out.agg(
      count(lit(1)), countDistinct($"batch_id" * 10000 + $"pos"),
      min($"batch_id"), max($"batch_id"), min($"pos"), max($"pos"))
      .collect()(0)
    assert(agg.getLong(0) == n)
    assert(agg.getLong(1) == n) // every (batch, pos) slot distinct
    assert(agg.getLong(2) == 0L && agg.getLong(3) == (n - 1) / 1024)
    assert(agg.getLong(4) == 0L && agg.getLong(5) == 1023L)
    // every full batch holds exactly 1024 slots (tail may be short)
    val sizes = out.groupBy($"batch_id").count()
      .groupBy($"count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(1024L) >= n / 1024 - 1)
  }

  test("lengthBuckets: batches fill in (len, id) order, waste matches " +
      "the driver oracle, deterministic across partitioning") {
    import spark.implicits._
    val n = 100
    val lens = (0 until n).map(i => (i.toLong, ((i * 37) % 50 + 1).toLong))
    val df = lens.toDF("doc_id", "n_tok")
    val out = Batching.lengthBuckets(df, "doc_id", "n_tok", 8)
      .orderBy($"batch_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // driver oracle: sort by (len, id), fill batches of 8, roll up
    val sorted = lens.sortBy { case (id, l) => (l, id) }
    val expect = sorted.grouped(8).zipWithIndex.map { case (g, b) =>
      val mx = g.map(_._2).max; val sm = g.map(_._2).sum
      (b.toLong, g.length.toLong, mx, sm, g.length * mx - sm)
    }.toSeq
    assert(out.toSeq == expect)
    // 12 full batches + tail of 4; max_len never decreases batch-over-
    // batch (the bucketing property that bounds padding)
    assert(out.count(_._2 == 8) == 12 && out.last._2 == 4)
    assert(out.sliding(2).forall(p => p(0)._3 <= p(1)._3))
    // physical partitioning must not leak into the order
    val out2 = Batching.lengthBuckets(df.repartition(7), "doc_id", "n_tok", 8)
      .orderBy($"batch_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(out2.toSeq == expect)
    // out-of-domain lengths fail loudly (the 12-digit pad contract)
    intercept[Exception] {
      Batching.lengthBuckets(Seq((1L, -3L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", 8).collect()
    }
  }
}
