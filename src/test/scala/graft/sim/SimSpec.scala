package graft.sim

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("IVF + kmeans: recall@5 >= 0.9 on clustered data; mechanism ok on random") {
    import spark.implicits._
    // synthetic CLUSTERED fixture: 8 well-separated centers, 40 pts each,
    // deterministic jitter — the regime IVF is built for
    val dim = 16
    val pts = (0 until 320).map { i =>
      val cl = i % 8
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 8 == cl) 10.0f else 0.0f
        center + (((i * 31 + d * 17) % 7) - 3) * 0.05f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Similarity.bruteTopK(q,
        e.select($"vec_id".as("vid"), $"embedding".as("v")), 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val clusters = Similarity.kmeansClusters(spark, e, "vec_id", "embedding",
      k = 8, iters = 5)
    val withCl = e.join(clusters, e("vec_id") === clusters("vid")).drop("vid")
    val ivf = Similarity.ivfTopK(spark, withCl, "vec_id", "embedding", "cl",
        q, k = 5, nProbe = 2)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall@5 on clustered fixture = $recall")
    assert(ivf.forall { case (a, b) => a != b })

    // random driver table: report, don't assert (no structure to exploit)
    val er = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clr = Similarity.kmeansClusters(spark, er, "vec_id", "embedding", 8, 3)
    val withClr = er.join(clr, er("vec_id") === clr("vid")).drop("vid")
    val qr = er.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val ivfr = Similarity.ivfTopK(spark, withClr, "vec_id", "embedding", "cl",
      qr, k = 5, nProbe = 3)
    assert(ivfr.count() == 50) // mechanism: full top-5 per query
  }

  test("PQ: ADC shortlist + exact re-rank == brute top-5 on clustered data; " +
    "recall reported on random") {
    import spark.implicits._
    val dim = 16
    val pts = (0 until 320).map { i =>
      val cl = i % 8
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 8 == cl) 10.0f else 0.0f
        center + (((i * 31 + d * 17) % 7) - 3) * 0.05f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Similarity.bruteTopK(q,
        e.select($"vec_id".as("vid"), $"embedding".as("v")), 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(spark, e, "vec_id", "embedding", q,
        m = 4, ksub = 16, iters = 3, shortlist = 60, k = 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    assert(pq == brute, s"missing=${(brute -- pq).take(5)}")

    // random embeddings: the mechanism must return full top-k and the
    // exact re-rank keeps ordering honest even when ADC recall is
    // data-limited (report only, like the IVF random leg)
    val er = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qr = er.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val pqr = Similarity.pqTopK(spark, er, "vec_id", "embedding", qr,
      m = 8, ksub = 16, iters = 2, shortlist = 50, k = 5)
    assert(pqr.count() == 50)
    // codebook geometry: m x ksub x subDim with dim divisibility enforced
    val books = Similarity.pqTrain(spark, e, "vec_id", "embedding", 4, 16, 1)
    assert(books.length == 4 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 4)))
    intercept[IllegalArgumentException](
      Similarity.pqTrain(spark, e, "vec_id", "embedding", 5, 16, 1))
  }

  test("IVF-PQ composition == brute top-5 on clustered data") {
    import spark.implicits._
    val dim = 16
    val pts = (0 until 320).map { i =>
      val cl = i % 8
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 8 == cl) 10.0f else 0.0f
        center + (((i * 31 + d * 17) % 7) - 3) * 0.05f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Similarity.bruteTopK(q,
        e.select($"vec_id".as("vid"), $"embedding".as("v")), 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val (clusters, centroids) = Similarity.kmeansWithCentroids(
      spark, e, "vec_id", "embedding", k = 8, iters = 5)
    val withCl = e.join(clusters, e("vec_id") === clusters("vid")).drop("vid")
    val got = Similarity.ivfPqTopK(spark, withCl, "vec_id", "embedding", "cl",
        q, centroids, m = 4, ksub = 16, iters = 3, nProbe = 2,
        shortlist = 50, k = 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    assert(got == brute, s"missing=${(brute -- got).take(5)}")
  }

  test("nearDupPairs: banded sign-LSH == brute all-pairs on planted twins") {
    import spark.implicits._
    // deterministic pseudo-random base vectors + 20 planted twins
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val dim = 64
    val base = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (mix(i.toLong * 131 + d) >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0))
    }
    val twins = (0 until 20).map { i =>
      val v = base(i)._2; val w = base(i + 20)._2
      (1000L + i, Array.tabulate(dim)(d => 0.9 * v(d) + 0.1 * w(d)))
    }
    val vecs = spark.createDataset(base ++ twins).toDF("vid", "v")
    val got = Similarity.nearDupPairs(vecs, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    // brute oracle
    val all = (base ++ twins).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val want = (for {
      i <- all.indices; j <- all.indices
      if all(i)._1 < all(j)._1 && cos(all(i)._2, all(j)._2) >= 0.95
    } yield (all(i)._1, all(j)._1)).toSet
    assert(want.size == 20, s"fixture should plant exactly 20 pairs, got ${want.size}")
    assert(got == want)
  }

  test("kmeans: an emptied cluster keeps its centroid (no index shift)") {
    import spark.implicits._
    // duplicate init points: vids 0 and 1 share a position, so init
    // centroids 0 and 1 coincide and the strict-< argmin sends every
    // member to centroid 0 — centroid 1 EMPTIES. Dropping it would shift
    // centroid 2's id and remap the far cluster's assignments.
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(10.0f, 0.0f)), (3L, Array(10.1f, 0.0f)))
    val df = spark.createDataset(pts).toDF("vec_id", "embedding")
    val (assign, centroids) = Similarity.kmeansWithCentroids(
      spark, df, "vec_id", "embedding", k = 3, iters = 5)
    val cl = assign.as[(Long, Int)].collect().toMap
    assert(cl(0) == cl(1) && cl(0) == 0)
    assert(cl(2) == cl(3) && cl(2) == 2) // far cluster keeps id 2, no shift
    assert(centroids.count() == 3) // all 3 ids survive, none dropped
  }

  test("nearDupPairs: non-64-dim embeddings get full-width hyperplanes") {
    import spark.implicits._
    // dim=96 fixture where ALL discriminating signal lives in components
    // 64..95: each pair shares a large upper-band signal, prefixes are
    // independent tiny noise. Truncated-to-64 hyperplanes would see only
    // the noise -> bands match with P ~ 2^-12 -> recall ~ 0. Full-width
    // planes see the dominant signal -> recall 1.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def rnd(seed: Long): Double =
      (mix(seed) >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
    val dim = 96
    val vecs = spark.createDataset((0 until 30).flatMap { p =>
      def member(side: Int): Array[Double] = Array.tabulate(dim) { d =>
        if (d < 64) 0.01 * rnd(p.toLong * 1000 + side * 100 + d) // noise prefix
        else rnd(p.toLong * 7919 + d) // shared per-pair signal
      }
      Seq((p.toLong * 2, member(0)), (p.toLong * 2 + 1, member(1)))
    }).toDF("vid", "v")
    val got = Similarity.nearDupPairs(vecs, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    val want = (0 until 30).map(p => (p.toLong * 2, p.toLong * 2 + 1)).toSet
    assert(got == want, s"missed ${(want -- got).size} of 30 upper-band pairs")
  }

  test("classify: break semantics incl. below-first -> nodata and open top") {
    import spark.implicits._
    import graft.core._
    import graft.operators.{TileFns, TileOps}
    val ref = GridRef(8, 1, 0, 0, 1)
    val vals = Array(10.0, 50.0, 99.9, 100.0, 149.0, 200.0, 250.0, Double.NaN)
    val tiles = TileOps.tileGrid(spark, ref, 3)((r, c) => vals(c))
    val classed = TileFns.classify(tiles, Array(50.0, 100.0, 150.0, 200.0))
      .collect().head.payload
    assert(classed(0).isNaN) // below first break
    assert(classed(1) == 1.0 && classed(2) == 1.0)
    assert(classed(3) == 2.0 && classed(4) == 2.0)
    assert(classed(5) == 4.0 && classed(6) == 4.0) // open-ended top
    assert(classed(7).isNaN)
  }

  test("semDedup: kmeans recovers clusters; removal == brute within-cluster rule") {
    import spark.implicits._
    val C = 12; val M = 36; val dim = 24
    val pts = (0 until C * M).map { vid =>
      val cl = vid % C; val m = vid / C; val g = m % C
      val v = Array.tabulate(dim) { d =>
        var x = 0.0f
        if (d == cl) x += 8.0f
        if (d == C + g) x += 4.0f
        if (m >= 12 && m < 24 && d == C + ((g + 1) % C)) x += 0.25f
        x
      }
      (vid.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vid", "v")
    val out = Similarity.semDedup(spark, e, k = C, iters = 2, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.length == C * M)
    // independent driver-side arithmetic: brute the EXISTS rule directly
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { case (vid, cl, removed) =>
      assert(cl == (vid % C).toInt, s"kmeans failed to recover cluster of $vid")
      val brute = pts.exists { case (vj, vv) =>
        vj < vid && vj % C == vid % C && cos(vv, pts(vid.toInt)._2) >= 0.95
      }
      assert(removed == brute, s"vid $vid: removed=$removed brute=$brute")
      // closed form of the fixture: exactly the m >= 12 members are dups
      assert(removed == (vid / C >= 12))
    }
    // both branches of the gate are exercised
    assert(out.count(_._3) == C * 24 && out.count(!_._3) == C * 12)
  }

  test("toInt rounds half-even like np.around (Raster.py:152-165)") {
    import graft.core._
    import graft.operators.{TileFns, TileOps}
    val ref = GridRef(6, 1, 0, 0, 1)
    val vals = Array(0.5, 1.5, 2.5, -0.5, 2.25, Double.NaN)
    val tiles = TileOps.tileGrid(spark, ref, 3)((r, c) => vals(c))
    val got = TileFns.toInt(tiles).collect().head.payload
    assert(got(0) == 0.0 && got(1) == 2.0 && got(2) == 2.0) // half-even
    assert(got(3) == -0.0 || got(3) == 0.0)
    assert(got(4) == 2.0)
    assert(got(5).isNaN)
  }

  test("SQ8: quantizer semantics; shortlist+re-rank == brute top-5 on clustered data") {
    import spark.implicits._
    // quantizer: floor(+0.5) half-up (NOT rint half-even), clamp, zero-scale
    val s = Array(10.0, 10.0, 0.0, 4.0)
    val q = Similarity.sq8Quantize(Array(10.0f, -10.0f, 3.0f, 2.0f), s)
    assert(q.toSeq == Seq[Byte](127, -127, 0, 64)) // 127*2/4+0.5 = 64.0
    val q2 = Similarity.sq8Quantize(Array(0.5f, -0.5f, 0.0f, -2.0f), s)
    // 127*0.5/10 = 6.35 -> 6; -6.35+0.5 = -5.85 -> floor = -6; -127*2/4 = -63.5+0.5 -> -63
    assert(q2.toSeq == Seq[Byte](6, -6, 0, -63))

    // same clustered fixture as IVF. Within-cluster jitter (~0.5%) sits
    // BELOW int8 resolution (1/127 ~ 0.8%), so quantized dots cannot
    // order cluster members — the textbook SQ8 recall story. But the
    // cross-cluster gap is huge, so a shortlist covering the cluster
    // size (40 < 48) provably contains the true top-5 and the exact
    // re-rank must then reproduce brute top-5 exactly
    val dim = 16
    val pts = (0 until 320).map { i =>
      val cl = i % 8
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 8 == cl) 10.0f else 0.0f
        center + (((i * 31 + d * 17) % 7) - 3) * 0.05f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val q5 = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Similarity.bruteTopK(q5,
        e.select($"vec_id".as("vid"), $"embedding".as("v")), 5)
      .select("qid", "rank", "vid").as[(Long, Long, Long)].collect().toSet
    val sq8 = Similarity.sq8TopK(spark, e, "vec_id", "embedding",
        e.filter($"vec_id" < 16), "vec_id", "embedding", k = 5, shortlist = 48)
      .select("qid", "rank", "vid").as[(Long, Long, Long)].collect().toSet
    assert(sq8 == brute, "SQ8 shortlist+re-rank must equal brute here")
  }

  test("filtered IVF (hybrid search) == brute top-5 over the filtered corpus") {
    import spark.implicits._
    val C = 16; val M = 30; val dim = 16
    val e = spark.range(C.toLong * M).map { vid =>
      val cl = (vid % C).toInt; val m = (vid / C).toInt
      val v = Array.tabulate(dim) { d =>
        val center = if (d == cl) 8.0f else 0.0f
        center + (((m * 31 + d * 17 + cl * 7) % 13) - 6) * 0.125f
      }
      (vid, v, (vid % 3).toInt)
    }.toDF("vec_id", "embedding", "lang")
    val (clusters, centroids) = Similarity.kmeansWithCentroids(
      spark, e.select($"vec_id", $"embedding"), "vec_id", "embedding",
      k = C, iters = 2)
    val withCl = e.join(clusters, e("vec_id") === clusters("vid")).drop("vid")
    val filtered = withCl.filter($"lang" === 0)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val ivf = Similarity.ivfTopK(spark, filtered, "vec_id", "embedding", "cl",
        q, k = 5, nProbe = 2, centroidTable = Some(centroids))
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteTopK(q,
        filtered.select($"vec_id".as("vid"), $"embedding".as("v")), 5)
      .select("qid", "rank", "vid").as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute, "filter must compose with the IVF list scan exactly")
    // every result passes the predicate
    assert(ivf.forall(_._3 % 3 == 0))
  }

  test("hardNegatives == driver brute over the label-complement; never same-label") {
    import spark.implicits._
    val dim = 6
    val rnd = new scala.util.Random(91)
    val rows = (0L until 120L).map { vid =>
      (vid, Array.fill(dim)((rnd.nextInt(17) - 8) * 0.25f),
        s"lab${vid % 4}")
    }
    val e = spark.createDataset(rows).toDF("vid", "v", "label")
    val anchors = e.filter($"vid" < 15)
      .select($"vid".as("qid"), $"v".as("qv"), $"label".as("qlabel"))
    val got = Similarity.hardNegatives(anchors, e, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    // driver brute: exact cosine over the complement label set
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.filter(_._1 < 15).flatMap { case (qid, qv, ql) =>
      rows.filter(r => r._1 != qid && r._3 != ql)
        .map(r => (r._1, cos(qv, r._2)))
        .sortBy { case (vid, c) => (-c, vid) }
        .take(4).zipWithIndex
        .map { case ((vid, _), i) => (qid, (i + 1).toLong, vid) }
    }.toSet
    assert(got == want)
    val lab = rows.map(r => r._1 -> r._3).toMap
    assert(got.forall { case (q, _, v) => lab(q) != lab(v) })
  }

  test("large-Q join paths (Q = corpus size) == broadcast paths: sq8/pq/ivf-pq") {
    import spark.implicits._
    // Q = CORPUS: every vector queries every other. qBroadcastLimit = 0
    // forces the distributed join path (queries never collect to the
    // driver); the default limit takes the broadcast path. Both must
    // produce identical rows — the paths differ only in plan shape.
    val dim = 16
    val pts = (0 until 96).map { i =>
      val cl = i % 4
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 4 == cl) 10.0f else 0.0f
        center + (((i * 31 + d * 17) % 7) - 3) * 0.05f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val qAll = e.select($"vec_id".as("qid"), $"embedding".as("qv"))

    // SQ8 integer shortlist
    val sqB = Similarity.sq8Shortlist(spark, e, "vec_id", "embedding",
        e, "vec_id", "embedding", shortlist = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sqJ = Similarity.sq8Shortlist(spark, e, "vec_id", "embedding",
        e, "vec_id", "embedding", shortlist = 8, qBroadcastLimit = 0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sqJ == sqB, "sq8 join path must equal broadcast path")
    assert(sqJ.nonEmpty)

    // Flat-PQ
    val pqB = Similarity.pqTopK(spark, e, "vec_id", "embedding", qAll,
        m = 4, ksub = 8, iters = 2, shortlist = 16, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    val pqJ = Similarity.pqTopK(spark, e, "vec_id", "embedding", qAll,
        m = 4, ksub = 8, iters = 2, shortlist = 16, k = 5,
        qBroadcastLimit = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pqJ == pqB, "pq join path must equal broadcast path")

    // IVF-PQ (probe-bucket equi-join on the cluster id)
    val (clusters, centroids) = Similarity.kmeansWithCentroids(
      spark, e, "vec_id", "embedding", k = 4, iters = 3)
    val withCl = e.join(clusters, e("vec_id") === clusters("vid")).drop("vid")
    val ipB = Similarity.ivfPqTopK(spark, withCl, "vec_id", "embedding",
        "cl", qAll, centroids, m = 4, ksub = 8, iters = 2,
        nProbe = 2, shortlist = 16, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    val ipJ = Similarity.ivfPqTopK(spark, withCl, "vec_id", "embedding",
        "cl", qAll, centroids, m = 4, ksub = 8, iters = 2,
        nProbe = 2, shortlist = 16, k = 5, qBroadcastLimit = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(ipJ == ipB, "ivf-pq probe-bucket join path must equal broadcast path")
  }

  test("rangeSearch: ball-bound pruned == brute radius filter; probes actually prune") {
    import spark.implicits._
    // the e2/e8 fixture: 16 orthogonal clusters x 30 members, dyadic
    // jitter — within-cluster cosines >= 0.92, cross-cluster <= 0.22
    val C = 16; val M = 30; val dim = 16
    val pts = (0 until C * M).map { i =>
      val cl = i % C; val m = i / C
      val v = Array.tabulate(dim) { d =>
        val center = if (d == cl) 8.0f else 0.0f
        center + (((m * 31 + d * 17 + cl * 7) % 13) - 6) * 0.125f
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val tau = 0.6
    // brute radius: every pair passing the cosine floor, no pruning
    val brute = q.join(e.select($"vec_id".as("vid"), $"embedding".as("v")),
        $"vid" =!= $"qid")
      .withColumn("cos", Similarity.dot("qv", "v") /
        (sqrt(Similarity.dot("qv", "qv")) * sqrt(Similarity.dot("v", "v"))))
      .filter($"cos" >= tau)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val (clusters, centroids) = Similarity.kmeansWithCentroids(
      spark, e, "vec_id", "embedding", k = C, iters = 2)
    val withCl = e.join(clusters, e("vec_id") === clusters("vid")).drop("vid")
    val pruned = Similarity.rangeSearch(spark, withCl, "vec_id", "embedding",
        "cl", q, tau, centroidTable = Some(centroids))
      .as[(Long, Long)].collect().toSet
    assert(pruned == brute, "ball-bound range search must equal brute radius")
    assert(brute.size == 10 * (M - 1),
      s"fixture sanity: each query matches exactly its ${M - 1} cluster " +
        s"siblings at tau=$tau, got ${brute.size}")
    // the bound must PRUNE on separated data: with 16 orthogonal
    // clusters, a query's ball intersects far fewer than all 16
    val base = withCl.select($"vec_id".as("vid"), $"embedding".as("v"), $"cl")
    val probes = Similarity.rangeProbes(base, q, centroids, tau)
      .select("qid", "cl").as[(Long, Long)].collect()
    assert(probes.length < 10 * C / 2,
      s"expected real pruning (<${10 * C / 2} probe pairs), got ${probes.length}")
    // superset witness: every result's cluster is probed
    val clOf = clusters.as[(Long, Long)].collect().toMap
    val probeSet = probes.toSet
    assert(brute.forall { case (qid, vid) => probeSet((qid, clOf(vid))) },
      "every true result's cluster must be in the probe set")
    // a far-off query (orthogonal-ish direction none of the clusters
    // occupy strongly) returns zero rows, not an error
    val farQ = spark.createDataset(Seq(
        (999L, Array.fill(dim)(1.0f)))).toDF("qid", "qv")
    val far = Similarity.rangeSearch(spark, withCl, "vec_id", "embedding",
        "cl", farQ, 0.99, centroidTable = Some(centroids))
    assert(far.count() == 0L)
  }

  test("MIPS: augmented ranking == driver brute dot; differs from cosine; " +
    "augmented corpus is constant-norm and serves an unchanged IVF index") {
    import spark.implicits._
    val dim = 16
    // norm-skewed clustered fixture: spike clusters scaled 5x by id
    val pts = (0 until 320).map { i =>
      val cl = i % 8
      val s = (i % 5 + 1) * 0.25f
      val v = Array.tabulate(dim) { d =>
        val base = if (d % 8 == cl) 10.0f else 0.0f
        (base + (((i * 31 + d * 17) % 7) - 3) * 0.25f) * s
      }
      (i.toLong, v)
    }
    val e = spark.createDataset(pts).toDF("vec_id", "v")
    val q = e.filter($"vec_id" < 12).select($"vec_id".as("qid"), $"v".as("qv"))
    val got = Similarity.mipsTopK(q, e, "vec_id", "v", k = 5)
      .select("qid", "rank", "vid").as[(Long, Long, Long)].collect().toSet
    // driver brute: exact dot ranking with vid tie-break
    val byId = pts.toMap
    val want = (0L until 12L).flatMap { qid =>
      val qv = byId(qid)
      pts.filter(_._1 != qid)
        .map { case (vid, v) =>
          (vid, (0 until dim).map(d => qv(d).toDouble * v(d)).sum) }
        .sortBy { case (vid, ip) => (-ip, vid) }
        .take(5).zipWithIndex
        .map { case ((vid, _), r) => (qid, (r + 1).toLong, vid) }
    }.toSet
    assert(got == want, s"diff: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
    // on a norm-skewed corpus MIPS and cosine genuinely disagree
    val cosSets = Similarity.bruteTopK(q,
        e.select($"vec_id".as("vid"), $"v"), 5)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    assert(got.map { case (a, _, c) => (a, c) } != cosSets,
      "fixture must separate MIPS from cosine ranking")
    // augmentation contract: every augmented vector has norm M
    val aug = Similarity.mipsAugment(e, "vec_id", "v")
    val norms = aug.select(expr(
        "sqrt(aggregate(va, 0.0D, (acc, x) -> acc + x * x))").as("n"))
      .as[Double].collect()
    assert(norms.max - norms.min < 1e-9, s"norm spread ${norms.max - norms.min}")
    // the augmented corpus drops into the cosine IVF index unchanged:
    // same (qid, vid) result sets as the exact MIPS ranking
    val augF = aug.select($"vid",
      expr("transform(va, x -> CAST(x AS FLOAT))").as("vaf"))
    val clusters = Similarity.kmeansClusters(spark, augF, "vid", "vaf",
      k = 8, iters = 5)
    val withCl = aug.join(clusters.withColumnRenamed("vid", "cid"),
      aug("vid") === col("cid")).drop("cid")
    val qa = q.select($"qid",
      concat(expr("transform(qv, x -> CAST(x AS DOUBLE))"),
        array(lit(0.0))).as("qv"))
    val ivf = Similarity.ivfTopK(spark, withCl, "vid", "va", "cl",
        qa, k = 5, nProbe = 3)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val mipsSets = got.map { case (a, _, c) => (a, c) }
    val recall = (ivf & mipsSets).size.toDouble / mipsSets.size
    assert(recall >= 0.9, s"IVF-over-augmented MIPS recall@5 = $recall")
  }
}
