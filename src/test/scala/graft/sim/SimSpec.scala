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
}
