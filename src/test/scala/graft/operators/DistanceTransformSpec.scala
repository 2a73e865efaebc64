package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** EDT: the Long-exact 1-D envelope vs brute, and the distributed
  * two-pass vs a brute driver oracle on random sparse sources. */
class DistanceTransformSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dt1d == brute (p-q)^2 + f(q) min, incl. INF^2 plateaus") {
    val rnd = new scala.util.Random(3)
    val INF2 = (1L << 20) * (1L << 20)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(120)
      val f = Array.fill(n)(
        if (rnd.nextBoolean()) INF2 else rnd.nextInt(1 << 16).toLong)
      val got = DistanceTransform.dt1d(f)
      for (p <- 0 until n) {
        val want = (0 until n).map(q => (p - q).toLong * (p - q) + f(q)).min
        assert(got(p) == want, s"trial $trial p=$p n=$n")
      }
    }
  }

  test("distributed two-pass == brute nearest-source over random grids") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      val (nr, nc) = (40 + rnd.nextInt(60), 40 + rnd.nextInt(60))
      val srcs = (0 until 15 + rnd.nextInt(40))
        .map(_ => (rnd.nextInt(nr).toLong, rnd.nextInt(nc).toLong)).distinct
      val got = DistanceTransform.squared(
          srcs.toDF("row", "col"), nr, nc)
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1.toInt, t._2.toInt) -> t._3).toMap
      assert(got.size == nr * nc, s"trial $trial size")
      for (r <- 0 until nr; c <- 0 until nc) {
        val want = srcs.map { case (sr, sc) =>
          (r - sr) * (r - sr) + (c - sc) * (c - sc)
        }.min
        assert(got((r, c)) == want, s"trial $trial ($r,$c)")
      }
    }
  }
}
