package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** KDE: broadcast-scatter quartic density vs a brute driver double loop,
  * including boundary clipping and multi-point overlap sums. */
class DensitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("quartic == brute double loop on random points (boundary clipping exact)") {
    val rnd = new scala.util.Random(83)
    val s = spark
    import s.implicits._
    for (trial <- 0 until 3) {
      val nrows = 20 + rnd.nextInt(30)
      val ncols = 20 + rnd.nextInt(30)
      val radius = 2 + rnd.nextInt(5)
      val r2 = radius.toLong * radius
      val pts = (0 until 25)
        .map(_ => (rnd.nextInt(nrows), rnd.nextInt(ncols))).distinct
      val got = Density.quartic(pts.toDF("row", "col"), nrows, ncols, radius)
        .collect().map(x => (x.getLong(0), x.getLong(1)) ->
          (x.getLong(2), x.getLong(3))).toMap
      val want = (for {
        r <- 0 until nrows; c <- 0 until ncols
        hits = pts.map { case (pr, pc) =>
          (pr - r).toLong * (pr - r) + (pc - c).toLong * (pc - c)
        }.filter(_ <= r2)
        if hits.nonEmpty
      } yield (r.toLong, c.toLong) ->
        (hits.size.toLong, hits.map(d2 => (r2 - d2) * (r2 - d2)).sum)).toMap
      assert(got == want, s"trial $trial ${nrows}x$ncols radius=$radius")
    }
  }

  test("a single point yields the full disk with peak R^4 at the point") {
    val s = spark
    import s.implicits._
    val got = Density.quartic(Seq((10, 10)).toDF("row", "col"), 21, 21, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(got((10L, 10L)) == 81L) // (9 - 0)^2
    assert(got.size == (for {
      dr <- -3 to 3; dc <- -3 to 3 if dr * dr + dc * dc <= 9
    } yield 1).size)
    assert(!got.contains((14L, 10L))) // d2 = 16 > 9
  }

  test("radius must be >= 1") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](
      Density.quartic(Seq((0, 0)).toDF("row", "col"), 1, 1, 0))
  }
}
