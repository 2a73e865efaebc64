package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Focal window: separable two-pass vs brute O(k^2) driver oracle on
  * random sparse grids, plus partition invariance (exact Long sums are
  * order-free, so the result must not depend on the physical plan). */
class FocalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(vals: Seq[(Int, Int, Long)], nrows: Int, ncols: Int,
      k: Int): Map[(Long, Long), (Long, Long)] = {
    val m = vals.map { case (r, c, q) => (r, c) -> q }.toMap
    (for {
      r <- 0 until nrows; c <- 0 until ncols
      cells = for {
        i <- math.max(0, r - k) to math.min(nrows - 1, r + k)
        j <- math.max(0, c - k) to math.min(ncols - 1, c + k)
        q <- m.get((i, j))
      } yield q
      if cells.nonEmpty
    } yield (r.toLong, c.toLong) -> (cells.size.toLong, cells.sum)).toMap
  }

  test("window == brute on random sparse grids, k in 1..4") {
    val rnd = new scala.util.Random(11)
    val s = spark
    import s.implicits._
    for (trial <- 0 until 6) {
      val nrows = 5 + rnd.nextInt(30)
      val ncols = 5 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(4)
      val vals = (for {
        r <- 0 until nrows; c <- 0 until ncols
        if rnd.nextDouble() < 0.6 // 40% holes
      } yield (r, c, rnd.nextInt(1 << 16).toLong)).toSeq
      val df = vals.toDF("row", "col", "q")
      val got = Focal.window(df, nrows, ncols, k)
        .collect().map(x => (x.getLong(0), x.getLong(1)) ->
          (x.getLong(2), x.getLong(3))).toMap
      val want = brute(vals, nrows, ncols, k)
      assert(got == want, s"trial $trial ${nrows}x$ncols k=$k")
    }
  }

  test("partition-invariant: repartition(1) == repartition(7)") {
    val rnd = new scala.util.Random(23)
    val s = spark
    import s.implicits._
    val vals = (for {
      r <- 0 until 40; c <- 0 until 25
      if rnd.nextDouble() < 0.8
    } yield (r, c, rnd.nextInt(1 << 20).toLong)).toSeq.toDF("row", "col", "q")
    def run(p: Int) = Focal.window(vals.repartition(p), 40, 25, k = 3)
      .orderBy("row", "col").collect().toSeq
    assert(run(1) == run(7))
  }

  test("slideMin == brute clipped-window min incl. sentinel gaps") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(6)
      val a = Array.fill(n)(rnd.nextLong(1L << 40) - (1L << 39))
      val m = Array.fill(n)(rnd.nextDouble() < 0.7)
      val got = Focal.slideMin(a, m, k)
      for (c <- 0 until n) {
        val win = (math.max(0, c - k) to math.min(n - 1, c + k))
          .filter(m).map(a)
        val want = if (win.isEmpty) Long.MaxValue else win.min
        assert(got(c) == want, s"trial $trial c=$c n=$n k=$k")
      }
    }
  }

  test("extrema == brute min/max on random sparse grids, k in 1..4") {
    val rnd = new scala.util.Random(57)
    val s = spark
    import s.implicits._
    for (trial <- 0 until 5) {
      val nrows = 5 + rnd.nextInt(25)
      val ncols = 5 + rnd.nextInt(25)
      val k = 1 + rnd.nextInt(4)
      val vals = (for {
        r <- 0 until nrows; c <- 0 until ncols
        if rnd.nextDouble() < 0.55
      } yield (r, c, rnd.nextLong(1L << 30) - (1L << 29))).toSeq
      val df = vals.toDF("row", "col", "q")
      val got = Focal.extrema(df, nrows, ncols, k)
        .collect().map(x => (x.getLong(0), x.getLong(1)) ->
          (x.getLong(2), x.getLong(3))).toMap
      val m = vals.map { case (r, c, q) => (r, c) -> q }.toMap
      val want = (for {
        r <- 0 until nrows; c <- 0 until ncols
        cells = for {
          i <- math.max(0, r - k) to math.min(nrows - 1, r + k)
          j <- math.max(0, c - k) to math.min(ncols - 1, c + k)
          q <- m.get((i, j))
        } yield q
        if cells.nonEmpty
      } yield (r.toLong, c.toLong) -> (cells.min, cells.max)).toMap
      assert(got == want, s"trial $trial ${nrows}x$ncols k=$k")
    }
  }

  test("median == brute sorted-window middle on random sparse grids") {
    val rnd = new scala.util.Random(73)
    val s = spark
    import s.implicits._
    for (trial <- 0 until 5) {
      val nrows = 5 + rnd.nextInt(25)
      val ncols = 5 + rnd.nextInt(25)
      val k = 1 + rnd.nextInt(3)
      val vals = (for {
        r <- 0 until nrows; c <- 0 until ncols
        if rnd.nextDouble() < 0.6
      } yield (r, c, rnd.nextInt(1 << 16).toLong)).toSeq
      val df = vals.toDF("row", "col", "q")
      val got = Focal.median(df, nrows, ncols, k)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
      val m = vals.map { case (r, c, q) => (r, c) -> q }.toMap
      val want = (for {
        r <- 0 until nrows; c <- 0 until ncols
        cells = (for {
          i <- math.max(0, r - k) to math.min(nrows - 1, r + k)
          j <- math.max(0, c - k) to math.min(ncols - 1, c + k)
          q <- m.get((i, j))
        } yield q).sorted
        if cells.nonEmpty
      } yield (r.toLong, c.toLong) -> (
        if (cells.size % 2 == 1) cells(cells.size / 2).toDouble
        else (cells(cells.size / 2 - 1) + cells(cells.size / 2)) / 2.0)).toMap
      assert(got == want, s"trial $trial ${nrows}x$ncols k=$k")
    }
  }

  test("pyramid: incremental levels == direct block aggregation of the base") {
    val rnd = new scala.util.Random(91)
    val s = spark
    import s.implicits._
    val vals = (for {
      r <- 0 until 37; c <- 0 until 29 // odd dims exercise ragged edges
      if rnd.nextDouble() < 0.7
    } yield (r, c, rnd.nextInt(1 << 20).toLong)).toSeq
    val got = Pyramid.build(vals.toDF("row", "col", "q"), levels = 3)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
        (x.getLong(3), x.getLong(4))).toMap
    val want = (for {
      l <- 1 to 3
      ((br, bc), cells) <- vals.groupBy { case (r, c, _) => (r >> l, c >> l) }
    } yield (l.toLong, br.toLong, bc.toLong) ->
      (cells.size.toLong, cells.map(_._3).sum)).toMap
    assert(got == want)
    assert(got.keys.count(_._1 == 3L) > 0)
  }

  test("extrema and median are total at the Long extremes (no negation/add overflow)") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 0, Long.MinValue), (0, 1, 5L), (0, 2, Long.MaxValue))
      .toDF("row", "col", "q")
    val ext = Focal.extrema(df, 1, 3, k = 1)
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3))).toMap
    assert(ext(0L) == (Long.MinValue, 5L))
    assert(ext(1L) == (Long.MinValue, Long.MaxValue))
    assert(ext(2L) == (5L, Long.MaxValue))
    val big = Long.MaxValue - 1 // even; (big + big) overflows a Long add
    val med = Focal.median(
        Seq((0, 0, big), (0, 1, big)).toDF("row", "col", "q"), 1, 2, k = 1)
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(med(0L) == big.toDouble && med(0L) > 0)
    assert(med(1L) == big.toDouble)
  }

  test("majority == brute mode with smallest-class tie-break") {
    val rnd = new scala.util.Random(103)
    val s = spark
    import s.implicits._
    for (trial <- 0 until 5) {
      val nrows = 5 + rnd.nextInt(25)
      val ncols = 5 + rnd.nextInt(25)
      val k = 1 + rnd.nextInt(3)
      val nCls = 2 + rnd.nextInt(4) // few classes -> frequent ties
      val vals = (for {
        r <- 0 until nrows; c <- 0 until ncols
        if rnd.nextDouble() < 0.7
      } yield (r, c, rnd.nextInt(nCls))).toSeq
      val got = Focal.majority(vals.toDF("row", "col", "cls"),
          nrows, ncols, k, nCls)
        .collect().map(x => (x.getLong(0), x.getLong(1)) ->
          (x.getLong(2), x.getLong(3))).toMap
      val m = vals.map { case (r, c, g) => (r, c) -> g }.toMap
      val want = (for {
        r <- 0 until nrows; c <- 0 until ncols
        cells = for {
          i <- math.max(0, r - k) to math.min(nrows - 1, r + k)
          j <- math.max(0, c - k) to math.min(ncols - 1, c + k)
          g <- m.get((i, j))
        } yield g
        if cells.nonEmpty
      } yield {
        val counts = cells.groupBy(identity).map { case (g, xs) => g -> xs.size }
        val best = counts.toSeq.minBy { case (g, cnt) => (-cnt, g) }
        (r.toLong, c.toLong) -> (best._1.toLong, best._2.toLong)
      }).toMap
      assert(got == want, s"trial $trial ${nrows}x$ncols k=$k nCls=$nCls")
    }
  }

  test("focal scale smoke: 2048x2048 (4.2M cells), closed-form aggregate gate") {
    val s = spark
    import s.implicits._
    val n = 2048
    val k = 5
    val c = 7L
    // constant grid: n(r, c) = rowspan(r) * colspan(c), so the totals have
    // closed forms — sum(n) = (sum rowspan)^2 and sum(sum_q) = c * sum(n)
    val vals = s.range(n.toLong * n)
      .select(($"id" / n).cast("long").as("row"), ($"id" % n).cast("long").as("col"),
        lit(c).as("q"))
    val agg = Focal.window(vals, n, n, k)
      .agg(count(lit(1)), sum($"n"), sum($"sum_q")).head()
    val span = (0 until n).map(i =>
      (math.min(n - 1, i + k) - math.max(0, i - k) + 1).toLong).sum
    assert(agg.getLong(0) == n.toLong * n)
    assert(agg.getLong(1) == span * span)
    assert(agg.getLong(2) == c * span * span)
  }

  test("k must be >= 1") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 0, 1L)).toDF("row", "col", "q")
    intercept[IllegalArgumentException](Focal.window(df, 1, 1, 0))
  }
}
