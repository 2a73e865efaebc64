package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GridRef

/** Fixture functions live OUTSIDE the suite: tileGrid closures must not
  * capture the (non-serializable) ScalaTest engine. */
object SatSpecFns extends Serializable {
  def v(r: Int, c: Int): Double =
    if ((r * 13 + c * 7) % 11 == 0) Double.NaN
    else ((r * 5 + c * 3) % 17).toDouble
  def ind(r: Int, c: Int): Double = if (v(r, c).isNaN) 0.0 else 1.0
}

class SatSpec extends AnyFunSuite {
  import SatSpecFns.{v, ind}

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // odd dims at res 4 (16-px tiles) force ragged edge tiles in both axes
  private val ref = GridRef(ncols = 53, nrows = 37, xll = 0, yll = 0,
    cellsize = 1, nodata = -9999)

  private def bruteSat(): Array[Array[Double]] = {
    val s = Array.ofDim[Double](ref.nrows, ref.ncols)
    for (r <- 0 until ref.nrows; c <- 0 until ref.ncols) {
      val x = v(r, c)
      s(r)(c) = (if (x.isNaN) 0.0 else x) +
        (if (r > 0) s(r - 1)(c) else 0.0) +
        (if (c > 0) s(r)(c - 1) else 0.0) -
        (if (r > 0 && c > 0) s(r - 1)(c - 1) else 0.0)
    }
    s
  }

  test("satTiles == brute 2-D prefix (ragged edge tiles, NaN as 0)") {
    val tiles = TileOps.tileGrid(spark, ref, 4)(SatSpecFns.v)
    val sat = Sat.satTiles(tiles).collect()
    val want = bruteSat()
    assert(sat.map(_.payload.length).sum == ref.nrows * ref.ncols)
    sat.foreach { t =>
      for (r <- 0 until t.h; c <- 0 until t.w) {
        val got = t.payload(r * t.w + c)
        val exp = want(t.row0 + r)(t.col0 + c)
        assert(got == exp,
          s"SAT mismatch at (${t.row0 + r}, ${t.col0 + c}): $got != $exp")
      }
    }
  }

  test("boxSumAt: arbitrary radius, clamped windows, == brute window sums") {
    import spark.implicits._
    val tiles = TileOps.tileGrid(spark, ref, 4)(SatSpecFns.v)
    val sat = Sat.satTiles(tiles)
    val pts = Seq((0, 0), (0, 52), (36, 0), (36, 52), (18, 26), (5, 40))
    val ptsDf = spark.createDataset(pts).toDF("qr", "qc")
    for (k <- Seq(0, 3, 19)) {
      val got = Sat.boxSumAt(sat, ref, 4, ptsDf, k).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      pts.foreach { case (qr, qc) =>
        val r1 = math.max(0, qr - k); val r2 = math.min(ref.nrows - 1, qr + k)
        val c1 = math.max(0, qc - k); val c2 = math.min(ref.ncols - 1, qc + k)
        var s = 0.0
        for (r <- r1 to r2; c <- c1 to c2) {
          val x = v(r, c); if (!x.isNaN) s += x
        }
        val (n, bs) = got((qr, qc))
        assert(n == (r2 - r1 + 1).toLong * (c2 - c1 + 1))
        assert(bs == s, s"box sum at ($qr, $qc) k=$k: $bs != $s")
      }
    }
  }

  test("NaN-ignoring box MEAN at any radius via value-SAT / indicator-SAT pair") {
    import spark.implicits._
    val valueSat = Sat.satTiles(TileOps.tileGrid(spark, ref, 4)(SatSpecFns.v))
    val indSat = Sat.satTiles(TileOps.tileGrid(spark, ref, 4)(SatSpecFns.ind))
    val pts = spark.createDataset(Seq((18, 26), (0, 0))).toDF("qr", "qc")
    val k = 7
    val sums = Sat.boxSumAt(valueSat, ref, 4, pts, k).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val counts = Sat.boxSumAt(indSat, ref, 4, pts, k).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    Seq((18, 26), (0, 0)).foreach { case (qr, qc) =>
      val r1 = math.max(0, qr - k); val r2 = math.min(ref.nrows - 1, qr + k)
      val c1 = math.max(0, qc - k); val c2 = math.min(ref.ncols - 1, qc + k)
      var s = 0.0; var n = 0L
      for (r <- r1 to r2; c <- c1 to c2) {
        val x = v(r, c); if (!x.isNaN) { s += x; n += 1 }
      }
      assert(counts((qr, qc)) == n.toDouble)
      assert(sums((qr, qc)) / counts((qr, qc)) == s / n)
    }
  }
}
