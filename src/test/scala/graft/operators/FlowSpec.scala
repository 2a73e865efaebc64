package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

/** D8 flow routing: distributed halo/condensation path vs a single-array
  * driver-global oracle (same rule, no tiling) on the DEM fixture. */
class FlowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val Sqrt2 = math.sqrt(2.0)
  private val D8 = Array(
    (1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
    (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1))

  /** Driver-global D8 over the whole grid as one array: (dir, acc). */
  private def globalFlow(ref: GridRef, f: (Int, Int) => Double)
      : (Map[(Int, Int), Int], Map[(Int, Int), Long]) = {
    val nr = ref.nrows
    val nc = ref.ncols
    val z = Array.tabulate(nr * nc)(i => f(i / nc, i % nc))
    val dir = new Array[Int](nr * nc)
    for (i <- z.indices) {
      if (z(i).isNaN) dir(i) = -1
      else {
        val r = i / nc; val c = i % nc
        var best = 0; var bestDrop = 0.0
        for ((code, dr, dc) <- D8) {
          val rr = r + dr; val cc = c + dc
          if (rr >= 0 && rr < nr && cc >= 0 && cc < nc && !z(rr * nc + cc).isNaN) {
            val dist = if (dr != 0 && dc != 0) ref.cellsize * Sqrt2 else ref.cellsize
            val drop = (z(i) - z(rr * nc + cc)) / dist
            if (drop > bestDrop) { bestDrop = drop; best = code }
          }
        }
        dir(i) = best
      }
    }
    def succ(i: Int): Int = {
      if (dir(i) <= 0) -1
      else {
        val (_, dr, dc) = D8(Integer.numberOfTrailingZeros(dir(i)))
        (i / nc + dr) * nc + (i % nc + dc)
      }
    }
    val acc = new Array[Long](nr * nc)
    val indeg = new Array[Int](nr * nc)
    for (i <- z.indices if dir(i) > 0) indeg(succ(i)) += 1
    val q = scala.collection.mutable.Queue(
      z.indices.filter(i => dir(i) >= 0 && indeg(i) == 0): _*)
    var seen = 0
    while (q.nonEmpty) {
      val u = q.dequeue(); seen += 1
      acc(u) += 1
      val v = succ(u)
      if (v >= 0) {
        acc(v) += acc(u)
        indeg(v) -= 1
        if (indeg(v) == 0) q.enqueue(v)
      }
    }
    assert(seen == z.indices.count(i => dir(i) >= 0), "global flow graph cyclic")
    val dm = (for (i <- z.indices if dir(i) >= 0) yield (i / nc, i % nc) -> dir(i)).toMap
    val am = (for (i <- z.indices if dir(i) >= 0) yield (i / nc, i % nc) -> acc(i)).toMap
    (dm, am)
  }

  test("flowDir distributed == driver-global on the DEM fixture") {
    val tiles = TileOps.tileGrid(spark, Synth.demRef, 6)(Synth.demValue)
    val got = Flow.flowDir(tiles, Synth.demRef, 6).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getInt(2)).toMap
    val (want, _) = globalFlow(Synth.demRef, Synth.demValue)
    assert(got.size == want.size)
    assert(got == want)
    // fixture exercises all the interesting shapes
    assert(got.values.exists(_ == 0), "no pits in fixture")
    assert(got.values.toSet.intersect(Set(2, 8, 32, 128)).nonEmpty, "no diagonal flow")
  }

  test("flowAcc distributed (tile condensation) == driver-global; seams carry flow") {
    val (dirG, want) = globalFlow(Synth.demRef, Synth.demValue)
    for (res <- Seq(6, 4)) { // 64x64 and 16x16 tiles: different seam sets
      val tiles = TileOps.tileGrid(spark, Synth.demRef, res)(Synth.demValue)
      val got = Flow.flowAcc(tiles, Synth.demRef, res).collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
      assert(got.size == want.size, s"res=$res size")
      assert(got == want, s"res=$res values")
      // cross-tile propagation is load-bearing: some path is longer than a tile
      assert(want.values.max > (1 << res), s"res=$res fixture has no cross-tile path")
    }
    assert(dirG.nonEmpty)
  }

  test("flowAcc conservation: accumulation at pits sums to the valid cell count") {
    val tiles = TileOps.tileGrid(spark, Synth.gridARef, 5)(Synth.gridAValue)
    val rows = Flow.flowAcc(tiles, Synth.gridARef, 5).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
    val (dirG, accG) = globalFlow(Synth.gridARef, Synth.gridAValue)
    assert(rows == accG)
    // every cell's unit of water ends at exactly one pit
    val pitSum = dirG.collect { case (rc, 0) => rows(rc) }.sum
    assert(pitSum == rows.size.toLong, s"pit mass $pitSum != ${rows.size}")
  }
}
