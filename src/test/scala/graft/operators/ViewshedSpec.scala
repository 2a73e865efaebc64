package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

/** Viewshed: distributed window-gather kernel vs a single-array
  * driver-global oracle, plus closed-form geometry cases. */
class ViewshedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Driver-global R3 (same rule, whole grid as one array). */
  private def globalViewshed(ref: GridRef, f: (Int, Int) => Double,
      or: Int, oc: Int, radius: Int, eyeH: Double): Map[(Int, Int), Boolean] = {
    val z0 = f(or, oc) + eyeH
    require(!f(or, oc).isNaN)
    val out = scala.collection.mutable.Map[(Int, Int), Boolean]()
    for (dr <- -radius to radius; dc <- -radius to radius
         if (dr != 0 || dc != 0) && dr * dr + dc * dc <= radius * radius) {
      val tr = or + dr; val tc = oc + dc
      if (tr >= 0 && tr < ref.nrows && tc >= 0 && tc < ref.ncols) {
        val zt = f(tr, tc)
        if (!zt.isNaN) {
          val n = math.max(math.abs(dr), math.abs(dc))
          val nD = n.toDouble
          val dT = math.sqrt((dr * dr + dc * dc).toDouble)
          var blocked = false
          var k = 1
          while (k < n && !blocked) {
            val pr = math.floor(or + (k * dr) / nD + 0.5).toInt
            val pc = math.floor(oc + (k * dc) / nD + 0.5).toInt
            if ((pr != or || pc != oc) && (pr != tr || pc != tc)) {
              val zp = f(pr, pc)
              if (!zp.isNaN) {
                val dP = math.sqrt(((pr - or) * (pr - or) +
                  (pc - oc) * (pc - oc)).toDouble)
                if ((zp - z0) * dT >= (zt - z0) * dP) blocked = true
              }
            }
            k += 1
          }
          out((tr, tc)) = !blocked
        }
      }
    }
    out.toMap
  }

  test("distributed viewshed == driver-global at two tile sizes") {
    val ref = Synth.demRef
    val obs = Seq(Viewshed.Observer(0, 60, 40), Viewshed.Observer(1, 150, 100))
    val want = obs.map(o =>
      o.oid -> globalViewshed(ref, Synth.demValue, o.row, o.col, 24, 10.0)).toMap
    for (res <- Seq(6, 4)) {
      val tiles = TileOps.tileGrid(spark, ref, res)(Synth.demValue)
      val got = Viewshed(tiles, ref, res, obs, radius = 24, eyeH = 10.0)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1).toInt, r.getLong(2).toInt)) ->
          r.getBoolean(3)).toMap
      val wantFlat = for ((oid, m) <- want; (rc, v) <- m) yield (oid, rc) -> v
      assert(got.size == wantFlat.size, s"res=$res size")
      assert(got == wantFlat, s"res=$res values")
    }
    // the fixture must exercise both outcomes
    assert(want.values.flatMap(_.values).toSet == Set(true, false))
  }

  test("flat plane: everything visible; a ridge wall blocks the far side") {
    val ref = GridRef(48, 48, 0.0, 0.0, 1.0)
    val flat = TileOps.tileGrid(spark, ref, 5)((_, _) => 5.0)
    val vsFlat = Viewshed(flat, ref, 5, Seq(Viewshed.Observer(0, 24, 24)),
        radius = 12, eyeH = 2.0).collect()
    assert(vsFlat.nonEmpty && vsFlat.forall(_.getBoolean(3)), "flat not all visible")
    // wall: a high column at c = 30 between observer (24,24) and the east
    def walled(r: Int, c: Int): Double = if (c == 30) 100.0 else 5.0
    val wall = TileOps.tileGrid(spark, ref, 5)(walled)
    val vsWall = Viewshed(wall, ref, 5, Seq(Viewshed.Observer(0, 24, 24)),
        radius = 12, eyeH = 2.0).collect()
      .map(r => (r.getLong(1).toInt, r.getLong(2).toInt) -> r.getBoolean(3)).toMap
    assert(vsWall((24, 30)), "wall cell itself faces the observer")
    for (c <- 31 to 36) assert(!vsWall((24, c)), s"(24,$c) behind the wall")
    assert(vsWall((24, 20)), "open west side visible")
  }
}
