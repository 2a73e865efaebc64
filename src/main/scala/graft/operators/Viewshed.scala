package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core._

/** Bounded-radius viewshed (line-of-sight visibility) over the DEM — a
  * beyond-reference terrain operator in hydro-raster's own domain (its
  * flood users run viewshed for gauge/antenna siting next to the flow
  * suite).
  *
  * Semantics (textbook R3 with integer-DDA sampling): target cell t at
  * Euclidean cell distance d_t <= radius from observer o (eye height
  * `eyeH` above terrain) is VISIBLE iff for every intermediate sample
  * p_k — k = 1 .. n-1, n = Chebyshev distance, sample cell =
  * floor(o + k*Δ/n + 0.5) per axis, skipping samples that round onto o
  * or t — with valid terrain:
  *
  *   (z_p - z_0) * d_t < (z_t - z_0) * d_p      (z_0 = z_o + eyeH)
  *
  * i.e. the cross-multiplied slope test (ties block). NaN intermediate
  * cells are transparent; NaN observers/targets emit nothing. Every step
  * is integer arithmetic, one double division, sqrt and multiplies — all
  * correctly-rounded IEEE ops in a fixed order, so a SQL oracle spelling
  * the identical expressions is bit-exact (r41).
  *
  * Scale shape: observers explode to their window's cell cover
  * (driver-side O(observers x window/tile_area) DESCRIPTORS, never
  * pixels), tiles join the cover on cellId — ONE descriptor-keyed
  * shuffle of the overlapping window payloads — and each observer's
  * window assembles executor-side for the O(R^2 x R) LOS kernel.
  * Observer count scales out linearly; dense-observer sweeps (every
  * cell an observer) would want the shared-tile XDraw family instead —
  * documented, out of scope. */
object Viewshed {

  final case class Observer(oid: Long, row: Int, col: Int)

  def apply(tiles: Dataset[Tile], ref: GridRef, res: Int,
      observers: Seq[Observer], radius: Int, eyeH: Double): DataFrame = {
    import tiles.sparkSession.implicits._
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val (nrows, ncols) = (ref.nrows, ref.ncols)
    val obsMap = observers.map(o => o.oid -> ((o.row, o.col))).toMap
    // window cover descriptors: (cellId, oid)
    val cover = observers.flatMap { o =>
      val r0 = math.max(0, o.row - radius).toLong
      val r1 = math.min(nrows - 1, o.row + radius).toLong
      val c0 = math.max(0, o.col - radius).toLong
      val c1 = math.min(ncols - 1, o.col + radius).toLong
      CellId.coverWindow(r0, r1, c0, c1, res).map(cid => (cid, o.oid))
    }
    val coverDs = cover.toDS().withColumnRenamed("_1", "cid")
      .withColumnRenamed("_2", "oid").as[(Long, Long)]
    val R = radius
    tiles.joinWith(coverDs, tiles("cellId") === coverDs("cid"))
      .groupByKey(_._2._2)
      .flatMapGroups { (oid, it) =>
        val (or, oc) = obsMap(oid)
        val side = 2 * R + 1
        val win = Array.fill(side * side)(Double.NaN) // window[r - or + R][c - oc + R]
        it.foreach { case (t, _) =>
          var r = math.max(t.row0, or - R)
          val rEnd = math.min(t.row0 + t.h - 1, or + R)
          while (r <= rEnd) {
            var c = math.max(t.col0, oc - R)
            val cEnd = math.min(t.col0 + t.w - 1, oc + R)
            while (c <= cEnd) {
              win((r - or + R) * side + (c - oc + R)) =
                t.payload((r - t.row0) * t.w + (c - t.col0))
              c += 1
            }
            r += 1
          }
        }
        val z0 = win(R * side + R) + eyeH
        if (win(R * side + R).isNaN) Iterator.empty
        else {
          val out = Array.newBuilder[(Long, Long, Long, Boolean)]
          var dr = -R
          while (dr <= R) {
            var dc = -R
            while (dc <= R) {
              val tr = or + dr; val tc = oc + dc
              if ((dr != 0 || dc != 0) && dr * dr + dc * dc <= R * R &&
                tr >= 0 && tr < nrows && tc >= 0 && tc < ncols) {
                val zt = win((dr + R) * side + (dc + R))
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
                      val zp = win((pr - or + R) * side + (pc - oc + R))
                      if (!zp.isNaN) {
                        val dP = math.sqrt(((pr - or) * (pr - or) +
                          (pc - oc) * (pc - oc)).toDouble)
                        if ((zp - z0) * dT >= (zt - z0) * dP) blocked = true
                      }
                    }
                    k += 1
                  }
                  out += ((oid, tr.toLong, tc.toLong, !blocked))
                }
              }
              dc += 1
            }
            dr += 1
          }
          out.result().iterator
        }
      }
      .toDF("oid", "row", "col", "visible")
  }
}
