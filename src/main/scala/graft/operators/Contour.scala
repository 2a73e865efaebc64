package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core._

/** Contour-line extraction (marching squares) — beyond-reference addition
  * in the reference's own rendering domain (`grid_show.py` plots shaded
  * relief; iso-lines are the natural companion its users ask for).
  *
  * Semantics (textbook marching squares over the CELL-CENTER lattice):
  * each 2x2 block of adjacent centers TL=(r,c), TR=(r,c+1), BL=(r+1,c),
  * BR=(r+1,c+1) contributes 0-2 straight segments of the `level`
  * iso-line; a corner is "inside" iff `z >= level`; crossings are
  * linearly interpolated along block edges, `t = (level-za)/(zb-za)`;
  * the two saddle cases disambiguate on the block-center mean. Blocks
  * touching a NaN corner emit nothing. Coordinates are PIXEL units
  * (x = col, y = row; map coords = `ref.sub2map`).
  *
  * Scale shape: blocks are owned by their TL corner's tile and the other
  * three corners come from the 1-pixel halo ([[Stencil.padded]]), so the
  * whole operator is ONE halo exchange + a per-tile loop — no seam
  * resolution pass at all (contrast [[Vectorize]], whose components are
  * global). Hash-exact cross-engine: picking `level` off the fixture's
  * dyadic value lattice (e.g. x.125 against quarter-valued z) makes
  * every interpolation a division of exact doubles with nonzero
  * denominator — bit-identical in any IEEE engine.
  *
  * Each output row is one segment with canonically ordered endpoints
  * (lexicographic min first): (x1, y1, x2, y2).
  */
object Contour {

  /** Crossing point on the edge between corners a=(xa, ya, za) and
    * b=(xb, yb, zb), one inside one outside. */
  @inline private def cross(level: Double,
      xa: Double, ya: Double, za: Double,
      xb: Double, yb: Double, zb: Double): (Double, Double) = {
    val t = (level - za) / (zb - za)
    (xa + t * (xb - xa), ya + t * (yb - ya))
  }

  /** Segment list per marching-squares case: pairs of edge ids
    * (0=top, 1=right, 2=bottom, 3=left); cases 5/10 resolved at runtime. */
  private val Cases: Array[Array[Int]] = Array(
    /* 0  */ Array(),
    /* 1  BL */ Array(3, 2),
    /* 2  BR */ Array(2, 1),
    /* 3  BL+BR */ Array(3, 1),
    /* 4  TR */ Array(0, 1),
    /* 5  saddle */ Array(),
    /* 6  TR+BR */ Array(0, 2),
    /* 7  all but TL */ Array(3, 0),
    /* 8  TL */ Array(3, 0),
    /* 9  TL+BL */ Array(0, 2),
    /* 10 saddle */ Array(),
    /* 11 all but TR */ Array(0, 1),
    /* 12 TL+TR */ Array(3, 1),
    /* 13 all but BR */ Array(2, 1),
    /* 14 all but BL */ Array(3, 2))

  /** Marching-squares segments of the `level` iso-line:
    * `(x1, y1, x2, y2)` per segment, endpoints lexicographically ordered. */
  def segments(tiles: Dataset[Tile], ref: GridRef, res: Int,
      level: Double): DataFrame = {
    import tiles.sparkSession.implicits._
    segmentSet(tiles, ref, res, Seq(level)).select($"x1", $"y1", $"x2", $"y2")
  }

  /** Multi-level form (contour SETS, the `mapshow` companion use case):
    * `(level, x1, y1, x2, y2)` — all levels extracted in the SAME single
    * halo pass (each 2x2 block is classified once per level in-task; the
    * shuffle cost does not grow with the level count). */
  def segmentSet(tiles: Dataset[Tile], ref: GridRef, res: Int,
      levels: Seq[Double]): DataFrame = {
    import tiles.sparkSession.implicits._
    require(levels.nonEmpty, "at least one contour level")
    val lv = levels.toArray
    Stencil.padded(tiles, ref, res).flatMap { pt =>
      val out = Array.newBuilder[(Double, Double, Double, Double, Double)]
      var r = 0
      while (r < pt.h) {
        var c = 0
        while (c < pt.w) {
          val gr = pt.row0 + r
          val gc = pt.col0 + c
          val zTL = pt.at(gr, gc)
          val zTR = pt.at(gr, gc + 1)
          val zBL = pt.at(gr + 1, gc)
          val zBR = pt.at(gr + 1, gc + 1)
          if (!zTL.isNaN && !zTR.isNaN && !zBL.isNaN && !zBR.isNaN) {
            var li = 0
            while (li < lv.length) {
            val level = lv(li)
            var code = 0
            if (zTL >= level) code |= 8
            if (zTR >= level) code |= 4
            if (zBR >= level) code |= 2
            if (zBL >= level) code |= 1
            if (code != 0 && code != 15) {
              val x = gc.toDouble
              val y = gr.toDouble
              // crossing per edge id (lazily valid only for crossing edges)
              def pointOn(edge: Int): (Double, Double) = edge match {
                case 0 => cross(level, x, y, zTL, x + 1, y, zTR) // top
                case 1 => cross(level, x + 1, y, zTR, x + 1, y + 1, zBR) // right
                case 2 => cross(level, x, y + 1, zBL, x + 1, y + 1, zBR) // bottom
                case _ => cross(level, x, y, zTL, x, y + 1, zBL) // left
              }
              val edges: Array[Int] =
                if (code == 5 || code == 10) {
                  // saddle: connect by the block-center mean (exact sum of
                  // dyadic corners / 4 — same operand order as the oracle)
                  val center = (zTL + zTR + zBR + zBL) / 4.0
                  val centerIn = center >= level
                  if (code == 5) { // TR+BL inside
                    if (centerIn) Array(3, 0, 2, 1) else Array(3, 2, 0, 1)
                  } else { // TL+BR inside
                    if (centerIn) Array(0, 1, 3, 2) else Array(3, 0, 2, 1)
                  }
                } else Cases(code)
              var k = 0
              while (k < edges.length) {
                val (ax, ay) = pointOn(edges(k))
                val (bx, by) = pointOn(edges(k + 1))
                if (ax < bx || (ax == bx && ay <= by)) out += ((level, ax, ay, bx, by))
                else out += ((level, bx, by, ax, ay))
                k += 2
              }
            }
            li += 1
            }
          }
          c += 1
        }
        r += 1
      }
      out.result().iterator
    }.toDF("level", "x1", "y1", "x2", "y2")
  }
}
