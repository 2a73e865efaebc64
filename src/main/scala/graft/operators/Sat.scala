package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.{CellId, GridRef, Tile}

/** Distributed SUMMED-AREA TABLE (integral image) over a tiled raster, and
  * the O(1)-per-query arbitrary-radius box statistics it enables.
  *
  * The reference computes focal statistics with per-window loops
  * (`spatial_analysis.py` neighbourhood kernels); the engine's r43/r44
  * focal family already covers fixed small windows with separable /
  * monotone-deque passes whose cost grows with the window side. The SAT is
  * the complementary scale tool: ONE global 2-D prefix sum, after which a
  * box sum of ANY radius — 3 px or 3,000 px — is four lookups, so
  * multi-scale terrain/image statistics (e.g. topographic position index
  * at 10 radii) reuse a single pass over the data.
  *
  * Scale shape (the 100 TB story): the payloads never shuffle. Stage 1
  * computes per-tile MARGINALS (column totals, row totals, tile total —
  * O(tile side) vectors, ~1/256 of the payload bytes); stages 2-4 are
  * three narrow grouped exclusive prefix scans of those marginals (one
  * per tile-column, one per tile-row, two scalar passes for the corner
  * blocks — group size = tiles per row/column ~ sqrt(#tiles), a few MB
  * even at continental grids); stage 5 is one equi-join back on the tile
  * key where each tile assembles its global offsets locally. NaN cells
  * contribute 0 — pair with an indicator-tile SAT (same function over
  * 0/1 payloads) for NaN-ignoring counts, mirroring r43's (n, sum)
  * semantics at any radius.
  *
  * Exactness: integer-valued payloads stay exact while the global total
  * is below 2^53 (Double's integer range); the r61 gate and SatSpec run
  * in that regime.
  */
object Sat {

  /** SAT tiles: output tile cell (r, c) holds S(r, c) = sum of v over all
    * grid cells (r' <= r, c' <= c), NaN counted as 0. Same tiling as the
    * input. */
  def satTiles(tiles: Dataset[Tile]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    // stage 1 (narrow): per-tile marginals
    val marg = tiles.map { t =>
      val colT = new Array[Double](t.w)
      val rowT = new Array[Double](t.h)
      var r = 0
      while (r < t.h) {
        var c = 0
        var rs = 0.0
        while (c < t.w) {
          val v = t.payload(r * t.w + c)
          if (!v.isNaN) { colT(c) += v; rs += v }
          c += 1
        }
        rowT(r) = rs
        r += 1
      }
      (t.cellId, t.row0, t.col0, colT, rowT)
    }

    // stage 2: per tile-column (same col0) exclusive running vector sum
    // over row0 order -> per-column totals of everything ABOVE the tile
    val top = marg.groupByKey(_._3).flatMapGroups { (_, it) =>
      val ts = it.toArray.sortBy(_._2)
      val acc = new Array[Double](ts(0)._4.length)
      ts.iterator.map { t =>
        val out = java.util.Arrays.copyOf(acc, acc.length)
        var i = 0
        while (i < t._4.length) { acc(i) += t._4(i); i += 1 }
        (t._1, out)
      }
    }.toDF("cellId", "topVec")

    // stage 3: per tile-row exclusive prefix of row totals -> per-row
    // totals of everything LEFT of the tile
    val left = marg.groupByKey(_._2).flatMapGroups { (_, it) =>
      val ts = it.toArray.sortBy(_._3)
      val acc = new Array[Double](ts(0)._5.length)
      ts.iterator.map { t =>
        val out = java.util.Arrays.copyOf(acc, acc.length)
        var i = 0
        while (i < t._5.length) { acc(i) += t._5(i); i += 1 }
        (t._1, out)
      }
    }.toDF("cellId", "leftVec")

    // stage 4: above-left corner block totals — two scalar exclusive
    // prefixes over the per-tile totals (one Double per tile ever moves)
    val totals = marg.map(t => (t._1, t._2, t._3, t._4.sum))
    val aboveTot = totals.groupByKey(_._3).flatMapGroups { (_, it) =>
      val ts = it.toArray.sortBy(_._2)
      var acc = 0.0
      ts.iterator.map { t => val out = acc; acc += t._4; (t._1, t._2, t._3, out) }
    }
    val corner = aboveTot.groupByKey(_._2).flatMapGroups { (_, it) =>
      val ts = it.toArray.sortBy(_._3)
      var acc = 0.0
      ts.iterator.map { t => val out = acc; acc += t._4; (t._1, out) }
    }.toDF("cellId", "corner")

    // stage 5: one equi-join home; each tile assembles local SAT + global
    // offsets in a tight loop
    tiles.toDF()
      .join(top, "cellId").join(left, "cellId").join(corner, "cellId")
      .as[(Long, Int, Int, Int, Int, Array[Double], Array[Double],
        Array[Double], Double)]
      .map { case (cid, row0, col0, h, w, pl, topV, leftV, cornerTot) =>
        val out = new Array[Double](h * w)
        val cumTop = new Array[Double](w)
        var s = 0.0
        var c = 0
        while (c < w) { s += topV(c); cumTop(c) = s; c += 1 }
        val cumLeft = new Array[Double](h)
        s = 0.0
        var r = 0
        while (r < h) { s += leftV(r); cumLeft(r) = s; r += 1 }
        r = 0
        while (r < h) {
          var rowRun = 0.0
          c = 0
          while (c < w) {
            val v = pl(r * w + c)
            rowRun += (if (v.isNaN) 0.0 else v)
            out(r * w + c) = rowRun +
              (if (r == 0) 0.0 else out((r - 1) * w + c))
            c += 1
          }
          r += 1
        }
        r = 0
        while (r < h) {
          c = 0
          while (c < w) {
            out(r * w + c) += cumTop(c) + cumLeft(r) + cornerTot
            c += 1
          }
          r += 1
        }
        Tile(cid, row0, col0, h, w, out)
      }
  }

  /** Box SUM of radius `k` around each query point (window clamped to the
    * grid), O(1) SAT lookups per query regardless of k: each point
    * explodes into its <= 4 signed clamped corners keyed by OWNING tile
    * id, one equi-join against the SAT tiles, and a sum of the signed
    * corner values. `pts` carries (qr, qc); returns
    * (qr, qc, box_n, box_sum) with box_n the clamped window cell count. */
  def boxSumAt(sat: Dataset[Tile], ref: GridRef, res: Int, pts: DataFrame,
      k: Int): DataFrame =
    boxSumAtRadii(sat, ref, res, pts, Seq(k)).drop("k")

  /** Multi-radius form: ONE probe explode + ONE SAT join + ONE rollup
    * serve every radius in `ks` (a per-radius call pays the whole probe
    * pipeline once per radius — the multi-scale consumers like r62's
    * two-scale TPI ask for several radii over the same points). Returns
    * (qr, qc, k, box_n, box_sum). */
  def boxSumAtRadii(sat: Dataset[Tile], ref: GridRef, res: Int,
      pts: DataFrame, ks: Seq[Int]): DataFrame = {
    val spark = sat.sparkSession
    import spark.implicits._
    require(ks.nonEmpty && ks.forall(_ >= 0),
      s"boxSumAtRadii: radii must be >= 0, got $ks")
    val nrows = ref.nrows
    val ncols = ref.ncols
    val kArr = ks.toArray
    val probes = pts.select(col("qr").cast("int"), col("qc").cast("int"))
      .as[(Int, Int)]
      .flatMap { case (qr, qc) =>
        kArr.iterator.flatMap { k =>
          val r1 = math.max(0, qr - k); val r2 = math.min(nrows - 1, qr + k)
          val c1 = math.max(0, qc - k); val c2 = math.min(ncols - 1, qc + k)
          val n = (r2 - r1 + 1).toLong * (c2 - c1 + 1)
          Seq((r2, c2, 1), (r1 - 1, c2, -1), (r2, c1 - 1, -1),
            (r1 - 1, c1 - 1, 1))
            .filter { case (r, c, _) => r >= 0 && c >= 0 }
            .map { case (r, c, sgn) =>
              (CellId.ofPixel(r.toLong, c.toLong, res), k, qr, qc, r, c, sgn, n)
            }
        }
      }.toDF("cellId", "k", "qr", "qc", "r", "c", "sgn", "box_n")
    // corner extraction stays COLUMNAR: element_at reads the one SAT
    // value per probe row inside whole-stage codegen. The former typed
    // .as[...].map deserialized the tile's full payload array into a JVM
    // Array[Double] for EVERY probe row (dense probe sets like r62's
    // per-cell TPI put thousands of probes on each tile — payload x
    // probes bytes copied just to read one double each); the SAT side
    // stays a broadcast hash join either way, so no new exchange.
    probes.join(sat.toDF(), "cellId")
      .select($"qr", $"qc", $"k", $"box_n",
        ($"sgn" * element_at($"payload",
          ($"r" - $"row0") * $"w" + ($"c" - $"col0") + 1)).as("contrib"))
      .groupBy($"qr", $"qc", $"k")
      .agg(max($"box_n").as("box_n"), sum($"contrib").as("box_sum"))
  }
}
