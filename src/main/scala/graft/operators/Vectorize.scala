package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core._
import scala.collection.mutable

/** Raster -> vector: connected-component labeling of equal-valued regions
  * (reference `Raster.vectorize` = rasterio.features.shapes over the
  * validity mask, Raster.py:735-778; 4-connectivity like GDAL polygonize).
  *
  * Distributed shape: per-tile local union-find labeling (one pass over the
  * payload), then a SEAM exchange — only the 1-pixel border labels of each
  * tile travel — grouped per seam to produce cross-tile label equivalences;
  * the equivalence graph (O(perimeter), tiny vs area) is resolved by a
  * driver union-find, and component stats aggregate by resolved root.
  * Exact geometry extraction is out of scope for the parity gate (the
  * reference gate is per-value region/row counts, SURVEY.md §2.9). */
object Vectorize {

  /** Per-tile labeling output: pixel counts per (localLabel, value) plus
    * border strips carrying labels for the seam join. */
  final case class TileLabels(
      cellId: Long,
      counts: Array[(Long, Double, Long)], // (globalLabel, value, nPixels)
      borders: Array[(Int, Int, Int, Long, Double)]) // (side, row, col, label, value)

  private def find(parent: mutable.LongMap[Long], x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
    var c = x
    while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
    r
  }

  /** Label one tile with 4-connectivity union-find; labels globalized as
    * cellId-hash * 2^20 + local. */
  private def labelTile(t: Tile): TileLabels = {
    val n = t.h * t.w
    val local = Array.fill(n)(-1)
    val parent = new Array[Int](n)
    var nextLabel = 0
    def findL(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nn = parent(c); parent(c) = r; c = nn }
      r
    }
    var i = 0
    while (i < n) {
      val v = t.payload(i)
      if (!v.isNaN) {
        val r = i / t.w
        val c = i % t.w
        val left = if (c > 0 && t.payload(i - 1) == v) findL(local(i - 1)) else -1
        val up = if (r > 0 && t.payload(i - t.w) == v) findL(local(i - t.w)) else -1
        val lbl =
          if (left >= 0 && up >= 0) {
            val a = math.min(left, up)
            val b = math.max(left, up)
            if (a != b) parent(b) = a
            a
          } else if (left >= 0) left
          else if (up >= 0) up
          else {
            val l = nextLabel
            parent(l) = l
            nextLabel += 1
            l
          }
        local(i) = lbl
      }
      i += 1
    }
    // resolve + globalize
    def global(l: Int): Long = (t.cellId << 20) | findL(l).toLong
    val cnt = new mutable.LongMap[(Double, Long)]()
    i = 0
    while (i < n) {
      if (local(i) >= 0) {
        val g = global(local(i))
        val v = t.payload(i)
        cnt.get(g) match {
          case Some((_, k)) => cnt(g) = (v, k + 1)
          case None => cnt(g) = (v, 1L)
        }
      }
      i += 1
    }
    val borders = Array.newBuilder[(Int, Int, Int, Long, Double)]
    var c = 0
    while (c < t.w) { // top (side 0) and bottom (side 1)
      if (local(c) >= 0)
        borders += ((0, t.row0, t.col0 + c, global(local(c)), t.payload(c)))
      val bi = (t.h - 1) * t.w + c
      if (local(bi) >= 0)
        borders += ((1, t.row0 + t.h - 1, t.col0 + c, global(local(bi)), t.payload(bi)))
      c += 1
    }
    var r = 0
    while (r < t.h) { // left (2) and right (3)
      if (local(r * t.w) >= 0)
        borders += ((2, t.row0 + r, t.col0, global(local(r * t.w)), t.payload(r * t.w)))
      val ri = r * t.w + t.w - 1
      if (local(ri) >= 0)
        borders += ((3, t.row0 + r, t.col0 + t.w - 1, global(local(ri)), t.payload(ri)))
      r += 1
    }
    TileLabels(t.cellId,
      cnt.toArray.map { case (g, (v, k)) => (g, v, k) },
      borders.result())
  }

  /** Component stats per value class: (value, n_components, n_pixels).
    * The driver-side union-find sees only seam equivalences —
    * O(total tile perimeter), not O(pixels). */
  def componentStats(tiles: Dataset[Tile], ref: GridRef, res: Int): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val labeled = tiles.map(labelTile).cache()

    // seam equivalences: adjacent border pixels with equal value
    val bordersByPixel = labeled.flatMap { tl =>
      tl.borders.iterator.map { case (_, r, c, g, v) => (r, c, g, v) }
    }
    // pair (r, c) with (r+1, c) and (r, c+1) neighbors via two self-joins
    val b = bordersByPixel.toDF("r", "c", "g", "v")
    val down = b.as("a").join(b.as("x"),
        $"a.r" + 1 === $"x.r" && $"a.c" === $"x.c" && $"a.v" === $"x.v" && $"a.g" =!= $"x.g")
      .select($"a.g".as("g1"), $"x.g".as("g2"))
    val right = b.as("a").join(b.as("x"),
        $"a.r" === $"x.r" && $"a.c" + 1 === $"x.c" && $"a.v" === $"x.v" && $"a.g" =!= $"x.g")
      .select($"a.g".as("g1"), $"x.g".as("g2"))
    val equivs = down.union(right).distinct().as[(Long, Long)].collect()

    val parent = new mutable.LongMap[Long]()
    equivs.foreach { case (a, b2) =>
      val ra = find(parent, a)
      val rb = find(parent, b2)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = parent.keys.map(k => k -> find(parent, k)).toMap
    val bc = spark.sparkContext.broadcast(roots)

    val stats = labeled.flatMap { tl =>
      tl.counts.iterator.map { case (g, v, k) =>
        (bc.value.getOrElse(g, g), v, k)
      }
    }.toDF("root", "v", "px")
      .groupBy($"v")
      .agg(countDistinct($"root").as("n_components"), sum($"px").as("n_pixels"))
      .orderBy($"v")
    stats
  }
}
