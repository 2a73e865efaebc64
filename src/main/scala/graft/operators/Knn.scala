package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Scattered point record for kNN interpolation. */
final case class PtRec(pid: Long, x: Double, y: Double, v: Double)

/** kNN / scattered->grid interpolation join (reference `point_interpolate`
  * method='nearest' = scipy cKDTree 1-NN, Raster.py:409-429; `grid_interpolate`
  * Raster.py:431-455 is the same with exploded tile centroids as points).
  *
  * Two physical strategies, identical semantics (ties -> lowest point id):
  *  - `nearestBrute`: crossJoin + min-by window. Exact; O(cells x points);
  *    the small-scale oracle path.
  *  - `nearestBucketed`: the SCALE path per the north star — fully
  *    distributed, NO driver collect of the point set at any stage:
  *    pass 1 replicates points to a k-ring halo of their Z-order bucket and
  *    cogroups target cells with candidates (per-partition k-d tree);
  *    cells whose best hit cannot be PROVEN nearest (d > ringK*bucketWidth:
  *    a closer point could hide outside the halo) escalate to
  *    QUERY-replication passes — each unresolved cell ships a tiny
  *    (row, col) descriptor to exactly the ring of buckets its own distance
  *    bound requires (ring = ceil(d/bucketWidth)), the per-bucket best hits
  *    are min-merged by (d2, pid). Cells with NO pass-1 candidate loop with
  *    a doubling ring until one is found (bounded by the grid's bucket
  *    diameter, at which point the search is exhaustive and uncondition-
  *    ally exact). Unresolved counts shrink geometrically with point
  *    density, so the escalation traffic is a vanishing fraction of pass 1.
  */
object Knn {

  /** Exact brute force: every (cell, point) pair, keep min (d2, pid).
    * Used as the correctness oracle and for tiny point sets. */
  def nearestBrute(spark: SparkSession, points: Dataset[PtRec], ref: GridRef)
      : DataFrame = {
    import spark.implicits._
    val cells = spark.range(ref.numCells).select(
      ($"id" / ref.ncols).cast("int").as("row"),
      ($"id" % ref.ncols).cast("int").as("col"))
      .withColumn("cx", lit(ref.left) + ($"col" + 0.5) * ref.cellsize)
      .withColumn("cy", lit(ref.top) - ($"row" + 0.5) * ref.cellsize)
    val joined = cells.crossJoin(points)
      .withColumn("d2", ($"x" - $"cx") * ($"x" - $"cx") + ($"y" - $"cy") * ($"y" - $"cy"))
    joined
      .groupBy($"row", $"col")
      .agg(min_by(struct($"v", $"pid"), struct($"d2", $"pid")).as("best"))
      .select($"row", $"col", $"best.v".as("v"), $"best.pid".as("pid"))
  }

  /** A pass-1 result: best-so-far for a cell, plus whether it is PROVEN
    * nearest. pid = -1 marks "no candidate found yet" (d2 = +Inf).
    * (Public: codegen'd predicates instantiate the class from generated
    * Java — a private case class forces interpreted fallback.) */
  final case class Hit(row: Int, col: Int, v: Double, pid: Long,
      d2: Double, proven: Boolean)

  /** An escalation query shipped to one point-bucket. */
  final case class Query(bucket: Long, row: Int, col: Int, ring: Int)

  /** Scale path: bucketed halo join + per-bucket k-d tree; exactness
    * restored by distributed query-replication escalation (see object doc).
    * `res` = bucket resolution in pixels (bucket side = 2^res pixels). */
  def nearestBucketed(spark: SparkSession, points: Dataset[PtRec],
      ref: GridRef, res: Int, ringK: Int = 1): DataFrame = {
    import spark.implicits._
    val bucketPx = 1 << res
    val bucketW = bucketPx * ref.cellsize
    val guard2 = (ringK * bucketW) * (ringK * bucketW) // provable radius^2
    val nrows = ref.nrows
    val ncols = ref.ncols
    val (left, top, cs) = (ref.left, ref.top, ref.cellsize)
    // ring that covers EVERY bucket of the grid from any cell: beyond this
    // the search is exhaustive and the best candidate is exact by fiat
    val maxRing = math.max((nrows + bucketPx - 1) / bucketPx,
      (ncols + bucketPx - 1) / bucketPx)

    def pointBucket(p: PtRec): Long = {
      val r = math.max(0, math.min(nrows - 1, Math.rint((top - p.y) / cs - 0.5).toInt))
      val c = math.max(0, math.min(ncols - 1, Math.rint((p.x - left) / cs - 0.5).toInt))
      CellId.ofPixel(r.toLong, c.toLong, res)
    }

    // ---- pass 1: point-replication halo cogroup --------------------------
    val candidates = points.flatMap { p =>
      CellId.kRing(pointBucket(p), ringK).map(b => (b, p))
    }.toDF("bucket", "p").as[(Long, PtRec)]

    val cells = spark.range(ref.numCells).map { id =>
      val row = (id / ncols).toInt
      val col = (id % ncols).toInt
      (CellId.ofPixel(row.toLong, col.toLong, res), row, col)
    }.toDF("bucket", "row", "col").as[(Long, Int, Int)]

    val p1 = cells.groupByKey(_._1).cogroup(candidates.groupByKey(_._1)) {
      (_, cellIt, candIt) =>
        val cs0 = cellIt.toArray
        if (cs0.isEmpty) Iterator.empty
        else {
          val pts = candIt.map(_._2).toArray.distinct
          val localTree =
            if (pts.isEmpty) null
            else KdTree.build(pts.map(p => (p.pid, p.x, p.y, p.v)))
          cs0.iterator.map { case (_, r, c) =>
            val cx = left + (c + 0.5) * cs
            val cy = top - (r + 0.5) * cs
            if (localTree == null)
              Hit(r, c, Double.NaN, -1L, Double.PositiveInfinity, proven = false)
            else {
              val (pid, v, d2) = localTree.nearest(cx, cy)
              Hit(r, c, v, pid, d2, proven = d2 <= guard2)
            }
          }
        }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var out: DataFrame = p1.filter(_.proven).toDF()
      .select($"row", $"col", $"v", $"pid")

    // ---- escalation: query-replication passes ----------------------------
    // points keyed ONCE by their own bucket (replication factor 1)
    lazy val ptsByBucket = points.map(p => (pointBucket(p), p))
      .toDF("bucket", "p").as[(Long, PtRec)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var unresolved = p1.filter(h => !h.proven)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ring = math.max(2 * ringK, 2)
    while (!unresolved.isEmpty) {
      val ringUsed = ring
      val exhaustive = ringUsed >= maxRing
      // cells WITH a bound query exactly the ring their bound requires
      // (guaranteed proven this pass); boundless cells probe `ringUsed`
      val queries = unresolved.flatMap { h =>
        val bkt = CellId.ofPixel(h.row.toLong, h.col.toLong, res)
        val need =
          if (h.pid >= 0) math.min(maxRing,
            math.max(1, math.ceil(math.sqrt(h.d2) / bucketW).toInt))
          else math.min(maxRing, ringUsed)
        CellId.kRing(bkt, need).iterator.map(b => Query(b, h.row, h.col, need))
      }
      // every query emits a row even when its bucket holds no points
      // (d2 = +Inf sentinel), so empty-ring cells stay in the loop
      val perBucket = queries.groupByKey(_.bucket)
        .cogroup(ptsByBucket.groupByKey(_._1)) { (_, qIt, pIt) =>
          val qs = qIt.toArray
          if (qs.isEmpty) Iterator.empty
          else {
            val pts = pIt.map(_._2).toArray
            val tree =
              if (pts.isEmpty) null
              else KdTree.build(pts.map(p => (p.pid, p.x, p.y, p.v)))
            qs.iterator.map { q =>
              if (tree == null)
                (q.row, q.col, q.ring, Double.NaN, -1L, Double.PositiveInfinity)
              else {
                val cx = left + (q.col + 0.5) * cs
                val cy = top - (q.row + 0.5) * cs
                val (pid, v, d2) = tree.nearest(cx, cy)
                (q.row, q.col, q.ring, v, pid, d2)
              }
            }
          }
        }.toDF("row", "col", "ring", "v", "pid", "d2")
      val best = perBucket.groupBy($"row", $"col")
        .agg(min_by(struct($"v", $"pid", $"d2", $"ring"),
          struct($"d2", $"pid")).as("b"))
        .select($"row", $"col", $"b.v".as("v"), $"b.pid".as("pid"),
          $"b.d2".as("d2"), $"b.ring".as("ring"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // proven: found within the searched ring's guard (cells that queried
      // their own bound-derived ring always pass — the true nearest cannot
      // lie outside that ring), or the search was exhaustive
      val provenCond =
        ($"pid" >= 0) && ($"d2" <= ($"ring" * bucketW) * ($"ring" * bucketW) ||
          lit(exhaustive))
      out = out.unionByName(
        best.filter(provenCond).select($"row", $"col", $"v", $"pid"))
      unresolved =
        if (exhaustive) spark.emptyDataset[Hit]
        else best.filter(!provenCond && $"pid" >= 0 || $"pid" < 0)
          .select($"row", $"col", $"v", $"pid", $"d2")
          .withColumn("proven", lit(false)).as[Hit]
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ring = ring * 2
    }
    // caches stay live: `out` is returned lazily and re-reads them on the
    // caller's action; they evict LRU / die with the session
    out
  }
}

/** grid_interpolate (reference Raster.py:431-455): source GRID cells become
  * the scattered points (NaN sources dropped, ids = row-major pixel index
  * for the deterministic tie-break), then the same kNN machinery fills the
  * target grid. */
object GridInterpolate {
  import org.apache.spark.sql.DataFrame
  import graft.core._

  def nearest(srcTiles: org.apache.spark.sql.Dataset[Tile], srcRef: GridRef,
      targetRef: GridRef, res: Int): DataFrame = {
    import srcTiles.sparkSession.implicits._
    val pts = srcTiles.flatMap { t =>
      val out = Iterator.newBuilder[PtRec]
      var i = 0
      while (i < t.payload.length) {
        val v = t.payload(i)
        if (!v.isNaN) {
          val r = t.row0 + i / t.w
          val c = t.col0 + i % t.w
          val (x, y) = srcRef.sub2map(r, c)
          out += PtRec(r.toLong * srcRef.ncols + c, x, y, v)
        }
        i += 1
      }
      out.result()
    }
    Knn.nearestBucketed(srcTiles.sparkSession, pts, targetRef, res, ringK = 1)
  }
}
