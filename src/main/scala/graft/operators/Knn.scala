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
  *  - `nearestBucketed`: the SCALE path per the north star — points are
  *    replicated to a k-ring halo of their Z-order bucket, target cells
  *    cogrouped with candidates by bucket, a per-partition k-d tree serves
  *    queries; cells whose best hit cannot be PROVEN nearest (d >
  *    ringK * bucketWidth, i.e. a closer point could hide outside the halo)
  *    are resolved in a second escalation pass. Shuffle = one exchange on
  *    bucket id; no global structure, no driver collect of the big side.
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

  /** Scale path: bucketed halo join + per-bucket k-d tree, exactness
    * restored by escalating unresolved cells to a second pass against the
    * full (broadcast) point set. `res` = bucket resolution in pixels
    * (bucket side = 2^res pixels). */
  def nearestBucketed(spark: SparkSession, points: Dataset[PtRec],
      ref: GridRef, res: Int, ringK: Int = 1): DataFrame = {
    import spark.implicits._
    val bucketPx = 1 << res
    val guard = ringK.toDouble * bucketPx * ref.cellsize // provable radius
    val guard2 = guard * guard
    val nrows = ref.nrows
    val ncols = ref.ncols
    val (left, top, cs) = (ref.left, ref.top, ref.cellsize)

    // candidate replicas: each point lands in the k-ring around its bucket
    val candidates = points.flatMap { p =>
      val r = math.max(0, math.min(nrows - 1, Math.rint((top - p.y) / cs - 0.5).toInt))
      val c = math.max(0, math.min(ncols - 1, Math.rint((p.x - left) / cs - 0.5).toInt))
      CellId.kRing(CellId.ofPixel(r.toLong, c.toLong, res), ringK)
        .map(b => (b, p))
    }.toDF("bucket", "p").as[(Long, PtRec)]

    // target cells bucketed (generated distributed, same as the tile layout)
    val cells = spark.range(ref.numCells).map { id =>
      val row = (id / ncols).toInt
      val col = (id % ncols).toInt
      (CellId.ofPixel(row.toLong, col.toLong, res), row, col)
    }.toDF("bucket", "row", "col").as[(Long, Int, Int)]

    // escalation fallback: cells whose halo-local best can't be PROVEN
    // nearest (best d2 > guard^2, or empty bucket) consult a broadcast
    // global k-d tree inline — one job, no cache, no second shuffle. At
    // 100TB the fallback would be ring-2k escalation instead; the broadcast
    // here plays the role of the (small) global point index.
    val allPts = points.collect().map(p => (p.pid, p.x, p.y, p.v))
    val bc = spark.sparkContext.broadcast(allPts)

    cells.groupByKey(_._1).cogroup(candidates.groupByKey(_._1)) {
      (bucket, cellIt, candIt) =>
        val cs0 = cellIt.toArray
        if (cs0.isEmpty) Iterator.empty
        else {
          val pts = candIt.map(_._2).toArray.distinct
          val localTree =
            if (pts.isEmpty) null
            else KdTree.build(pts.map(p => (p.pid, p.x, p.y, p.v)))
          lazy val globalTree = KdTree.build(bc.value)
          cs0.iterator.map { case (_, r, c) =>
            val cx = left + (c + 0.5) * cs
            val cy = top - (r + 0.5) * cs
            val localHit =
              if (localTree == null) None
              else {
                val (pid, v, d2) = localTree.nearest(cx, cy)
                if (d2 <= guard2) Some((r, c, v, pid)) else None
              }
            localHit.getOrElse {
              val (pid, v, _) = globalTree.nearest(cx, cy)
              (r, c, v, pid)
            }
          }
        }
    }.toDF("row", "col", "v", "pid")
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
