package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core._

/** Composed bankline / cross-section -> bathymetry surface — the
  * reference's documented-but-absent river-modules capability
  * (hydro-raster `docs/source/Modules/index.rst:4-15`, README features
  * 3-4: "generate bathymetry from cross-section lines inside bankline
  * polygons"). Every stage is an existing gated kernel; this operator is
  * the one-call composition the reference promises:
  *
  *   1. STATIONS — each survey cross-section line carries depths at its
  *      two ends; the line's [[Line2Sub]] walk fixes the station COUNT
  *      (one per rasterized cell, the reference's sampling density), and
  *      station k of n sits ON the polyline at arc-length fraction
  *      t = k/(n-1) with z = z0 + t*(z1 - z0) (linear interpolation
  *      along the section, the hydrographic convention).
  *   2. SURFACE — the scattered stations interpolate to the full grid by
  *      the exact distributed Delaunay-linear kernel
  *      ([[Delaunay.linearBucketed]] — bucketed gather + escalation
  *      proof, never an all-pairs join).
  *   3. CLIP — the interpolated raster masks to the bankline polygons
  *      ([[ClipPolygon]] — Z-range tile prune + pixel-center PIP).
  *
  * Scale shape: stations are O(total line cells) descriptor rows spread
  * by lineId; the Delaunay gather shuffles by spatial bucket; the clip
  * prunes tiles before payload work. Nothing collects to the driver.
  */
object LineSurface {

  /** A cross-section line: polyline vertices + depth at first/last
    * vertex. */
  final case class CrossLine(lineId: Long, xs: Array[Double],
      ys: Array[Double], z0: Double, z1: Double)

  /** Stage 1: survey stations along each line (see object doc). */
  def stations(lines: Dataset[CrossLine], ref: GridRef): Dataset[PtRec] = {
    import lines.sparkSession.implicits._
    lines.flatMap { ln =>
      val n = RefKernel.line2sub(ref, ln.xs, ln.ys).length
      // station ids pack (lineId << 20 | k): overflowing the 2^20 station
      // budget OR the 43-bit lineId field would silently collide with
      // another line's ids — fail loudly on both
      require(n < (1 << 20),
        s"stations: line ${ln.lineId} rasterizes to $n cells, past the " +
          "2^20 per-line station-id budget (split the line)")
      require(ln.lineId >= 0 && ln.lineId < (1L << 43),
        s"stations: lineId ${ln.lineId} outside [0, 2^43) — the packed " +
          "station id would alias another line")
      if (n == 0) Iterator.empty
      else {
        // arc-length parameterization of the polyline
        val segLen = Array.tabulate(ln.xs.length - 1) { i =>
          math.hypot(ln.xs(i + 1) - ln.xs(i), ln.ys(i + 1) - ln.ys(i))
        }
        val total = segLen.sum
        val cum = segLen.scanLeft(0.0)(_ + _)
        def at(t: Double): (Double, Double) = {
          val d = t * total
          var i = 0
          while (i < segLen.length - 1 && cum(i + 1) < d) i += 1
          val f = if (segLen(i) == 0) 0.0 else (d - cum(i)) / segLen(i)
          (ln.xs(i) + f * (ln.xs(i + 1) - ln.xs(i)),
            ln.ys(i) + f * (ln.ys(i + 1) - ln.ys(i)))
        }
        (0 until n).iterator.map { k =>
          val t = if (n == 1) 0.0 else k.toDouble / (n - 1)
          val (px, py) = at(t)
          // station ids partition the Long space by line (2^20 stations
          // per line — a 5 m grid section would need a 5,000 km line to
          // overflow)
          PtRec((ln.lineId << 20) | k.toLong, px, py,
            ln.z0 + t * (ln.z1 - ln.z0))
        }
      }
    }
  }

  /** Stages 1-3 composed: bathymetry tiles clipped to the bankline. */
  def bathymetry(spark: SparkSession, lines: Dataset[CrossLine],
      bankline: Seq[Feature], ref: GridRef, res: Int): Dataset[Tile] = {
    val pts = stations(lines, ref)
    val surface = Delaunay.linearBucketed(spark, pts, ref, res)
    ClipPolygon(TileOps.tilesFromCells(surface, ref, res), ref, res, bankline)
  }
}
