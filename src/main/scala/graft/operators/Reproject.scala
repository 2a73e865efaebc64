package graft.operators

import org.apache.spark.sql.Dataset
import graft.core._

/** Reproject a raster to another CRS — reference `Raster.reproject`
  * (Raster.py:695-733): rasterio.warp with Resampling.nearest and
  * calculate_default_transform. Re-expressed Spark-first:
  *
  *  - the TARGET grid follows cal_tsf semantics (standardized): transform
  *    boundary sample points of the source extent to the dst CRS, take
  *    their bbox, cellsize = max(width/ncols, height/nrows) of that bbox
  *    (square pixels), dims = rint(extent/cellsize);
  *  - the warp is the tile-granular gather: each target tile inversely
  *    transforms a boundary sample of its pixel centers into SOURCE pixel
  *    space to build its cover (bbox padded for curvature — TM curvature
  *    across a 64-px tile is << 1 px, the pad is belt-and-braces), then
  *    the per-pixel kernel does dst center -> src CRS -> map2sub ->
  *    nearest lookup. One descriptor shuffle + one fragment cogroup, no
  *    per-pixel exchange. */
object Reproject {

  /** cal_tsf-style destination header. */
  def defaultTransform(srcRef: GridRef, dstEpsg: Int): GridRef = {
    val src = Proj.fromEpsg(srcRef.epsg)
    val dst = Proj.fromEpsg(dstEpsg)
    var xmin = Double.MaxValue; var xmax = Double.MinValue
    var ymin = Double.MaxValue; var ymax = Double.MinValue
    val n = 21
    for (i <- 0 to n; j <- 0 to n
         if i == 0 || i == n || j == 0 || j == n) { // boundary ring
      val x = srcRef.left + (srcRef.right - srcRef.left) * i / n
      val y = srcRef.bottom + (srcRef.top - srcRef.bottom) * j / n
      val (dx, dy) = Proj.transform(src, dst, x, y)
      if (dx < xmin) xmin = dx; if (dx > xmax) xmax = dx
      if (dy < ymin) ymin = dy; if (dy > ymax) ymax = dy
    }
    val cs = math.max((xmax - xmin) / srcRef.ncols, (ymax - ymin) / srcRef.nrows)
    val w = math.max(1, Math.rint((xmax - xmin) / cs).toInt)
    val h = math.max(1, Math.rint((ymax - ymin) / cs).toInt)
    GridRef(w, h, xmin, ymax - h * cs, cs, srcRef.nodata, s"EPSG:$dstEpsg")
  }

  /** Nearest-resampling warp. Returns (tiles on the dst grid, dst header).
    * srcRef.crs must carry an EPSG code (reference raises likewise,
    * Raster.py:668-671). */
  def warp(tiles: Dataset[Tile], srcRef: GridRef, dstEpsg: Int, res: Int,
      gridShift: Option[graft.core.ShiftGrid] = None)
      : (Dataset[Tile], GridRef) = {
    require(srcRef.epsg > 0,
      "source crs must be EPSG-coded for reproject (reference set_crs)")
    val dstRef = defaultTransform(srcRef, dstEpsg)
    val (sNrows, sNcols) = (srcRef.nrows, srcRef.ncols)
    // Crs is a plain serializable case class — capture once per closure
    val src = Proj.fromEpsg(srcRef.epsg)
    val dst = Proj.fromEpsg(dstEpsg)
    // the gather needs dst -> src; with an OSTN-style lattice present,
    // route the OSGB36 leg through the grid (r17's gridless hash is
    // untouched — the default is the plain Helmert path). A pixel whose
    // position falls OUTSIDE the lattice becomes NaN — the same "no
    // source" outcome the Helmert path reaches via the sr/sc bounds
    // check — instead of failing the job from inside a task.
    require(gridShift.isEmpty || dstEpsg == 27700 || srcRef.epsg == 27700,
      s"gridShift supplied but neither endpoint is EPSG:27700 " +
        s"(src ${srcRef.epsg}, dst $dstEpsg) — the lattice would be ignored")
    val nanPt = (Double.NaN, Double.NaN)
    val dstToSrc: (Double, Double) => (Double, Double) = gridShift match {
      case Some(g) if dstEpsg == 27700 =>
        // inverse iteration starts at the OSGB position; guard the lattice
        (x, y) => if (!g.contains(x, y)) nanPt
          else Proj.transformFromOsgbGrid(g, src, x, y)
      case Some(g) if srcRef.epsg == 27700 =>
        (x, y) => {
          val (e, n) = Proj.transformToEtrsBng(dst, x, y)
          if (!g.contains(e, n)) nanPt else g.forward(e, n)
        }
      case _ => (x, y) => Proj.transform(dst, src, x, y)
    }
    val cover = (row0: Int, col0: Int, h: Int, w: Int) => {
      var rMin = Double.MaxValue; var rMax = Double.MinValue
      var cMin = Double.MaxValue; var cMax = Double.MinValue
      val steps = 8
      for (i <- 0 to steps; j <- 0 to steps
           if i == 0 || i == steps || j == 0 || j == steps) {
        val r = row0 + (h - 1).toDouble * i / steps
        val c = col0 + (w - 1).toDouble * j / steps
        val (x, y) = dstRef.sub2map(r, c)
        val (sx, sy) = dstToSrc(x, y)
        if (!sx.isNaN && !sy.isNaN) {
          val (fr, fc) = srcRef.map2subFrac(sx, sy)
          if (fr < rMin) rMin = fr; if (fr > rMax) rMax = fr
          if (fc < cMin) cMin = fc; if (fc > cMax) cMax = fc
        }
      }
      if (rMin > rMax) Array.empty[Long] // tile fully off-lattice
      else {
        val pad = 2 // curvature guard (TM bows edges < 1 px per 64-px tile)
        def cl(v: Long, n: Int): Long = math.max(0L, math.min(n - 1L, v))
        val r0 = cl(math.floor(rMin).toLong - pad, sNrows)
        val r1 = cl(math.ceil(rMax).toLong + pad, sNrows)
        val c0 = cl(math.floor(cMin).toLong - pad, sNcols)
        val c1 = cl(math.ceil(cMax).toLong + pad, sNcols)
        CellId.coverWindow(r0, r1, c0, c1, res)
      }
    }
    val out = Gather.gatherTileDsCover(tiles, dstRef, res)(cover) {
      (tr, tc, byCell) =>
        val (x, y) = dstRef.sub2map(tr, tc)
        val (sx, sy) = dstToSrc(x, y)
        if (sx.isNaN || sy.isNaN) Double.NaN
        else {
          val (sr, sc) = srcRef.map2sub(sx, sy)
          if (sr < 0 || sr >= sNrows || sc < 0 || sc >= sNcols) Double.NaN
          else byCell.get(CellId.ofPixel(sr.toLong, sc.toLong, res)) match {
            case Some(t) => t.value(sr, sc)
            case None => Double.NaN
          }
        }
    }
    (out, dstRef)
  }
}
