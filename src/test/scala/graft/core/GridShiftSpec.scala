package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Synth
import graft.operators.{Reproject, TileOps}

/** OSTN/NTv2-style grid shift: bilinear exactness, iterative inverse,
  * binary round-trip, and the grid-corrected warp vs a driver-side
  * per-pixel oracle. The synthetic lattice is AFFINE in (e, n), which
  * bilinear interpolation reproduces exactly — so every gate is sharp. */
class GridShiftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // covers Synth.demRef (OSGB ~340760..341530 E, 554667..555682 N) with
  // a generous margin for the ETRS-BNG offset of the same physical points
  private val e0 = 338000.0
  private val n0 = 552000.0
  private def fE(e: Double, n: Double): Double =
    2.0 + 1e-5 * (e - e0) - 5e-6 * (n - n0)
  private def fN(e: Double, n: Double): Double =
    -1.5 + 3e-6 * (e - e0) + 8e-6 * (n - n0)
  private val grid: ShiftGrid = {
    val (nc, nr, cs) = (14, 14, 500.0)
    val dE = Array.tabulate(nc * nr)(i => fE(e0 + (i % nc) * cs, n0 + (i / nc) * cs))
    val dN = Array.tabulate(nc * nr)(i => fN(e0 + (i % nc) * cs, n0 + (i / nc) * cs))
    ShiftGrid(e0, n0, cs, nc, nr, dE, dN)
  }

  test("bilinear interpolation reproduces an affine lattice exactly") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val e = e0 + rnd.nextDouble() * 13 * 500
      val n = n0 + rnd.nextDouble() * 13 * 500
      val (de, dn) = grid.shiftAt(e, n)
      assert(math.abs(de - fE(e, n)) < 1e-9, s"dE at ($e,$n)")
      assert(math.abs(dn - fN(e, n)) < 1e-9, s"dN at ($e,$n)")
    }
    // outside the lattice must raise, not fabricate
    intercept[IllegalArgumentException](grid.shiftAt(e0 - 1, n0))
  }

  test("iterative inverse round-trips forward to sub-micrometre") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val e = e0 + 1000 + rnd.nextDouble() * 4000
      val n = n0 + 1000 + rnd.nextDouble() * 4000
      val (fe, fn) = grid.forward(e, n)
      val (ie, in) = grid.inverse(fe, fn)
      assert(math.abs(ie - e) < 1e-6 && math.abs(in - n) < 1e-6,
        s"round trip ($e,$n) -> ($ie,$in)")
    }
  }

  test("binary grid file round-trips bit-exactly") {
    val p = java.nio.file.Files.createTempFile("shift", ".grd").toString
    ShiftGrid.write(p, grid)
    val back = ShiftGrid.read(p)
    assert(back.e0 == grid.e0 && back.n0 == grid.n0 && back.cs == grid.cs)
    assert(back.ncols == grid.ncols && back.nrows == grid.nrows)
    assert(back.dE.sameElements(grid.dE) && back.dN.sameElements(grid.dN))
    new java.io.File(p).delete()
  }

  test("grid-corrected warp == direct per-pixel oracle; differs from Helmert") {
    val ref = Synth.demRef.withEpsg(27700)
    val dem = TileOps.tileGrid(spark, ref, 6)(Synth.demValue)
    val (warped, dstRef) = Reproject.warp(dem, ref, 32630, 6, Some(grid))
    val got = TileOps.cells(warped)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got.size == dstRef.numCells)
    val dst = Proj.fromEpsg(32630)
    var valid = 0
    for (r <- 0 until dstRef.nrows; c <- 0 until dstRef.ncols) {
      val (x, y) = dstRef.sub2map(r, c)
      val (sx, sy) = Proj.transformToOsgbGrid(dst, grid, x, y)
      val (sr, sc) = ref.map2sub(sx, sy)
      val e =
        if (sr >= 0 && sr < ref.nrows && sc >= 0 && sc < ref.ncols)
          Synth.demValue(sr, sc)
        else Double.NaN
      val g = got((r, c))
      assert(g == e || (g.isNaN && e.isNaN), s"($r,$c): $g vs $e")
      if (!e.isNaN) valid += 1
    }
    assert(valid > dstRef.numCells / 2)
    // the lattice (|shift| ~ 2 m on 5 m pixels) must actually move data
    // relative to the plain Helmert path
    val (plain, plainRef) = Reproject.warp(dem, ref, 32630, 6, None)
    assert(plainRef == dstRef) // extent logic is grid-independent
    val plainMap = TileOps.cells(plain)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val nDiff = got.count { case (k, v) =>
      val p = plainMap(k)
      !(v == p || (v.isNaN && p.isNaN))
    }
    assert(nDiff > 0, "grid shift had no observable effect")
  }

  test("ETRS-BNG grid path: forward/inverse transform consistency") {
    val dst = Proj.fromEpsg(32630)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val e = 340800.0 + rnd.nextDouble() * 700
      val n = 554700.0 + rnd.nextDouble() * 900
      // OSGB E/N -> UTM (grid path) -> back to OSGB E/N (grid path)
      val (ux, uy) = Proj.transformFromOsgbGrid(grid, dst, e, n)
      val (be, bn) = Proj.transformToOsgbGrid(dst, grid, ux, uy)
      assert(math.hypot(be - e, bn - n) < 1e-4,
        s"grid round trip ($e,$n) -> ($be,$bn)")
    }
  }
}
