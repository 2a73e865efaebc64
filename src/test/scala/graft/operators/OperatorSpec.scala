package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth

/** Distributed-operator parity vs the RefKernel oracle: exact join row
  * counts + tile/cell assignments (the BASELINE.md correctness gate). */
class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val res = 6

  test("rasterize burn matches oracle exactly (cells, values, counts)") {
    import graft.core.{Fixtures => F}
    val got = Rasterize(spark, Synth.ca1Features, Synth.demRef, res, useAttr = true)
      .collect().map(p => (p.row, p.col) -> p.v).toMap
    val oracle = RefKernel.rasterize(Synth.demRef, Synth.ca1Features, useAttr = true)
    val want = (for {
      r <- 0 until Synth.demRef.nrows
      c <- 0 until Synth.demRef.ncols
      v = oracle(r, c) if !v.isNaN
    } yield (r, c) -> v).toMap
    assert(got.size == want.size, s"burned-cell count ${got.size} != ${want.size}")
    assert(got == want)
    assert(F.demRef == Synth.demRef) // fixtures stay in sync
  }

  test("rasterize index burn (attribute=None path, Raster.py:316-330)") {
    val got = Rasterize(spark, Synth.ca1Features, Synth.demRef, res, useAttr = false)
      .collect()
    assert(got.map(_.v).distinct.sorted.sameElements(Array(0.0, 1.0, 2.0, 3.0)))
  }

  test("mosaic matches RefKernel.combine exactly incl. NaN precedence") {
    import graft.core.{Fixtures => F}
    val a = TileOps.tileGrid(spark, Synth.gridARef, res)(Synth.gridAValue)
    val b = TileOps.tileGrid(spark, Synth.gridBRef, res)(Synth.gridBValue)
    val patches = TileOps.alignedPatches(a, Synth.gridARef, Synth.mosaicRef,
        res, seq = 0, coverAll = true)
      .union(TileOps.alignedPatches(b, Synth.gridBRef, Synth.mosaicRef,
        res, seq = 1, coverAll = true))
    val got = TileOps.cells(TileOps.mosaic(patches)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .filterNot(_._2.isNaN).toMap
    val oracle = RefKernel.combine(Seq(F.gridA, F.gridB))
    assert(oracle.ref == Synth.mosaicRef)
    val want = (for {
      r <- 0 until oracle.ref.nrows
      c <- 0 until oracle.ref.ncols
      v = oracle(r, c) if !v.isNaN
    } yield (r, c) -> v).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("mosaic ignore-NaN mode keeps base under NaN source (Raster.py:546-549)") {
    // base = gridA re-gridded to itself (seq 0), overlay = gridB (seq 1,
    // coverAll=false): gridB's NaN holes must NOT erase gridA values.
    val a = TileOps.tileGrid(spark, Synth.gridARef, res)(Synth.gridAValue)
    val b = TileOps.tileGrid(spark, Synth.gridBRef, res)(Synth.gridBValue)
    val target = Synth.gridARef
    val patches = TileOps.asPatches(a, 0)
      .union(TileOps.alignedPatches(b, Synth.gridBRef, target, res,
        seq = 1, coverAll = false))
    val got = TileOps.cells(TileOps.mosaic(patches)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    import graft.core.{Fixtures => F}
    val want = RefKernel.merge(F.gridA, F.gridB)
    for (r <- 0 until target.nrows; c <- 0 until target.ncols) {
      val w = want(r, c)
      val g = got((r, c))
      assert(g == w || (g.isNaN && w.isNaN), s"($r,$c): got $g want $w")
    }
  }

  test("rect_clip matches oracle window and values") {
    import graft.core.{Fixtures => F}
    val dem = TileOps.tileGrid(spark, Synth.demRef, res)(Synth.demValue)
    val (clipped, (r0, r1, c0, c1)) =
      TileOps.rectClip(dem, Synth.demRef, Synth.tutorialClip, res)
    val got = TileOps.cells(clipped).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val oracle = RefKernel.rectClip(F.demGrid, Synth.tutorialClip)
    assert(oracle.ref == Synth.demRef.windowRef(r0, r1, c0, c1))
    assert(got.size == oracle.ref.numCells)
    for (r <- 0 until oracle.ref.nrows; c <- 0 until oracle.ref.ncols) {
      val w = oracle(r, c)
      val g = got((r + r0, c + c0))
      assert(g == w || (g.isNaN && w.isNaN))
    }
  }

  test("grid stats match oracle (NaN-ignoring, Raster.py:844-854)") {
    import graft.core.{Fixtures => F}
    val dem = TileOps.tileGrid(spark, Synth.demRef, res)(Synth.demValue)
    val row = TileOps.stats(dem).collect()(0)
    val (mx, mn, med, n) = RefKernel.stats(F.demGrid)
    assert(row.getDouble(0) == mx)
    assert(row.getDouble(1) == mn)
    assert(row.getDouble(2) == med)
    assert(row.getLong(3) == n)
  }

  test("salted burn == plain burn (hot-cell skew split preserves last-wins)") {
    val tasks = Rasterize.cover(spark, Synth.ca1Features, Synth.demRef, res, useAttr = true)
    val plain = Rasterize.burn(tasks, Synth.demRef)
      .collect().map(p => (p.row, p.col) -> p.v).toMap
    for (salt <- Seq(2, 4, 7)) {
      val salted = Rasterize.burnSalted(
        Rasterize.cover(spark, Synth.ca1Features, Synth.demRef, res, useAttr = true),
        Synth.demRef, salt)
        .collect().map(p => (p.row, p.col) -> p.v).toMap
      assert(salted == plain, s"salt=$salt")
    }
  }

  test("mosaic is deterministic under different partitioning (seam rule)") {
    val a = TileOps.tileGrid(spark, Synth.gridARef, res)(Synth.gridAValue)
    val b = TileOps.tileGrid(spark, Synth.gridBRef, res)(Synth.gridBValue)
    def run(parts: Int): Map[(Int, Int), Double] = {
      val patches = TileOps.alignedPatches(a, Synth.gridARef, Synth.mosaicRef,
          res, 0, coverAll = true)
        .union(TileOps.alignedPatches(b, Synth.gridBRef, Synth.mosaicRef,
          res, 1, coverAll = true))
        .repartition(parts)
      TileOps.cells(TileOps.mosaic(patches)).collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
        .filterNot(_._2.isNaN).toMap
    }
    assert(run(1) == run(7))
  }
}
