package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RefKernelSpec extends AnyFunSuite {
  import RefKernel._
  import Fixtures._

  test("pointInPolygon basic square") {
    val xs = Array(0.0, 10.0, 10.0, 0.0, 0.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0, 0.0)
    assert(pointInPolygon(5, 5, xs, ys))
    assert(!pointInPolygon(15, 5, xs, ys))
    assert(!pointInPolygon(-1, 5, xs, ys))
  }

  test("rasterize burns all four CA1 features with index values (Raster.py:277-338)") {
    val burned = rasterize(demRef, ca1Features, useAttr = false)
    val counts = (0 until 4).map { i =>
      burned.data.count(v => v == i.toDouble)
    }
    // every feature covers at least one 5m pixel center (quads are 20-100m across)
    assert(counts.forall(_ > 0), s"counts=$counts")
    // background stays NaN
    assert(burned.data.count(_.isNaN) == burned.data.length - counts.sum)
  }

  test("rasterize attribute burn uses attr values (Raster.py:316-328)") {
    val burned = rasterize(demRef, ca1Features, useAttr = true)
    val distinct = burned.data.filter(v => !v.isNaN).distinct.sorted
    assert(distinct.sameElements(Array(2.0, 4.0, 5.0, 9.0)))
  }

  test("rasterize last feature wins on overlap (Raster.py:330 sequential burn)") {
    val ref = GridRef(10, 10, 0, 0, 1)
    val a = Feature(0, "polygon", Array(0.0, 6, 6, 0, 0), Array(0.0, 0, 6, 6, 0), 10.0, 0)
    val b = Feature(1, "polygon", Array(4.0, 9, 9, 4, 4), Array(4.0, 4, 9, 9, 4), 20.0, 1)
    val g = rasterize(ref, Seq(a, b), useAttr = true)
    // pixel center (5.5, 5.5) inside both -> later wins
    val (r, c) = ref.map2sub(5.5, 5.5)
    assert(g(r, c) == 20.0)
  }

  test("rectClip on tutorial extent returns expected window") {
    val clipped = rectClip(demGrid, Extent(340761, 341528, 554668, 555682))
    // full fixture grid already sized to this extent with margin; clip keeps
    // interior snap
    assert(clipped.ref.ncols <= demRef.ncols && clipped.ref.nrows <= demRef.nrows)
    assert(clipped.ref.cellsize == 5.0)
    // clipped values match the parent at the same map positions
    val (x, y) = clipped.ref.sub2map(0, 0)
    val (pr, pc) = demRef.map2sub(x, y)
    val pv = demGrid(pr, pc)
    assert((clipped(0, 0).isNaN && pv.isNaN) || clipped(0, 0) == pv)
  }

  test("combine: later source overwrites earlier including nodata (spatial_analysis.py:288-295)") {
    val refA = GridRef(4, 4, 0, 0, 1)
    val refB = GridRef(4, 4, 2, 0, 1) // overlaps right half of A
    val a = Grid(refA, Array.fill(16)(1.0))
    val bData = Array.fill(16)(2.0); bData(0) = Double.NaN
    val b = Grid(refB, bData)
    val m = combine(Seq(a, b))
    assert(m.ref.ncols == 6 && m.ref.nrows == 4)
    // overlap region takes B values, including B's NaN hole at its (0,0)
    val (x, y) = refB.sub2map(0, 0)
    val (r, c) = m.ref.map2sub(x, y)
    assert(m(r, c).isNaN)
    val (x2, y2) = refB.sub2map(1, 1)
    val (r2, c2) = m.ref.map2sub(x2, y2)
    assert(m(r2, c2) == 2.0)
    // A-only region keeps A
    val (x3, y3) = refA.sub2map(0, 0)
    val (r3, c3) = m.ref.map2sub(x3, y3)
    assert(m(r3, c3) == 1.0)
  }

  test("merge: only valid origin cells scatter (Raster.py:889-894)") {
    val t = Grid(GridRef(4, 4, 0, 0, 1), Array.fill(16)(1.0))
    val oData = Array.fill(4)(5.0); oData(2) = Double.NaN
    val o = Grid(GridRef(2, 2, 1, 1, 1), oData)
    val m = merge(t, o)
    assert(m.data.count(_ == 5.0) == 3)
    assert(m.data.count(_ == 1.0) == 13) // NaN origin cell left target intact
  }

  test("pasteOn index-0 quirk reproduced only when asked (Raster.py:539-541)") {
    val t = Grid(GridRef(4, 4, 0, 0, 1), Array.fill(16)(0.0))
    val s = Grid(GridRef(2, 2, 0, 2, 1), Array.fill(4)(7.0)) // top-left corner
    val withQuirk = pasteOn(t, s, ignoreNan = false, index0Quirk = true)
    val noQuirk = pasteOn(t, s, ignoreNan = false, index0Quirk = false)
    assert(noQuirk.data.count(_ == 7.0) == 4)
    assert(withQuirk.data.count(_ == 7.0) == 1) // row0/col0 excluded
  }

  test("line2sub steps/drop-last semantics (Raster.py:340-366)") {
    val ref = GridRef(20, 20, 0, 0, 1)
    // horizontal segment through centers of row 19 (y=0.5): x 0.5 -> 5.5.
    // linspace between integer subscripts lands exactly on p1, so the
    // reference's guard (Raster.py:356) ALWAYS drops the segment end —
    // including the polyline's final endpoint.
    val cells = line2sub(ref, Array(0.5, 5.5), Array(0.5, 0.5))
    assert(cells.length == 5) // steps = |dc|+1 = 6, final point dropped
    assert(cells.map(_._2).sameElements(Array(0, 1, 2, 3, 4)))
    assert(cells.forall(_._1 == 19))
    // two segments: intermediate endpoint appears once (as segment-2 start)
    val cells2 = line2sub(ref, Array(0.5, 5.5, 5.5), Array(0.5, 0.5, 3.5))
    assert(cells2.count(rc => rc == ((19, 5))) == 1)
    assert(!cells2.contains((16, 5))) // final endpoint dropped
    // interpolation runs between ROUNDED endpoints: off-center vertices
    // snap first, so intermediate cells follow the integer-lattice line
    val cells3 = line2sub(ref, Array(0.76, 4.76), Array(0.5, 2.6))
    // endpoints round to (19,0) and (17,4): steps=5, rows linspace
    // 19,18.5,18,17.5(,17) rint half-even -> 19,18,18,18; drop last
    assert(cells3.sameElements(Array((19, 0), (18, 1), (18, 2), (18, 3))))
    // degenerate segment (both ends in one cell) contributes nothing
    assert(line2sub(ref, Array(0.5, 0.6), Array(0.5, 0.6)).isEmpty)
  }

  test("nearestInterp ties to lowest index, exact values") {
    val ref = GridRef(4, 1, 0, 0, 1) // centers at x=0.5,1.5,2.5,3.5 y=0.5
    val g = nearestInterp(ref, Array(0.0, 4.0), Array(0.5, 0.5), Array(10.0, 20.0))
    assert(g.data.sameElements(Array(10.0, 10.0, 20.0, 20.0)))
    // exact midpoint: center x=2.0 would tie; here centers avoid ties by design
  }

  test("resampleNearest gathers by map2sub; assignTo clamps (Raster.py:457-515)") {
    val src = Grid(GridRef(4, 4, 0, 0, 1), (0 until 16).map(_.toDouble).toArray)
    val target = GridRef(2, 2, 0, 0, 2) // 2x coarser, same extent
    val rs = resampleNearest(src, target)
    // target center (1,1) -> src map2sub rint(...) picks a consistent cell
    assert(rs.data.forall(v => !v.isNaN))
    val outside = GridRef(2, 2, 10, 10, 2)
    assert(resampleNearest(src, outside).data.forall(_.isNaN))
    assert(assignTo(src, outside).data.forall(v => !v.isNaN)) // clamped
  }

  test("stats: NaN-ignoring max/min/median/count (Raster.py:844-854,122)") {
    val g = Grid(GridRef(5, 1, 0, 0, 1), Array(3.0, Double.NaN, 1.0, 2.0, 5.0))
    val (mx, mn, med, n) = stats(g)
    assert(mx == 5.0 && mn == 1.0 && med == 2.5 && n == 4)
  }

  test("DEM fixture golden: valid count and stats are stable") {
    val g = demGrid
    val (mx, mn, _, n) = stats(g)
    val expectedHoles = (0 until demRef.ncols * demRef.nrows).count(_ % 97 == 13)
    assert(n == g.data.length - expectedHoles)
    assert(mn >= 0.0 && mx <= 249.75)
  }
}
