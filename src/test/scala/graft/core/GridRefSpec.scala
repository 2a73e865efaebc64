package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class GridRefSpec extends AnyFunSuite {

  // FIXTURES.md §5 tiny ASC golden grid
  val g = GridRef(ncols = 4, nrows = 3, xll = 0, yll = 0, cellsize = 2, nodata = -9999)

  test("extent per header2extent (spatial_analysis.py:310-319)") {
    assert(g.extent == Extent(0, 8, 0, 6))
  }

  test("sub2map cell-center convention (spatial_analysis.py:392-413)") {
    assert(g.sub2map(0, 0) == ((1.0, 5.0))) // FIXTURES.md §5 expected
    assert(g.sub2map(2, 3) == ((7.0, 1.0)))
  }

  test("map2sub inverse on centers, round-half-even array path") {
    for (r <- 0 until g.nrows; c <- 0 until g.ncols) {
      val (x, y) = g.sub2map(r, c)
      assert(g.map2sub(x, y) == ((r, c)))
    }
  }

  test("property: map2sub . sub2map == identity on all cell centers (seeded)") {
    val rnd = new Random(42)
    val cellsizes = Array(0.5, 1.0, 2.0, 2.5, 5.0, 10.0, 30.0)
    (1 to 500).foreach { _ =>
      val ref = GridRef(1 + rnd.nextInt(300), 1 + rnd.nextInt(300),
        rnd.between(-1e6, 1e6), rnd.between(-1e6, 1e6),
        cellsizes(rnd.nextInt(cellsizes.length)))
      val r = rnd.nextInt(ref.nrows)
      val c = rnd.nextInt(ref.ncols)
      val (x, y) = ref.sub2map(r, c)
      assert(ref.map2sub(x, y) == ((r, c)), s"ref=$ref r=$r c=$c")
    }
  }

  test("clipWindow snaps and clamps (Raster.py:197-222)") {
    assert(g.clipWindow(Extent(-10, 100, -10, 100)) == ((0, 2, 0, 3)))
    val (r0, r1, c0, c1) = g.clipWindow(Extent(2.1, 5.9, 2.1, 3.9))
    assert(r0 == 1 && r1 == 1 && c0 == 1 && c1 == 2)
  }

  test("windowRef recomputes header like Raster.py:217-229") {
    val w = g.windowRef(1, 2, 1, 3)
    assert(w == GridRef(3, 2, 2.0, 0.0, 2.0, -9999))
  }

  test("clip window + windowRef preserves cell centers (header consistency)") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val ref = GridRef(2 + rnd.nextInt(100), 2 + rnd.nextInt(100),
        rnd.between(-1e5, 1e5), rnd.between(-1e5, 1e5), 5.0)
      val r0 = rnd.nextInt(ref.nrows); val r1 = r0 + rnd.nextInt(ref.nrows - r0)
      val c0 = rnd.nextInt(ref.ncols); val c1 = c0 + rnd.nextInt(ref.ncols - c0)
      val w = ref.windowRef(r0, r1, c0, c1)
      // the window's (0,0) center equals the parent's (r0,c0) center
      assert(w.sub2map(0, 0) == ref.sub2map(r0, c0))
      assert(w.sub2map(w.nrows - 1, w.ncols - 1) == ref.sub2map(r1, c1))
    }
  }

  test("compare_extent classification (spatial_analysis.py:416-441)") {
    val a = Extent(0, 10, 0, 10)
    assert(a.compare(Extent(2, 8, 2, 8)) == 0)
    assert(Extent(2, 8, 2, 8).compare(a) == 1)
    assert(a.compare(Extent(5, 15, 5, 15)) == 2)
    // branch 0 is inclusive (<=/>=), branch 1 is STRICT: a contained
    // extent sharing an edge classifies 2, not 1 (all four inclusive
    // comparisons must be false for output 1, spatial_analysis.py:428-436)
    assert(a.compare(Extent(2, 10, 2, 8)) == 0) // shared right edge: still 0
    assert(Extent(2, 10, 2, 8).compare(a) == 2) // contained w/ shared edge: 2
    assert(a.compare(a) == 0) // equal extents: 0, never 1
  }
}
