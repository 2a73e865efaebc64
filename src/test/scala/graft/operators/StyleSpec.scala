package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.Raster
import graft.core._

/** Styled rendering (grid_show.py pixel content): deterministic RGB
  * figures — colormap correctness, colorbar/legend ramps, rank breaks,
  * quiver strokes, shape outlines, distributed == driver styling. */
class StyleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def decode(png: Array[Byte]) =
    ImageIO.read(new ByteArrayInputStream(png))

  test("mapshow: ramp endpoints, NaN grey, colorbar gradient hi-at-top") {
    val ref = GridRef(32, 16, 0, 0, 1)
    val g = Raster.fromGrid(spark, ref, 5) { (r, c) =>
      if (r == 3 && c == 3) Double.NaN
      else (r * 32 + c).toDouble
    }
    val png = g.mapshowPng(0, 511)
    val img = decode(png)
    assert(img.getWidth == 32 + 10 && img.getHeight == 16)
    // v=0 at (0,0) -> ramp(0); v=511 at (31,15) -> ramp(1)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == Style.Terrain(0.0))
    assert((img.getRGB(31, 15) & 0xFFFFFF) == Style.Terrain(1.0))
    assert((img.getRGB(3, 3) & 0xFFFFFF) == Style.NoDataRgb)
    // colorbar: top row = ramp(1), bottom row = ramp(0); 2px gap is white
    assert((img.getRGB(32, 0) & 0xFFFFFF) == Style.Background)
    assert((img.getRGB(38, 0) & 0xFFFFFF) == Style.Terrain(1.0))
    assert((img.getRGB(38, 15) & 0xFFFFFF) == Style.Terrain(0.0))
  }

  test("mapshow: flat raster (lo == hi) renders ramp(0), not NaN-black") {
    // matplotlib Normalize semantics: degenerate range maps to 0; the
    // 0/0 division would otherwise NaN-propagate to black pixels
    val vals = Array(5.0, 5.0, Double.NaN, 5.0)
    val img = decode(Style.mapshowPng(vals, 2, 2, lo = 5.0, hi = 5.0,
      colorbar = false))
    assert((img.getRGB(0, 0) & 0xFFFFFF) == Style.Terrain(0.0))
    assert((img.getRGB(1, 1) & 0xFFFFFF) == Style.Terrain(0.0))
    assert((img.getRGB(0, 1) & 0xFFFFFF) == Style.NoDataRgb)
  }

  test("rankshow: break classes, below-first -> nodata, legend blocks") {
    val vals = Array(0.1, 0.25, 0.4, 0.7, 1.5, 3.0, Double.NaN, 2.0)
    val breaks = Array(0.2, 0.3, 0.5, 1.0, 2.0)
    val png = Style.rankshowPng(vals, 4, 2, breaks)
    val img = decode(png)
    def at(i: Int) = img.getRGB(i % 4, i / 4) & 0xFFFFFF
    def cls(k: Int) = Style.Blues(k.toDouble / 4)
    assert(at(0) == Style.NoDataRgb) // 0.1 < first break
    assert(at(1) == cls(0)) // [0.2, 0.3)
    assert(at(2) == cls(1)) // [0.3, 0.5)
    assert(at(3) == cls(2)) // [0.5, 1.0)
    assert(at(4) == cls(3)) // [1.0, 2.0)
    assert(at(5) == cls(4)) // >= 2.0 (open top)
    assert(at(6) == Style.NoDataRgb) // NaN
    assert(at(7) == cls(4)) // 2.0 boundary inclusive
    // legend blocks need >= n rows to show every class: render a taller
    // frame — bottom row block = class 0, top row = highest class
    val tall = decode(Style.rankshowPng(
      Array.fill(2 * 10)(1.5), 2, 10, breaks))
    assert((tall.getRGB(5, 9) & 0xFFFFFF) == cls(0))
    assert((tall.getRGB(5, 0) & 0xFFFFFF) == cls(4))
    intercept[IllegalArgumentException] {
      Style.rankshowPng(vals, 4, 2, Array(2.0, 1.0))
    }
  }

  test("quiver: strided arrows drawn, NaN cells skipped, background clean") {
    val w = 32; val h = 32
    def blackCount(img: java.awt.image.BufferedImage): Int = {
      var black = 0
      for (y <- 0 until h; x <- 0 until w)
        if ((img.getRGB(x, y) & 0xFFFFFF) == 0) black += 1
      black
    }
    val u = Array.fill(w * h)(6.0)
    val v = Array.fill(w * h)(0.0)
    val clean = decode(Style.quiverPng(u, v, w, h, step = 8, scale = 1.0))
    // anchors sit at step/2 + k*step = {4,12,20,28}: (20,20) IS an anchor
    // ((16,16) is not — a NaN there would never reach the mask branch and
    // the skip assertion below would hold vacuously)
    u(20 * w + 20) = Double.NaN
    val png = Style.quiverPng(u, v, w, h, step = 8, scale = 1.0)
    val img = decode(png)
    // arrow anchored at (4,4) pointing +x: shaft pixels black
    assert((img.getRGB(4, 4) & 0xFFFFFF) == 0x000000)
    assert((img.getRGB(9, 4) & 0xFFFFFF) == 0x000000)
    // far from any arrow: background
    assert((img.getRGB(0, 31) & 0xFFFFFF) == Style.Background)
    // the NaN anchor's whole arrow is masked. The +x arrow at (20,20)
    // (shaft to x=26, arrowhead strokes back to ~(24, 20±1)) lives alone
    // inside rows 18..22 x cols 19..27 — neighbors' pixels stay outside
    // (col-12 arrow ends at x=18, col-28 starts at x=28)
    def boxBlack(img: java.awt.image.BufferedImage): Int = {
      var n = 0
      for (y <- 18 to 22; x <- 19 to 27)
        if ((img.getRGB(x, y) & 0xFFFFFF) == 0) n += 1
      n
    }
    val inBoxClean = boxBlack(clean)
    assert(inBoxClean >= 6, s"clean arrow box black=$inBoxClean")
    assert(boxBlack(img) == 0, "NaN anchor's arrow must vanish entirely")
    // and nothing OUTSIDE the masked arrow changed
    val black = blackCount(img)
    val cleanBlack = blackCount(clean)
    assert(black == cleanBlack - inBoxClean,
      s"black=$black cleanBlack=$cleanBlack inBox=$inBoxClean")
    assert(black >= 15 * 6 && black < 15 * 30, s"black=$black")
  }

  test("plot_shape_file: polygon ring closes, polyline does not") {
    val ref = GridRef(40, 40, 0, 0, 1)
    val poly = Feature(0, "polygon",
      Array(5.0, 30.0, 30.0, 5.0), Array(5.0, 5.0, 30.0, 30.0), 1.0, 0)
    val line = Feature(1, "polyline",
      Array(2.0, 2.0), Array(2.0, 38.0), 1.0, 1)
    val png = Style.plotShapePng(Seq(poly, line), ref)
    val img = decode(png)
    def red(x: Int, y: Int) = (img.getRGB(x, y) & 0xFFFFFF) == 0xFF0000
    // polygon edge (5,5)-(30,5) in map coords -> row 34ish in pixels
    assert(red(10, ((ref.top - 5.0) / 1.0).toInt - 1 + 0) ||
      red(10, 34) || red(10, 35))
    // the CLOSING edge (5,30)-(5,5) must be drawn (vertical at x=5)
    assert(red(5, 15))
    // polyline column at x=2 drawn end to end, but no closing stroke
    assert(red(2, 10) && red(2, 30))
    assert(img.getWidth == 40 && img.getHeight == 40)
  }

  test("far-off-canvas strokes are clipped, bounded, and keep visible pixels") {
    // quiver with a huge displacement: pre-clip this was a ~2^31-step
    // Bresenham walk (Double.toInt saturates) — must complete instantly
    // and still paint the visible shaft leaving the anchor
    val w = 16; val h = 16
    val u = Array.fill(w * h)(1.0e9)
    val v = Array.fill(w * h)(0.0)
    val t0 = System.nanoTime()
    val img = decode(Style.quiverPng(u, v, w, h, step = 16, scale = 1.0e6))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "quiver stroke not bounded")
    // anchor (8,8), shaft +x: visible row painted from the anchor to the edge
    assert((img.getRGB(8, 8) & 0xFFFFFF) == 0x000000)
    assert((img.getRGB(15, 8) & 0xFFFFFF) == 0x000000)
    // non-finite displacement: stroke skipped, no crash, anchor untouched
    val u2 = Array.fill(w * h)(Double.PositiveInfinity)
    val img2 = decode(Style.quiverPng(u2, v, w, h, step = 16, scale = 1.0))
    assert((img2.getRGB(8, 8) & 0xFFFFFF) == Style.Background)
    // shapefile vertex ~1e8 cells off-grid: the visible portion of the
    // edge through the canvas must still be drawn, instantly
    val ref = GridRef(40, 40, 0, 0, 1)
    val far = Feature(0, "polyline",
      Array(20.0, 20.0), Array(-1.0e8, 1.0e8), 1.0, 0)
    val t1 = System.nanoTime()
    val img3 = decode(Style.plotShapePng(Seq(far), ref))
    assert((System.nanoTime() - t1) / 1e9 < 5.0, "shape stroke not bounded")
    assert((img3.getRGB(20, 0) & 0xFFFFFF) == 0xFF0000)
    assert((img3.getRGB(20, 39) & 0xFFFFFF) == 0xFF0000)
  }

  test("plotShapePng: degenerate empty-vertex feature draws nothing") {
    val ref = GridRef(16, 16, 0, 0, 1)
    // a shapefile can carry a record with zero points — must not index
    // xs(0)/xs(-1), must leave the canvas untouched
    val img = decode(Style.plotShapePng(Seq(
      Feature(0, "polygon", Array.empty[Double], Array.empty[Double], 1.0, 0),
      Feature(1, "polyline", Array.empty[Double], Array.empty[Double], 1.0, 0)),
      ref))
    for (r <- 0 until 16; c <- 0 until 16)
      assert((img.getRGB(c, r) & 0xFFFFFF) == Style.Background)
  }

  test("distributed rgbTiles == driver mapshow pixels (no colorbar)") {
    val ref = GridRef(64, 32, 0, 0, 1)
    val g = Raster.fromGrid(spark, ref, 5) { (r, c) =>
      if ((r * 64 + c) % 23 == 5) Double.NaN else ((r * 7 + c * 3) % 97).toDouble
    }
    val driver = decode(Style.mapshowPng(g.toArray, 64, 32, 0, 97,
      colorbar = false))
    val tilesPng = Style.rgbTiles(g.tiles, 0, 97).collect().toMap
    g.tiles.collect().foreach { t =>
      val img = decode(tilesPng(t.cellId))
      for (r <- 0 until t.h; c <- 0 until t.w)
        assert((img.getRGB(c, r) & 0xFFFFFF) ==
          (driver.getRGB(t.col0 + c, t.row0 + r) & 0xFFFFFF),
          s"tile ${t.cellId} ($r,$c)")
    }
  }
}
