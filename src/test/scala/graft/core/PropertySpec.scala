package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property gates over the PURE kernels — exact invariants
  * only (no probabilistic assertions), so the suite is deterministic in
  * outcome regardless of the generator seed. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under scalatest (the offline cache carries
    * scalacheck itself, not the scalatestplus bridge). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("CellId: ofPixel -> pixelWindow contains the pixel; encode is injective per res") {
    check(Prop.forAllNoShrink(Gen.choose(0, 12), Gen.choose(0L, 1 << 20), Gen.choose(0L, 1 << 20)) {
      (res: Int, row: Long, col: Long) =>
        val id = CellId.ofPixel(row, col, res)
        val (r0, c0, size) = CellId.pixelWindow(id)
        assert(size == (1 << res))
        assert(r0 <= row && row < r0 + size)
        assert(c0 <= col && col < c0 + size)
        assert(r0 % size == 0 && c0 % size == 0)
        true
    })
  }

  test("GridRef: map2sub(sub2map(r, c)) == (r, c) on sane grids") {
    val gen = for {
      ncols <- Gen.choose(1, 500)
      nrows <- Gen.choose(1, 500)
      xll <- Gen.choose(-1000000, 1000000)
      yll <- Gen.choose(-1000000, 1000000)
      cs <- Gen.oneOf(0.25, 0.5, 1.0, 2.0, 5.0, 10.0)
      r <- Gen.choose(0, nrows - 1)
      c <- Gen.choose(0, ncols - 1)
    } yield (GridRef(ncols, nrows, xll, yll, cs), r, c)
    check(Prop.forAllNoShrink(gen) { case (ref, r, c) =>
      val (x, y) = ref.sub2map(r, c)
      assert(ref.map2sub(x, y) == (r, c))
      true
    })
  }

  test("pointInPolygon: centroid of a random convex polygon is inside; a far point is not") {
    val gen = for {
      n <- Gen.choose(3, 12)
      rad <- Gen.choose(1.0, 100.0)
      cx <- Gen.choose(-1000.0, 1000.0)
      cy <- Gen.choose(-1000.0, 1000.0)
      phase <- Gen.choose(0.0, math.Pi)
    } yield {
      val angles = Array.tabulate(n)(i => phase + 2 * math.Pi * i / n)
      val xs = angles.map(a => cx + rad * math.cos(a)) :+ (cx + rad * math.cos(phase))
      val ys = angles.map(a => cy + rad * math.sin(a)) :+ (cy + rad * math.sin(phase))
      (xs, ys, cx, cy, rad)
    }
    check(Prop.forAllNoShrink(gen) { case (xs, ys, cx, cy, rad) =>
      assert(RefKernel.pointInPolygon(cx, cy, xs, ys))
      assert(!RefKernel.pointInPolygon(cx + 10 * rad, cy, xs, ys))
      true
    })
  }

  test("PNG16 codec: dyadic payloads round-trip bit-exactly incl. NaN") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      codes <- Gen.listOfN(w * h, Gen.frequency(
        9 -> Gen.choose(0, 65534), 1 -> Gen.const(-1))) // -1 -> NaN
    } yield (w, h, codes.toArray)
    check(Prop.forAllNoShrink(gen) { case (w, h, codes) =>
      val vals = codes.map(c =>
        if (c < 0) Double.NaN else c / graft.codecs.ImageCodec.PngScale)
      val bytes = graft.codecs.ImageCodec.encodePng(vals, w, h)
      val (back, w2, h2) = graft.codecs.ImageCodec.decode(bytes, "png")
      assert(w2 == w && h2 == h)
      assert(java.util.Arrays.equals(back, vals))
      true
    })
  }

  test("WAV codec: PCM16 round-trips exactly") {
    val gen = for {
      n <- Gen.choose(1, 2000)
      rate <- Gen.oneOf(8000, 16000, 44100)
      s <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (s.map(_.toShort).toArray, rate)
    check(Prop.forAllNoShrink(gen) { case (samples, rate) =>
      val (back, rate2) = graft.codecs.WavCodec.decode(
        graft.codecs.WavCodec.encode(samples, rate))
      assert(rate2 == rate)
      assert(java.util.Arrays.equals(back, samples))
      true
    })
  }

  test("Proj: tmForward(tmInverse(E, N)) closes within 1 cm over the full BNG rectangle") {
    val tm = Proj.fromEpsg(27700).tm
    val gen = for {
      e <- Gen.choose(100000.0, 700000.0)
      n <- Gen.choose(0.0, 1250000.0)
    } yield (e, n)
    check(Prop.forAllNoShrink(gen) { case (e, n) =>
      val (lat, lon) = Proj.tmInverse(tm, e, n)
      val (e2, n2) = Proj.tmForward(tm, lat, lon)
      // series truncation grows toward the rectangle's far corners
      // (measured 0.56 mm at E 681k / N 1.15M — open sea ~280 km east of
      // the central meridian, outside the grid's used land area); 1 cm
      // bounds the FULL rectangle and stays well inside the operator's
      // documented accuracy classes (< 5 mm worked example on land,
      // ~5 m cross-datum Helmert)
      assert(math.abs(e2 - e) < 1e-2 && math.abs(n2 - n) < 1e-2, s"($e, $n)")
      true
    })
  }

  test("fingerprint: invariant under space-run collapse, sensitive to token order") {
    import graft.text.TextOps.fingerprint
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = for {
      ws <- Gen.nonEmptyListOf(word)
      runs <- Gen.listOfN(ws.length, Gen.choose(1, 4))
    } yield (ws, runs)
    check(Prop.forAllNoShrink(gen) { case (ws, runs) =>
      // every run of k spaces hashes like a single space: words joined by
      // random-width runs == words joined by single spaces (each word here
      // followed by a run, so the collapsed form keeps one trailing space)
      val multi = ws.zip(runs).map { case (w, k) => w + (" " * k) }.mkString
      val collapsed = ws.mkString(" ") + " "
      assert(fingerprint(multi) == fingerprint(collapsed))
      // order sensitivity: reversing >= 2 distinct tokens changes the hash
      if (ws.length >= 2 && ws.head != ws.last)
        assert(fingerprint(ws.mkString(" ")) != fingerprint(ws.reverse.mkString(" ")))
      true
    })
  }

  test("Downsample.statOf: average/max/min/median match direct computation") {
    val gen = for {
      n <- Gen.choose(1, 64)
      vs <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 4.0))
    } yield vs.toArray
    check(Prop.forAllNoShrink(gen) { vs =>
      import graft.operators.Downsample.statOf
      val work = vs.clone()
      assert(statOf(work.clone(), vs.length, "max") == vs.max)
      assert(statOf(work.clone(), vs.length, "min") == vs.min)
      assert(math.abs(statOf(work.clone(), vs.length, "average") - vs.sum / vs.length) < 1e-9)
      val sorted = vs.sorted
      val med =
        if (sorted.length % 2 == 1) sorted(sorted.length / 2)
        else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
      assert(statOf(work.clone(), vs.length, "med") == med)
      true
    })
  }
}
