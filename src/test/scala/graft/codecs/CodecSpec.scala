package graft.codecs

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.ImageCorpus

class CodecSpec extends AnyFunSuite {

  // only the Dataset-level tests (clipWindows) touch Spark; kernels stay pure
  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  val payload: Array[Double] = ImageCorpus.tilePayload(3, 2)

  test("PNG 16-bit round trip is exact on quantized values (lossless gate)") {
    val bytes = ImageCodec.encodePng(payload, 256, 256)
    val (decoded, w, h) = ImageCodec.decode(bytes, "png")
    assert(w == 256 && h == 256)
    val truth = payload.map(v => Math.rint(v * ImageCodec.PngScale) / ImageCodec.PngScale)
    assert(decoded.sameElements(truth))
    assert(ImageCodec.psnr(decoded, truth, 60.0).isPosInfinity)
  }

  test("PNG NaN sentinel survives round trip") {
    val p = payload.clone()
    p(17) = Double.NaN
    p(4001) = Double.NaN
    val (decoded, _, _) = ImageCodec.decode(ImageCodec.encodePng(p, 256, 256), "png")
    assert(decoded(17).isNaN && decoded(4001).isNaN)
    assert(!decoded(18).isNaN)
  }

  test("WAV PCM16 round trip exact; windowed features hand-checked") {
    val rnd = new scala.util.Random(7)
    val samples = Array.tabulate(777)(_ => (rnd.nextInt(65536) - 32768).toShort)
    val bytes = WavCodec.encode(samples, 8000)
    assert(new String(bytes, 0, 4, "ASCII") == "RIFF")
    val (dec, rate) = WavCodec.decode(bytes)
    assert(rate == 8000)
    assert(dec.sameElements(samples))
    // hand-checked features: [3, -4, 5] then tail [2]
    val f = WavCodec.windowFeatures(Array[Short](3, -4, 5, 2), 3)
    assert(f.sameElements(Array((0, 3L, 9L + 16L + 25L, 2L), (1, 1L, 4L, 0L))))
  }

  test("fast PNG path == ImageIO reader byte-for-byte (incl. odd sizes)") {
    val rnd = new scala.util.Random(99)
    for ((w, h) <- Seq((37, 23), (256, 256), (1, 1), (64, 3))) {
      val vals = Array.tabulate(w * h)(i =>
        if (i % 13 == 4) Double.NaN else rnd.nextInt(4000) / 4.0)
      val png = ImageCodec.encodePng(vals, w, h)
      // decodeCodes takes the fast path; reproduce the ImageIO loop here
      val (fast, fw, fh) = ImageCodec.decodeCodes(png)
      assert(fw == w && fh == h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      for (i <- 0 until w * h)
        assert(fast(i) == img.getRaster.getSample(i % w, i / w, 0), s"($w x $h) px $i")
    }
  }

  test("streaming decodeStats == eager code-plane scan (incl. NaN, odd sizes, reps)") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((37, 23), (256, 256), (1, 1), (64, 3), (255, 255))) {
      val vals = Array.tabulate(w * h)(i =>
        if (i % 11 == 2) Double.NaN else rnd.nextInt(4000) / 4.0)
      val png = ImageCodec.encodePng(vals, w, h)
      // run TWICE per shape on the same thread: the streaming path reuses
      // thread-local scratch — a stale-state bug would show on the rerun
      for (_ <- 1 to 2) {
        val (valid, mx, px) = ImageCodec.decodeStats(png, "png")
        val clean = vals.filter(v => !v.isNaN)
        assert(px == w * h)
        assert(valid == clean.length.toLong, s"($w x $h) valid")
        assert(mx == clean.max, s"($w x $h) max")
      }
      // all-NaN tile -> max is NaN, valid 0
      val allNaN = ImageCodec.encodePng(Array.fill(w * h)(Double.NaN), w, h)
      val (v0, m0, p0) = ImageCodec.decodeStats(allNaN, "png")
      assert(v0 == 0L && m0.isNaN && p0 == w * h)
    }
  }

  test("JPEG PSNR >= 40 dB on smooth terrain (lossy gate)") {
    val bytes = ImageCodec.encodeJpg(payload, 256, 256)
    val (decoded, _, _) = ImageCodec.decode(bytes, "jpg")
    val truth = payload.map(v => Math.rint(v * ImageCodec.JpgScale) / ImageCodec.JpgScale)
    val p = ImageCodec.psnr(decoded, truth, 60.0)
    assert(p >= 40.0, s"JPEG psnr $p < 40 dB")
  }

  test("phash: identical payloads equal, shifted tiles differ") {
    val h1 = ImageCodec.phash64(payload, 256, 256)
    val h2 = ImageCodec.phash64(payload.clone(), 256, 256)
    assert(h1 == h2)
    val other = ImageCorpus.tilePayload(9, 7)
    assert(h1 != ImageCodec.phash64(other, 256, 256))
  }

  test("corpus generation is deterministic and dup rule holds") {
    val a = ImageCorpus.rowOf(251, 8)
    val prev = ImageCorpus.rowOf(250, 8)
    assert(a.phash == prev.phash) // payload duplicated
    assert(a.image_id != prev.image_id)
    val b = ImageCorpus.rowOf(251, 8)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
  }

  test("resizeBilinear: constant preserved, linear ramp exact, hand case, NaN propagates") {
    import graft.codecs.ImageCodec.resizeBilinear
    // constant plane stays constant at any scale
    val const = resizeBilinear(Array.fill(12 * 8)(7.5), 12, 8, 5, 3)
    assert(const.forall(_ == 7.5))
    // a linear field v = 2x + 3y is reproduced exactly at the sample points
    // (bilinear has linear precision; pixel-center alignment)
    val (w, h, w2, h2) = (16, 12, 8, 6)
    val ramp = Array.tabulate(w * h)(i => 2.0 * (i % w) + 3.0 * (i / w))
    val rs = resizeBilinear(ramp, w, h, w2, h2)
    for (r <- 1 until h2 - 1; c <- 1 until w2 - 1) { // interior (no edge clamp)
      val fx = (c + 0.5) * w.toDouble / w2 - 0.5
      val fy = (r + 0.5) * h.toDouble / h2 - 0.5
      assert(math.abs(rs(r * w2 + c) - (2 * fx + 3 * fy)) < 1e-12, s"($r,$c)")
    }
    // 2x2 -> 1x1: plain average of the four pixels
    val one = resizeBilinear(Array(1.0, 2.0, 3.0, 4.0), 2, 2, 1, 1)
    assert(math.abs(one(0) - 2.5) < 1e-12)
    // NaN taps propagate
    val withNaN = resizeBilinear(Array(1.0, Double.NaN, 3.0, 4.0), 2, 2, 1, 1)
    assert(withNaN(0).isNaN)
  }

  test("qualityStats: exact code-domain stats; NaN skipped and breaks gradient pairs") {
    import graft.codecs.ImageCodec, ImageCodec.qualityStats
    val s = ImageCodec.PngScale
    // 3x2 grid of codes 0,64,128 / 192,192,0 -> values = code/scale
    val px = Array(0.0, 64 / s, 128 / s, 192 / s, 192 / s, 0.0)
    val q = qualityStats(px, 3, 2)
    assert(q == ImageCodec.QualityStats(qMin = 0, qMax = 192, nValid = 6,
      nDistinct = 4,
      // horizontal: |64-0| + |128-64| + |192-192| + |0-192| = 320
      // vertical:   |192-0| + |192-64| + |0-128|            = 448
      gradL1 = 768))
    // a NaN pixel is excluded from min/max/count and breaks BOTH gradient
    // pairs it participates in (left-right and up-down)
    val holed = px.clone(); holed(1) = Double.NaN
    val qh = qualityStats(holed, 3, 2)
    assert(qh.nValid == 5 && qh.nDistinct == 3)
    // remaining pairs: h |192-192| + |0-192|, v |192-0| + |0-128| = 512
    assert(qh.gradL1 == 512)
    // all-NaN image degrades to zeros, not Long extremes
    val allNaN = qualityStats(Array.fill(4)(Double.NaN), 2, 2)
    assert(allNaN == ImageCodec.QualityStats(0, 0, 0, 0, 0))
  }

  test("equalizeCodes: exact CDF remap, constant image, hand oracle") {
    import graft.codecs.ImageCodec.equalizeCodes
    // hand oracle, n=8 codes {5:3, 7:1, 9:4}, levels=4:
    // cdf: 5->3 (cdfMin), 7->4, 9->8
    // eq(q) = floor((cdf-3)*3 / (8-3)): 5->0, 7->0 (3/5), 9->3 (15/5)
    val out = equalizeCodes(Array(5, 9, 7, 5, 9, 9, 5, 9), 4)
    assert(out.toSeq == Seq(0, 3, 0, 0, 3, 3, 0, 3))
    // a constant image maps every pixel to the top level (n == cdfMin)
    assert(equalizeCodes(Array(42, 42, 42), 256).toSeq == Seq(255, 255, 255))
    // a uniform histogram over L codes with levels=L is an exact ramp:
    // code k (cdf k+1) -> floor(k*(L-1)/(L-1)) = k
    val ramp = equalizeCodes(Array.tabulate(256)(identity), 256)
    assert(ramp.toSeq == (0 until 256))
    // empty and guard paths
    assert(equalizeCodes(Array.empty[Int], 256).isEmpty)
    intercept[IllegalArgumentException](equalizeCodes(Array(1), 1))
    intercept[IllegalArgumentException](equalizeCodes(Array(-1), 256))
    intercept[IllegalArgumentException](equalizeCodes(Array(1 << 21), 256))
  }

  test("fpsSelect: half-up picks, end clamp, upsampling duplication") {
    import graft.codecs.VideoOps.fpsSelect
    // the v5 ratio: 12 frames at 10 -> 4 fps
    assert(fpsSelect(12, 10, 4) ==
      Seq((0, 0), (1, 3), (2, 5), (3, 8), (4, 10)))
    // clamp engages: 13 frames -> 6 outputs, k=5 rounds to 12.5 -> 13,
    // clamped to the last frame
    assert(fpsSelect(13, 10, 4) ==
      Seq((0, 0), (1, 3), (2, 5), (3, 8), (4, 10), (5, 12)))
    // upsampling duplicates nearest frames: 4 frames at 4 -> 10 fps
    // src(k) = round_half_up(0.4k), nOut = ceil(4*10/4) = 10
    assert(fpsSelect(4, 4, 10) == Seq((0, 0), (1, 0), (2, 1), (3, 1),
      (4, 2), (5, 2), (6, 2), (7, 3), (8, 3), (9, 3)))
    // degenerate and guard paths
    assert(fpsSelect(0, 10, 4).isEmpty)
    intercept[IllegalArgumentException](fpsSelect(4, 0, 10))
    intercept[IllegalArgumentException](fpsSelect(-1, 10, 4))
  }

  test("resample2of3: positions, floor-mean interpolation, tail cutoff") {
    import graft.codecs.WavCodec.resample2of3
    // source 0,10,20,...: out k even -> s(3k/2); odd -> mean straddle
    val ramp = Array.tabulate(10)(i => (i * 10).toShort)
    // k=0: s0=0; k=1: (s1+s2)/2=15; k=2: s3=30; k=3: (s4+s5)/2=45;
    // k=4: s6=60; k=5: (s7+s8)/2=75; k=6: s9=90; k=7 needs s10+s11 -> stop
    assert(resample2of3(ramp).toSeq ==
      Seq[Short](0, 15, 30, 45, 60, 75, 90))
    // floor-mean on odd sums and on negatives ((-3 + -4) >> 1 = -4)
    assert(resample2of3(Array[Short](0, 3, 4)).toSeq == Seq[Short](0, 3))
    assert(resample2of3(Array[Short](0, -3, -4)).toSeq == Seq[Short](0, -4))
    // degenerate inputs
    assert(resample2of3(Array.empty[Short]).isEmpty)
    assert(resample2of3(Array[Short](7)).toSeq == Seq[Short](7))
  }

  test("vadSegments: maximal loud islands with hand oracle") {
    import graft.codecs.WavCodec.vadSegments
    def clip(pattern: String, loud: Short = 100, quiet: Short = 1): Array[Short] =
      pattern.toSeq.flatMap(ch =>
        Seq.fill(4)(if (ch == 'L') loud else quiet)).toArray
    val t = 100L // 4*quiet^2 < t <= 4*loud^2 per 4-sample window
    // L L S L S -> islands [0,2) and [3,4); energy 4*100^2 = 40000/window
    assert(vadSegments(clip("LLSLS"), 4, t) ==
      Seq((0L, 0L, 2L, 80000L), (1L, 3L, 1L, 40000L)))
    // all-loud -> one island; all-quiet -> none; trailing island closes
    assert(vadSegments(clip("LLL"), 4, t) == Seq((0L, 0L, 3L, 120000L)))
    assert(vadSegments(clip("SSS"), 4, t) == Seq.empty)
    assert(vadSegments(clip("SLL"), 4, t) == Seq((0L, 1L, 2L, 80000L)))
    assert(vadSegments(Array.empty[Short], 4, t) == Seq.empty)
  }

  test("trimSilence: lead/trail runs, all-silent, short tail window") {
    import graft.codecs.WavCodec.trimSilence
    def clip(pattern: String, loud: Short = 100, quiet: Short = 1): Array[Short] =
      pattern.toSeq.flatMap(ch =>
        Seq.fill(4)(if (ch == 'L') loud else quiet)).toArray
    // threshold 4*quiet^2 < t <= 4*loud^2: window of 4 samples
    val t = 100L
    assert(trimSilence(clip("SSLS"), 4, t) == (4L, 2L, 1L, 4L))
    assert(trimSilence(clip("LLLL"), 4, t) == (4L, 0L, 0L, 16L))
    // all-silent: lead run takes every window, trail 0, kept 0
    assert(trimSilence(clip("SSSS"), 4, t) == (4L, 4L, 0L, 0L))
    // short tail window (9 samples, win 4 -> windows of 4/4/1); the final
    // 1-sample loud window has energy 10000 >= t so it is kept
    val tail = Array.fill[Short](4)(1) ++ Array.fill[Short](5)(100)
    assert(trimSilence(tail, 4, t) == (3L, 1L, 0L, 5L))
  }

  test("augmentation kernels: flipH / rot90cw / cropCenter exact semantics") {
    import graft.codecs.ImageCodec._
    // 3x2 (w=3, h=2): [0 1 2 / 3 4 5]
    val p = Array(0.0, 1, 2, 3, 4, 5)
    assert(flipH(p, 3, 2).toSeq == Seq(2.0, 1, 0, 5, 4, 3))
    // rot90cw of h x w = 2x3 -> 3x2 output: dst(r,c) = src(h-1-c, r)
    // rows of output: (src(1,0), src(0,0)), (src(1,1), src(0,1)), ...
    assert(rot90cw(p, 3, 2).toSeq == Seq(3.0, 0, 4, 1, 5, 2))
    // involutions / compositions: flip twice = identity; rot four = identity
    assert(flipH(flipH(p, 3, 2), 3, 2).toSeq == p.toSeq)
    val r1 = rot90cw(p, 3, 2)       // 2x3 payload (w=2, h=3)
    val r2 = rot90cw(r1, 2, 3)
    val r3 = rot90cw(r2, 3, 2)
    assert(rot90cw(r3, 2, 3).toSeq == p.toSeq)
    // center crop 2x2 of a 4x4 picks rows 1-2, cols 1-2
    val q = Array.tabulate(16)(_.toDouble)
    assert(cropCenter(q, 4, 4, 2, 2).toSeq == Seq(5.0, 6, 9, 10))
  }

  test("patchify: raster patch order, exact contents, reassembly inverse") {
    // 4x6 plane, 2x2 patches -> 3 patch cols x 2 patch rows, raster order
    val w = 6; val h = 4
    val src = Array.tabulate(w * h)(_.toDouble)
    val ps = ImageCodec.patchify(src, w, h, 2)
    assert(ps.length == 6 && ps.forall(_.length == 4))
    // patch 0 = rows 0-1, cols 0-1; patch 4 = rows 2-3, cols 2-3
    assert(ps(0).toSeq == Seq(0.0, 1.0, 6.0, 7.0))
    assert(ps(4).toSeq == Seq(14.0, 15.0, 20.0, 21.0))
    // reassembly by inverse indexing reproduces the plane exactly
    val back = new Array[Double](w * h)
    for (pi <- ps.indices; j <- 0 until 4) {
      val pr = pi / 3; val pc = pi % 3
      back((pr * 2 + j / 2) * w + (pc * 2 + j % 2)) = ps(pi)(j)
    }
    assert(back.toSeq == src.toSeq)
    // plain concatenation does NOT reproduce the plane (rows interleave)
    assert(ps.flatten.toSeq != src.toSeq)
    intercept[IllegalArgumentException] { ImageCodec.patchify(src, w, h, 4) }
  }

  test("downsample2: pair floor-mean, negative floor, odd-tail drop") {
    assert(WavCodec.downsample2(Array[Short](10, 20, 30, 31)).toSeq
      == Seq[Short](15, 30)) // (30+31)>>1 floors to 30
    assert(WavCodec.downsample2(Array[Short](-3, -4)).toSeq
      == Seq[Short](-4)) // floor(-3.5) = -4, NOT truncation's -3
    assert(WavCodec.downsample2(Array[Short](1, 2, 99)).toSeq
      == Seq[Short](1)) // odd tail dropped
    assert(WavCodec.downsample2(Array.empty[Short]).isEmpty)
    // Short extremes stay exact (sum computed in Int before the shift)
    assert(WavCodec.downsample2(Array[Short](Short.MaxValue, Short.MaxValue))
      .toSeq == Seq(Short.MaxValue))
    assert(WavCodec.downsample2(Array[Short](Short.MinValue, Short.MinValue))
      .toSeq == Seq(Short.MinValue))
  }

  test("clipWindows: coverage, overlap, tail, weighted order vs direct decode") {
    import spark.implicits._
    // 7-frame constant-plane clip at the proven 48x32 frame size (the
    // JDK GIF writer corrupts the last row below ~this size; v1/v2's
    // hash-green gates pin exact round trips at 48x32): frame f is
    // all-f, decoded gray = trunc(f/250*255) = f for f <= 6
    val frames = (0 until 7).map(f => Array.fill(48 * 32)(f.toDouble))
    val clips = Seq((5L, graft.sources.GifWriter.writeAnimatedBytes(
      frames, 48, 32, lo = 0, hi = 250, delayCs = 10))).toDS()
    val got = VideoOps.clipWindows(clips, winFrames = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).sortBy(_._2).toSeq
    // gray-sum of frame f = 1536 * f; starts 0,2,4,6; lengths 3,3,3,1
    def ws(first: Int, len: Int) =
      (0 until len).map(j => (j + 1).toLong * 1536L * (first + j)).sum
    assert(got == Seq(
      (5L, 0, 0, 3, ws(0, 3)), (5L, 1, 2, 3, ws(2, 3)),
      (5L, 2, 4, 3, ws(4, 3)), (5L, 3, 6, 1, ws(6, 1))))
    // every frame covered at least once
    val covered = got.flatMap(g => g._3 until (g._3 + g._4)).toSet
    assert(covered == (0 until 7).toSet)
    intercept[IllegalArgumentException] {
      VideoOps.clipWindows(clips, 3, 0) }
    intercept[IllegalArgumentException] {
      VideoOps.clipWindows(clips, 3, 4) }
  }

  test("gainShift: maximal power-of-two gain, hot clip, silence, clip boundary") {
    import graft.codecs.WavCodec.gainShift
    // peak 1000: 1000*32 = 32000 <= 32767 < 64000 -> shift 5
    assert(gainShift(Array[Short](1000, -3, 7)) == (1000L, 5))
    // maximality property across a peak sweep
    (1 to 40).foreach { p =>
      val peak = p * 700
      val (gotPeak, s) = gainShift(Array[Short](peak.toShort, 0, -1))
      assert(gotPeak == peak.toLong)
      assert((peak.toLong << s) <= 32767 || s == 0)
      assert((peak.toLong << (s + 1)) > 32767)
    }
    // hot clip (peak already past target): no gain
    assert(gainShift(Array[Short](32767)) == (32767L, 0))
    assert(gainShift(Array[Short](-32768)) == (32768L, 0))
    // silence: nothing to amplify
    assert(gainShift(Array[Short](0, 0)) == (0L, 0))
    // exact boundary: peak 16383 doubles to 32766 <= 32767 -> shift 1
    assert(gainShift(Array[Short](16383)) == (16383L, 1))
    intercept[IllegalArgumentException] { gainShift(Array[Short](1), 0) }
  }

  test("keyFrames: window argmax, smallest-index tie-break, tail window") {
    import spark.implicits._
    // 7 frames of constant gray g(f): 5, 9, 9, 2, 8, 8, 1 -> per-frame
    // gray-sum 1536*g(f); window (0..2) ties 9@1 vs 9@2 -> picks 1
    val g = Array(5, 9, 9, 2, 8, 8, 1)
    val frames = (0 until 7).map(f =>
      Array.fill(48 * 32)((g(f) * 25).toDouble))
    val clips = Seq((3L, graft.sources.GifWriter.writeAnimatedBytes(
      frames, 48, 32, lo = 0, hi = 250, delayCs = 10))).toDS()
    val got = VideoOps.keyFrames(clips, winFrames = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._2).toSeq
    // decoded gray = trunc(code/250*255); windows start 0,2,4,6
    def gray(f: Int) = (g(f) * 25 / 250.0 * 255.0).toLong * 1536L
    assert(got == Seq(
      (3L, 0, 1, gray(1)),   // tie 9,9 -> frame 1
      (3L, 1, 2, gray(2)),   // 9 beats 2, 8
      (3L, 2, 4, gray(4)),   // tie 8,8 -> frame 4
      (3L, 3, 6, gray(6)))) // tail window, single frame
    intercept[IllegalArgumentException] { VideoOps.keyFrames(clips, 0, 1) }
    intercept[IllegalArgumentException] { VideoOps.keyFrames(clips, 3, 4) }
  }
}
