package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact squared Euclidean distance transform (Felzenszwalb & Huttenlocher
  * 2004, the separable two-pass) — the proximity/buffer primitive every
  * raster toolkit ships next to hydrology (flood-risk buffers around
  * channels, structure setbacks). Integer-exact: dist2 = min over source
  * cells of (dr^2 + dc^2), so the DuckDB oracle (brute min over the
  * cross join) is hash-perfect.
  *
  * Distributed shape: pass 1 shuffles SOURCE DESCRIPTORS by row and emits
  * the per-row 1-D column distances g(r, c) (two linear sweeps per row);
  * pass 2 shuffles (r, c, g) by COLUMN and runs the 1-D lower-envelope
  * transform over f(r) = g(r)^2 per column — O(n) per line, all-Long
  * arithmetic with cross-multiplied rational boundary comparisons (no
  * float anywhere). Two full-raster descriptor shuffles total; per-line
  * memory is O(line). For grids whose single line exceeds a task
  * (10^6+ rows) the same envelope decomposes into column BANDS with a
  * boundary-parabola exchange — documented, out of scope here. */
object DistanceTransform {

  private val INF = 1L << 20 // > any supported line length; INF^2 fits Long

  /** 1-D squared-distance lower envelope over f (Felzenszwalb), exact in
    * Long arithmetic: boundary s(p,q) = (f(p)+p^2-f(q)-q^2) / (2(p-q)) is
    * kept as a rational and compared by cross-multiplication. */
  private[operators] def dt1d(f: Array[Long]): Array[Long] = {
    val n = f.length
    val d = new Array[Long](n)
    val v = new Array[Int](n)
    val zn = new Array[Long](n + 1)
    val zd = new Array[Long](n + 1)
    var k = 0
    v(0) = 0
    zn(1) = Long.MaxValue / 4; zd(1) = 1
    var p = 1
    while (p < n) {
      var done = false
      while (!done) {
        val q = v(k)
        val num = f(p) + p.toLong * p - f(q) - q.toLong * q
        val den = 2L * (p - q) // p > q, so den > 0
        if (k > 0 && num * zd(k) <= zn(k) * den) k -= 1
        else {
          k += 1
          v(k) = p
          zn(k) = num; zd(k) = den
          zn(k + 1) = Long.MaxValue / 4; zd(k + 1) = 1
          done = true
        }
      }
      p += 1
    }
    k = 0
    var x = 0
    while (x < n) {
      while (zn(k + 1) < x.toLong * zd(k + 1)) k += 1
      val vp = v(k)
      d(x) = (x - vp).toLong * (x - vp) + f(vp)
      x += 1
    }
    d
  }

  /** dist2 to the nearest source for EVERY grid cell. `sources` carries
    * (row, col); output is (row, col, dist2) over the full nrows x ncols
    * grid. Requires at least one source. */
  def squared(sources: DataFrame, nrows: Int, ncols: Int): DataFrame = {
    val spark = sources.sparkSession
    import spark.implicits._
    val srcByRow = sources
      .select(col("row").cast("long").as("r"), col("col").cast("int").as("c"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (r, it) => (r, it.map(_._2).toArray.sorted) }
      .toDF("r", "cols")
    val g = spark.range(nrows).toDF("r")
      .join(srcByRow, Seq("r"), "left")
      .as[(Long, Option[Array[Int]])]
      .flatMap { case (r, cs) =>
        val g = Array.fill(ncols)(INF)
        cs.foreach(_.foreach(c => g(c) = 0L))
        var run = INF
        var c = 0
        while (c < ncols) { // left-to-right
          run = if (g(c) == 0L) 0L else math.min(run + 1, INF)
          g(c) = run
          c += 1
        }
        run = INF
        c = ncols - 1
        while (c >= 0) { // right-to-left
          run = if (g(c) == 0L) 0L else math.min(run + 1, INF)
          if (run < g(c)) g(c) = run
          c -= 1
        }
        (0 until ncols).iterator.map(c2 => (r, c2, g(c2)))
      }
    g.groupByKey(_._2)
      .flatMapGroups { (c, it) =>
        val f = Array.fill(nrows)(INF * INF)
        it.foreach { case (r, _, gv) => f(r.toInt) = gv * gv }
        val d = dt1d(f)
        (0 until nrows).iterator.map(r => (r.toLong, c.toLong, d(r)))
      }
      .toDF("row", "col", "dist2")
  }
}
