package graft.core

/** Compact static 2-D k-d tree over (x, y, value, id) points, built once per
  * partition inside mapPartitions/cogroup kernels (the engine's kNN-serve
  * structure per the north star; scipy cKDTree analogue of the reference's
  * griddata-nearest, Raster.py:409-429).
  *
  * Ties on squared distance break toward the LOWEST point id, matching the
  * RefKernel oracle and giving deterministic results under any build order.
  * Arrays are index-permuted in place at build; queries are allocation-free.
  */
final class KdTree private (
    xs: Array[Double], ys: Array[Double], vs: Array[Double], ids: Array[Long]) {

  private val n = xs.length

  /** Nearest neighbor: returns (id, value, d2). n must be > 0. */
  def nearest(qx: Double, qy: Double): (Long, Double, Double) = {
    var bestD2 = Double.MaxValue
    var bestId = Long.MaxValue
    var bestV = Double.NaN

    def visit(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (lo > hi) return
      val mid = (lo + hi) >>> 1
      val dx = xs(mid) - qx
      val dy = ys(mid) - qy
      val d2 = dx * dx + dy * dy
      if (d2 < bestD2 || (d2 == bestD2 && ids(mid) < bestId)) {
        bestD2 = d2
        bestId = ids(mid)
        bestV = vs(mid)
      }
      val diff = if (axisX) qx - xs(mid) else qy - ys(mid)
      val (nearLo, nearHi, farLo, farHi) =
        if (diff < 0) (lo, mid - 1, mid + 1, hi) else (mid + 1, hi, lo, mid - 1)
      visit(nearLo, nearHi, !axisX)
      if (diff * diff <= bestD2) visit(farLo, farHi, !axisX)
    }

    visit(0, n - 1, axisX = true)
    (bestId, bestV, bestD2)
  }

  /** k nearest, ordered by (d2, id) ascending. */
  def knn(qx: Double, qy: Double, k: Int): Array[(Long, Double, Double)] = {
    // small-k bounded insertion "heap" (sorted array)
    val heapD = Array.fill(k)(Double.MaxValue)
    val heapId = Array.fill(k)(Long.MaxValue)
    val heapV = new Array[Double](k)
    var size = 0

    def worse(i: Int, d2: Double, id: Long): Boolean =
      heapD(i) > d2 || (heapD(i) == d2 && heapId(i) > id)

    def offer(d2: Double, id: Long, v: Double): Unit = {
      if (size < k || worse(k - 1, d2, id)) {
        var i = math.min(size, k - 1)
        while (i > 0 && worse(i - 1, d2, id)) {
          heapD(i) = heapD(i - 1); heapId(i) = heapId(i - 1); heapV(i) = heapV(i - 1)
          i -= 1
        }
        heapD(i) = d2; heapId(i) = id; heapV(i) = v
        if (size < k) size += 1
      }
    }

    def visit(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (lo > hi) return
      val mid = (lo + hi) >>> 1
      val dx = xs(mid) - qx
      val dy = ys(mid) - qy
      offer(dx * dx + dy * dy, ids(mid), vs(mid))
      val diff = if (axisX) qx - xs(mid) else qy - ys(mid)
      val (nearLo, nearHi, farLo, farHi) =
        if (diff < 0) (lo, mid - 1, mid + 1, hi) else (mid + 1, hi, lo, mid - 1)
      visit(nearLo, nearHi, !axisX)
      if (size < k || diff * diff <= heapD(size - 1)) visit(farLo, farHi, !axisX)
    }

    visit(0, n - 1, axisX = true)
    (0 until size).map(i => (heapId(i), heapV(i), heapD(i))).toArray
  }

  def size: Int = n
}

object KdTree {

  /** Build by recursive median split (alternating axes), copying inputs. */
  def build(points: Array[(Long, Double, Double, Double)]): KdTree = {
    val n = points.length
    val idx = points.indices.toArray
    val xs = points.map(_._2)
    val ys = points.map(_._3)

    def sortRange(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (lo >= hi) return
      val sorted = idx.slice(lo, hi + 1).sortBy(i => if (axisX) (xs(i), ys(i), points(i)._1) else (ys(i), xs(i), points(i)._1))
      System.arraycopy(sorted, 0, idx, lo, sorted.length)
      val mid = (lo + hi) >>> 1
      sortRange(lo, mid - 1, !axisX)
      sortRange(mid + 1, hi, !axisX)
    }

    sortRange(0, n - 1, axisX = true)
    new KdTree(
      idx.map(xs), idx.map(ys),
      idx.map(i => points(i)._4), idx.map(i => points(i)._1))
  }
}
