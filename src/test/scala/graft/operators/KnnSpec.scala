package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth
import scala.util.Random

class KnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def fixturePts: Array[(Long, Double, Double, Double)] = Synth.knnPoints

  test("KdTree nearest matches linear scan with (d2, id) tie-break") {
    val rnd = new Random(11)
    val pts = (0L until 200L).map(i =>
      (i, rnd.nextInt(100) * 0.5, rnd.nextInt(100) * 0.5, i * 1.0)).toArray
    val tree = KdTree.build(pts)
    (1 to 500).foreach { _ =>
      val qx = rnd.nextInt(200) * 0.25
      val qy = rnd.nextInt(200) * 0.25
      val want = pts.map { case (id, x, y, v) =>
        (( (x - qx) * (x - qx) + (y - qy) * (y - qy)), id, v)
      }.minBy(t => (t._1, t._2))
      val (gid, gv, gd2) = tree.nearest(qx, qy)
      assert((gd2, gid, gv) == ((want._1, want._2, want._3)), s"q=($qx,$qy)")
    }
  }

  test("KdTree knn(k) ordered by (d2, id)") {
    val pts = (0L until 50L).map(i => (i, (i % 10) * 1.0, (i / 10) * 1.0, i * 1.0)).toArray
    val tree = KdTree.build(pts)
    val got = tree.knn(4.5, 2.5, 5)
    val want = pts.map { case (id, x, y, v) =>
      ((x - 4.5) * (x - 4.5) + (y - 2.5) * (y - 2.5), id, v)
    }.sortBy(t => (t._1, t._2)).take(5)
    assert(got.map(g => (g._3, g._1)).sameElements(want.map(w => (w._1, w._2))))
  }

  test("bucketed kNN == brute force == RefKernel on the fixture") {
    import spark.implicits._
    val pts = spark.createDataset(fixturePts.map(p => PtRec(p._1, p._2, p._3, p._4)))
    val brute = Knn.nearestBrute(spark, pts, Synth.knnRef)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val bucketed = Knn.nearestBucketed(spark, pts, Synth.knnRef, res = 5, ringK = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(bucketed.size == Synth.knnRef.numCells)
    assert(bucketed == brute)
    val oracle = RefKernel.nearestInterp(Synth.knnRef,
      fixturePts.map(_._2), fixturePts.map(_._3), fixturePts.map(_._4))
    bucketed.foreach { case ((r, c), (v, _)) =>
      assert(v == oracle(r, c), s"cell ($r,$c)")
    }
  }
}
