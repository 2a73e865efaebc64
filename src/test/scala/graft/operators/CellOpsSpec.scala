package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CellId

class CellOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compactCells == driver CellId.compact on random res-0 sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // random subset of a 16x16 lattice, plus one guaranteed-full 4x4
    // block so multi-level merging definitely triggers
    val picked = (for (x <- 0 until 16; y <- 0 until 16
      if rnd.nextBoolean() || (x < 4 && y < 4))
      yield CellId.encode(0, x.toLong, y.toLong)).toArray
    val want = CellId.compact(picked).toSet
    val got = CellOps.compactCells(picked.toSeq.toDF("cell"), "cell")
      .as[Long].collect().toSet
    assert(got == want,
      s"diff: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
    assert(got.exists(id => CellId.res(id) >= 2)) // real multi-level merge
    // duplicates in the input are dropped, not double-counted into a
    // phantom complete parent
    val dup = (picked ++ picked.take(7)).toSeq.toDF("cell")
    assert(CellOps.compactCells(dup, "cell").as[Long].collect().toSet == want)
    // an already-compact mixed-res set is a fixpoint
    val again = CellOps.compactCells(want.toSeq.toDF("cell"), "cell")
      .as[Long].collect().toSet
    assert(again == want)
  }

  test("uncompactCells inverts compactCells; rejects finer-than-target") {
    import spark.implicits._
    val base = (for (x <- 0 until 12; y <- 0 until 9)
      yield CellId.encode(0, x.toLong, y.toLong)).toSet
    val compacted = CellOps.compactCells(base.toSeq.toDF("cell"), "cell")
    assert(compacted.count() < base.size) // it actually compacted
    val round = CellOps.uncompactCells(compacted, "cell", 0)
      .as[Long].collect()
    assert(round.length == round.distinct.length) // disjoint blocks
    assert(round.toSet == base)
    // pass-through at the same res
    val same = CellOps.uncompactCells(
        Seq(CellId.encode(2, 1, 1)).toDF("cell"), "cell", 2)
      .as[Long].collect().toSeq
    assert(same == Seq(CellId.encode(2, 1, 1)))
    // a res-1 cell cannot be "expanded" to res 3
    val ex = intercept[Exception] {
      CellOps.uncompactCells(
        Seq(CellId.encode(1, 0, 0)).toDF("cell"), "cell", 3)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
