package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("minLabelComponents: chains, singleton-pair, min-id roots") {
    import spark.implicits._
    // component {1,2,3,4,5} as a chain (diameter forces >1 round, with
    // the min at one END so propagation must traverse the full chain),
    // component {10, 11}, component {20, 21, 22} as a triangle
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("a", "b")
    val got = GraphOps.minLabelComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }
}
