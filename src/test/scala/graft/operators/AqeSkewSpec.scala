package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The north rule requires BOTH skew defenses to be explicit and
  * observable: (a) salting of hot cells — `Rasterize.autoSalt`, gated by
  * the salted==plain OperatorSpec tests — and (b) AQE skew-join
  * splitting. This spec makes (b) observable: a deliberately skewed
  * sort-merge join (one hot key carrying ~1000x the rows of every other
  * key) must come back from AQE with the hot partition SPLIT
  * (`skew=true` on the SortMergeJoin node) and the join result must stay
  * exactly correct under the split. */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the hot partition of a skewed tile<->feature join (skew=true), result exact") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true") // explicit per north rule
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge

      // hot cell 0: 200k rows; cells 1..49: 100 rows each — the shape of a
      // burn join whose one urban cell holds most of the vector features
      val pad = "x" * 48
      val tiles = spark.range(0, 200000 + 49 * 100).map { i =>
        val cell = if (i < 200000) 0L else 1L + (i - 200000) / 100
        (cell, i, pad)
      }.toDF("cell_id", "seq", "payload")
      val feats = spark.range(0, 50).map(c => (c, s"feat-$c")).toDF("cell_id", "name")

      // materialize THROUGH the df so its own AdaptiveSparkPlan finalizes
      // (count()/groupBy() would spawn separate query executions and the
      // inspected plan would stay isFinalPlan=false)
      val joined = tiles.join(feats, "cell_id")
      val rows = joined.collect().map(_.getAs[Long]("cell_id"))
      assert(rows.length == 200000 + 49 * 100)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed SMJ partition as split:\n$plan")

      // correctness under the split: per-key counts survive exactly
      val counts = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(counts(0L) == 200000L)
      (1L to 49L).foreach(c => assert(counts(c) == 100L, s"cell $c"))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
