package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.corpus.Synth
import graft.operators.TileOps

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cell_in_window rewrites to scan-prunable Z ranges (optimizer rule)") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("ext").toString + "/tiles"
    TileOps.tileGrid(spark, Synth.demRef, 6)(Synth.demValue)
      .write.mode("overwrite").parquet(dir)
    val pred = "cell_in_window(cellId, 20, 90, 30, 100, 6)"

    // rule OFF: the predicate stays a black box (interpreted eval)
    val naive = spark.read.parquet(dir).filter(expr(pred))
      .select("cellId").collect().map(_.getLong(0)).toSet
    assert(spark.read.parquet(dir).filter(expr(pred))
      .queryExecution.optimizedPlan.toString.contains("cellinwindow"))

    // rule ON (runtime injection; deployments use
    // spark.sql.extensions=graft.functions.GraftExtensions)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteCellWindowPredicates
    try {
      val df = spark.read.parquet(dir).filter(expr(pred))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.toLowerCase.contains("cellinwindow"))
      assert(optimized.contains(">=")) // range predicates present
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("PushedFilters") &&
        phys.contains("GreaterThanOrEqual(cellId"),
        s"ranges did not reach the scan:\n$phys")
      val rewritten = df.select("cellId").collect().map(_.getLong(0)).toSet
      assert(rewritten == naive)
      // ground truth: cover membership straight from CellId math
      val want = CellId.coverWindow(20, 90, 30, 100, 6).toSet
        .intersect(naiveAll(dir))
      assert(rewritten == want)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq RewriteCellWindowPredicates)
    }
  }

  private def naiveAll(dir: String): Set[Long] =
    spark.read.parquet(dir).select("cellId").collect().map(_.getLong(0)).toSet

  test("GraftExtensions injects functions + rule without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // registration contract holds
  }
}
