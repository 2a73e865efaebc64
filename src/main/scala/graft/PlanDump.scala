package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to individual files —
  * the optimization-round before/after plan evidence
  * (plans/r06/<query>_<tag>.txt). Not part of the driver protocol.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r06")
    val tag = args.lift(2).getOrElse("before")
    val names = args.lift(3).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val s = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      coalesce = true)
    s.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(s, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
        System.err.println(s"[plan] $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $name FAILED: ${e.getMessage}")
      }
    }
    s.stop()
  }
}
