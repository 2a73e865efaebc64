package graft

/** Per-query profiling harness (not part of the driver protocol): run one
  * or more SparkEntry queries repeatedly in a single session and print
  * wall times, to separate genuine query cost from session/GC noise.
  * Usage: runMain graft.QueryProf <sfDir> <reps> <query>[,<query>...] */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // coalesce=true matches the Bench QUERY session exactly — numbers
    // here must be comparable to the bench's per-query table
    val s = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      coalesce = true)
    s.sparkContext.setLogLevel("WARN")
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(s, sfDir).count()
      System.err.println(
        f"[prof] $name rep $r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    s.stop()
  }
}
