package graft

/** Stage-split profiling harness for the bench pipeline (not part of the
  * driver protocol): runs the pipeline with per-branch timings at one
  * parallelism level. Usage: runMain graft.BenchStage <cpus> [reps]
  * with SPARK_GRAFT_BENCH_DEBUG=1 to get the [stage] lines. */
object BenchStage {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val nTiles = 16384L
    val gridW = 32
    val corpusPath = s"/dev/shm/graft_bench_corpus_$nTiles"
    val s = Bench.session(cpus)
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists())
      corpus.ImageCorpus.generate(s, nTiles, gridW)
        .write.mode("overwrite").parquet(corpusPath)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      Bench.pipeline(s, corpusPath, nTiles, gridW)
      System.err.println(f"[rep $r] total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    s.stop()
  }
}
