package graft

import graft.corpus.ImageCorpus

/** Throwaway phase profiler for optimization work (not driver protocol). */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROF_TILES", "16384").toLong
    val gridW = 32
    val s = Bench.session(32)
    s.sparkContext.setLogLevel("WARN")
    val corpusPath = s"/dev/shm/graft_bench_corpus_$n"
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists())
      ImageCorpus.generate(s, n, gridW).write.mode("overwrite").parquet(corpusPath)
    // JIT warm like the bench does
    Bench.pipeline(s, corpusPath, n, gridW)
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      Bench.pipeline(s, corpusPath, n, gridW)
      System.err.println(f"[pipe] rep $rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    s.stop()
  }
}
