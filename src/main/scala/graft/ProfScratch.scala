package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.corpus.Synth
import graft.operators.{CostDistance, Stencil, TileOps}

/** Throwaway phase profiler for optimization work (not driver protocol). */
object ProfScratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"[phase] $name ${(System.nanoTime() - t0) / 1e9}%.3fs")
    a
  }

  def main(args: Array[String]): Unit = {
    val s = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      coalesce = true)
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val tileRes = 6
    for (rep <- 1 to 3) {
      System.err.println(s"=== rep $rep ===")
      val tiles = t("demTiles") {
        TileOps.tileGrid(s, Synth.demRef, tileRes)(Synth.demValue)
      }
      val ref = Synth.demRef
      val distT = t("tilesDist") {
        val d = CostDistance.tilesDist(tiles, ref, tileRes, _ >= 240.0)
        d.count(); d
      }
      val bl = t("backlinkTiles+count") {
        val b = CostDistance.backlinkTiles(distT, tiles, ref, tileRes)
        b.count(); b
      }
      t("leastCostPath full") {
        CostDistance.leastCostPath(tiles, ref, tileRes, _ >= 240.0,
          targetRow = 200, targetCol = 150).count()
      }
    }
    s.stop()
  }
}
