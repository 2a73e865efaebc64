package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the dissolve step shared by dedup clustering (near-dup pair graphs)
  * and any other id-graph grouping. Each round every node takes the min
  * of its own label and its neighbors' labels; fixpoint after
  * O(component diameter) rounds, each a shuffle of (id, label) pairs
  * only. Near-dup components are small by construction (a dup group),
  * so the loop converges in a couple of rounds at any corpus size; the
  * same code is Vectorize's seam-resolution shape (Vectorize keeps its
  * own driver-UF fast path for tiny seam graphs). */
object GraphOps {

  /** Hybrid entry point (the Vectorize seam-resolution shape): below
    * `driverLimit` edges a driver union-find resolves the components in
    * one bounded collect — near-dup pair graphs are sparse by nature, so
    * this is the common path and costs one O(#pairs) pass; above it the
    * fully distributed [[minLabelComponents]] loop runs with no driver
    * materialization anywhere. Both return (node, root = min node id). */
  def components(edges: DataFrame, aCol: String, bCol: String,
      driverLimit: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")).persist()
    val n = pairs.count()
    val out =
      if (n > driverLimit) minLabelComponents(pairs, "a", "b")
      else {
        val es = pairs.as[(Long, Long)].collect()
        val parent = scala.collection.mutable.LongMap[Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val nn = parent(c); parent(c) = r; c = nn }
          r
        }
        es.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        spark.createDataset(parent.keys.toSeq.map(k => (k, find(k))))
          .toDF("node", "root")
      }
    pairs.unpersist()
    out
  }

  /** `edges`: two long columns naming an undirected edge per row.
    * Returns (node, root) for every node appearing in `edges`, where
    * root is the component's minimum node id. */
  def minLabelComponents(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(aCol).as("n"), col(bCol).as("m"))
      .unionByName(edges.select(col(bCol).as("n"), col(aCol).as("m")))
      .distinct().persist(mem)
    // localCheckpoint every round, NOT persist: each round's plan embeds
    // the previous round's, so with plain caching the LOGICAL plan (and
    // catalyst analysis time) grows exponentially in the round count —
    // on graphs with diameter ~15+ the driver ends up spending minutes
    // in plan analysis. localCheckpoint truncates the lineage to a
    // materialized LogicalRDD, keeping every round's plan constant-size;
    // the checkpoint blocks are released by the ContextCleaner when the
    // superseded frames are collected.
    var labels = sym.select($"n").distinct().withColumn("lbl", $"n")
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val next = sym.join(labels.withColumnRenamed("n", "m")
            .withColumnRenamed("lbl", "nbLbl"), "m")
        .groupBy($"n").agg(min($"nbLbl").as("nbMin"))
        .join(labels, "n")
        .select($"n", least($"nbMin", $"lbl").as("lbl"),
          ($"nbMin" < $"lbl").cast("long").as("chg"))
        .localCheckpoint()
      val chgRow = next.agg(sum($"chg")).collect()(0)
      changed = if (chgRow.isNullAt(0)) 0L else chgRow.getLong(0) // null: no nodes
      labels = next.select($"n", $"lbl")
    }
    sym.unpersist()
    labels.select($"n".as("node"), $"lbl".as("root"))
  }
}
