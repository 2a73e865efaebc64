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
    var labels = sym.select($"n").distinct().withColumn("lbl", $"n").persist(mem)
    var changed = 1L
    while (changed > 0) {
      val next = sym.join(labels.withColumnRenamed("n", "m")
            .withColumnRenamed("lbl", "nbLbl"), "m")
        .groupBy($"n").agg(min($"nbLbl").as("nbMin"))
        .join(labels, "n")
        .select($"n", least($"nbMin", $"lbl").as("lbl"),
          ($"nbMin" < $"lbl").cast("long").as("chg"))
        .persist(mem)
      val chgRow = next.agg(sum($"chg")).collect()(0)
      changed = if (chgRow.isNullAt(0)) 0L else chgRow.getLong(0) // null: no nodes
      val prev = labels
      labels = next.select($"n", $"lbl").persist(mem)
      labels.count() // materialize off the still-persisted `next` — else
      // unpersisting below would leave labels recomputing a growing
      // unpersisted lineage chain every round
      prev.unpersist()
      next.unpersist()
    }
    // hand back a localCheckpoint so the loop's cached frames can be
    // released now — the result's blocks live and die with the returned
    // DataFrame (ContextCleaner), not with this method's internals
    val out = labels.select($"n".as("node"), $"lbl".as("root")).localCheckpoint()
    labels.unpersist()
    sym.unpersist()
    out
  }
}
