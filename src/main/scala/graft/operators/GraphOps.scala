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

  /** Distributed PageRank by power iteration over a directed edge table —
    * the crawl-graph ranking op of a web-scale corpus pipeline (source
    * quality priors for curation). Per iteration ONE shuffle builds the
    * contribution table (rank/outdeg summed by dst) and one id-join
    * rebuilds the rank vector; `localCheckpoint` truncates lineage each
    * round so the plan stays constant-size over any iteration count
    * (same rationale as [[minLabelComponents]]). Dangling nodes (no
    * out-links) leak rank; the standard uniform redistribution is
    * applied — their mass is a single scalar agg over the checkpointed
    * rank vector, O(1) driver data per round. At 100 TB both the edge
    * table (joined once with outdegree and persisted) and the rank
    * vector shuffle on the node id only — no payload ever rides the
    * loop. Multi-edges contribute multiply, matching the multigraph
    * convention. Returns (node, pr) over all nodes appearing as src or
    * dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val spark = edges.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist(mem)
    val nodes = e.select($"src".as("id"))
      .unionByName(e.select($"dst".as("id"))).distinct().persist(mem)
    val n = nodes.count()
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src").persist(mem)
    val teleport = (1.0 - damping) / n
    // the dangling-node SET is iteration-invariant — compute it once;
    // only its rank MASS changes per round. The mass is a 1-row scalar
    // subquery CROSS-JOINED into the next rank plan (broadcast of one
    // row), NOT collected to the driver: the fixed-iteration loop then
    // builds ONE lazy plan with zero per-round actions — every round's
    // shuffle runs inside the single job of whichever action consumes
    // the result (guide §2.4/§5: no driver round-trips in query paths).
    val dangIds = nodes
      .join(deg.select($"src".as("id")), Seq("id"), "left_anti")
      .persist(mem)
    // localCheckpoint(eager = false): the catalyst plan is truncated to a
    // LogicalRDD immediately (constant-size plans per round), but no job
    // runs now — the RDD chain materializes, and caches, inside the
    // first consuming action.
    var ranks = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val dang = ranks.join(dangIds, Seq("id"), "left_semi")
        .agg(coalesce(sum($"pr"), lit(0.0)).as("_dang"))
      val contribs = ed.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst").agg(sum($"pr" / $"outdeg").as("c"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select($"id", (lit(teleport) + lit(damping) *
          (coalesce($"c", lit(0.0)) + $"_dang" / n)).as("pr"))
        .localCheckpoint(false)
    }
    // ONE eager materialization of the whole iteration chain (every lazy
    // checkpoint above caches during this job), then the parents can
    // release their blocks safely.
    val out = ranks.select($"id".as("node"), $"pr").localCheckpoint(true)
    e.unpersist(); ed.unpersist(); nodes.unpersist(); dangIds.unpersist()
    out
  }

  /** PERSONALIZED PageRank — random walk with restart to a SOURCE set
    * (the seed-biased proximity prior: recommendation, crawl frontier
    * scoring, related-document ranking): teleports land ONLY on
    * `sources`, so ranks measure proximity to the seeds instead of
    * global centrality; dangling mass also restarts to the sources.
    * Identical plan shape to [[pageRank]] — per iteration ONE
    * contribution shuffle on dst + one id join, dangling set computed
    * once, localCheckpoint'd constant-size plans. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"personalizedPageRank: iters must be >= 1, got $iters")
    require(sources.nonEmpty, "personalizedPageRank: sources must be non-empty")
    val spark = edges.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val srcSet = sources.distinct
    val k = srcSet.size
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist(mem)
    val nodes = e.select($"src".as("id"))
      .unionByName(e.select($"dst".as("id"))).distinct().persist(mem)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src").persist(mem)
    val dangIds = nodes
      .join(deg.select($"src".as("id")), Seq("id"), "left_anti")
      .persist(mem)
    val isSrc = $"id".isInCollection(srcSet)
    // same single-lazy-plan iteration discipline as [[pageRank]]: the
    // dangling mass rides a broadcast 1-row scalar, rounds add zero
    // driver actions, and one eager checkpoint at the end materializes
    // the whole chain before the parents unpersist.
    var ranks = nodes
      .withColumn("pr", when(isSrc, lit(1.0 / k)).otherwise(lit(0.0)))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val dang = ranks.join(dangIds, Seq("id"), "left_semi")
        .agg(coalesce(sum($"pr"), lit(0.0)).as("_dang"))
      val contribs = ed.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst").agg(sum($"pr" / $"outdeg").as("c"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select($"id",
          (when(isSrc,
            lit((1.0 - damping) / k) + lit(damping) * ($"_dang" / k))
            .otherwise(lit(0.0))
            + lit(damping) * coalesce($"c", lit(0.0))).as("pr"))
        .localCheckpoint(false)
    }
    val out = ranks.select($"id".as("node"), $"pr").localCheckpoint(true)
    e.unpersist(); ed.unpersist(); nodes.unpersist(); dangIds.unpersist()
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
    // lazy checkpoints: the convergence-check agg below is the ONLY job
    // per round — it materializes (and caches) the round's checkpoint as
    // a side effect, halving the round cost vs eager checkpoint + agg
    var labels = sym.select($"n").distinct().withColumn("lbl", $"n")
      .localCheckpoint(false)
    var changed = 1L
    while (changed > 0) {
      val next = sym.join(labels.withColumnRenamed("n", "m")
            .withColumnRenamed("lbl", "nbLbl"), "m")
        .groupBy($"n").agg(min($"nbLbl").as("nbMin"))
        .join(labels, "n")
        .select($"n", least($"nbMin", $"lbl").as("lbl"),
          ($"nbMin" < $"lbl").cast("long").as("chg"))
        .localCheckpoint(false)
      val chgRow = next.agg(sum($"chg")).collect()(0)
      changed = if (chgRow.isNullAt(0)) 0L else chgRow.getLong(0) // null: no nodes
      labels = next.select($"n", $"lbl")
    }
    sym.unpersist()
    labels.select($"n".as("node"), $"lbl".as("root"))
  }

  /** Multi-source BFS hop distance over DIRECTED edges: for every node
    * reachable from `sources`, the minimum hop count from the nearest
    * source (the graph analog of the raster distance transform r42 —
    * link-graph crawl depth, influence radius, taint propagation).
    * Same iteration discipline as [[minLabelComponents]]: one
    * relax-join + one improvement agg per round, localCheckpoint each
    * round so the plan stays constant-size; rounds = eccentricity of
    * the source set, shuffle carries (id, dist) pairs only. Unreached
    * nodes are absent from the result (never a sentinel). Returns
    * (node, dist). */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long]): DataFrame = {
    require(sources.nonEmpty, "bfsDistances: no sources")
    val spark = edges.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val INF = Long.MaxValue
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist(mem)
    // node universe includes the seeds themselves: a source with no
    // incident edges is still at distance 0 (matches the recursive-CTE
    // oracle, which seeds every source unconditionally)
    val nodes = e.select($"src".as("id"))
      .unionByName(e.select($"dst".as("id")))
      .unionByName(spark.createDataset(sources).toDF("id"))
      .distinct()
    // lazy checkpoints + one convergence agg per round (see
    // [[minLabelComponents]]): one job per relax round, not two
    var dist = nodes
      .select($"id", when($"id".isin(sources: _*), 0L).otherwise(INF).as("d"))
      .localCheckpoint(false)
    var changed = 1L
    while (changed > 0) {
      val relax = e
        .join(dist.withColumnRenamed("id", "src").withColumnRenamed("d", "ds"),
          "src")
        .filter($"ds" =!= INF)
        .groupBy($"dst").agg(min($"ds" + 1).as("cand"))
        .withColumnRenamed("dst", "id")
      val next = dist.join(relax, Seq("id"), "left")
        .select($"id",
          least($"d", coalesce($"cand", lit(INF))).as("d"),
          (coalesce($"cand", lit(INF)) < $"d").cast("long").as("chg"))
        .localCheckpoint(false)
      val chgRow = next.agg(sum($"chg")).collect()(0)
      changed = if (chgRow.isNullAt(0)) 0L else chgRow.getLong(0)
      dist = next.select($"id", $"d")
    }
    e.unpersist()
    dist.filter($"d" =!= INF).select($"id".as("node"), $"d".as("dist"))
  }

  /** Distributed triangle counting over an undirected edge table — the
    * clustering-coefficient / community-density primitive of link-graph
    * curation (a crawl page whose neighborhood closes many triangles is
    * inside a dense site cluster; spam farms and link rings light up the
    * same way). Returns (node, n_tri) for every node on >= 1 triangle.
    *
    * Shape for 100 TB: the naive wedge join explodes at hub nodes
    * (a degree-d node yields d^2/2 wedges, and web graphs have d up to
    * 10^7), so edges are first ORIENTED from the lower-(degree, id)
    * endpoint to the higher — the classic degree-ordered orientation
    * under which every vertex's OUT-degree is O(sqrt(m)) regardless of
    * its raw degree, bounding the wedge fan-out per node and making the
    * two equi-joins (wedge build on the shared source, wedge close on
    * the far pair) skew-safe. Each triangle is found exactly once, at
    * its minimum-(degree, id) corner. Ordering keys are compared as
    * (deg, id) STRUCTS, never folded into an arithmetic key, so there is
    * no overflow ceiling on degree or id. Self-loops and duplicate /
    * reversed edges are canonicalized away first.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where($"a" =!= $"b" && $"a".isNotNull && $"b".isNotNull)
      .distinct()
    val deg = und.select(explode(array($"a", $"b")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    // (deg, id) total order as a struct key — no arithmetic packing
    val keyed = deg.select($"node", struct($"deg", $"node").as("okey"))
    val both = und
      .join(keyed.select($"node".as("a"), $"okey".as("ka")), "a")
      .join(keyed.select($"node".as("b"), $"okey".as("kb")), "b")
    val oriented = both.select(
        when($"ka" < $"kb",
          struct($"a".as("u"), $"b".as("v"), $"kb".as("kv")))
        .otherwise(struct($"b".as("u"), $"a".as("v"), $"ka".as("kv"))).as("e"))
      .select($"e.u".as("u"), $"e.v".as("v"), $"e.kv".as("kv"))
      .persist(mem)
    oriented.count() // materialize once; reused by wedge build AND close
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.kv") < col("y.kv"))
      .select(col("x.u").as("u"), col("x.v").as("v1"), col("y.v").as("v2"))
    // close the wedge: (v1, v2) with key(v1) < key(v2) is oriented v1->v2
    val tris = wedges.join(
        oriented.select($"u".as("v1"), $"v".as("v2")), Seq("v1", "v2"))
      .select($"u", $"v1", $"v2")
    val out = tris.select(explode(array($"u", $"v1", $"v2")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("n_tri"))
    val res = out.localCheckpoint()
    oriented.unpersist()
    res
  }

  /** Distributed k-CORE membership: peel nodes of degree < k until a
    * fixpoint — the density filter of link-graph curation (a page
    * survives iff it sits in a subgraph where EVERY member keeps >= k
    * in-core neighbors; spam periphery, dangling chains and ladder
    * tails unravel away round by round). Returns the surviving nodes
    * with their in-core degree: (node, core_deg).
    *
    * Shape for 100 TB: each peel round is ONE degree aggregation
    * (explode + groupBy, map-side combined) and TWO anti-joins of the
    * edge table against the just-peeled node set — no windows, no
    * driver data beyond the per-round convergence counter, and
    * localCheckpoint truncates lineage so the plan stays constant-size
    * over any round count. Rounds are bounded by the graph's peel depth
    * (the longest cascade that must unravel) — the same
    * iterate-to-fixpoint family as fill_sinks and pageRank. Self-loops
    * and duplicate/reversed edges canonicalize away first. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where($"a" =!= $"b" && $"a".isNotNull && $"b".isNotNull)
      .distinct()
      .localCheckpoint(false)
    var peeled = 1L
    while (peeled > 0) {
      // lazy checkpoints: bad.count() is the round's single job — it
      // materializes bad (and, transitively, the previous round's peeled
      // edge table) as a side effect
      val bad = e.select(explode(array($"a", $"b")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
        .filter($"deg" < k).select($"node")
        .localCheckpoint(false)
      peeled = bad.count()
      if (peeled > 0) {
        e = e.join(bad.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint(false)
      }
    }
    e.select(explode(array($"a", $"b")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("core_deg"))
  }
}
