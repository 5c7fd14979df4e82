package graft.queries

import graft.ops.Persist.PersistOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational data: PageRank (Page et al. 1999)
  * on the nation-level trade graph derived from
  * customer→order→lineitem→supplier.
  *
  * Edge derivation is itself a showcase query: a 4-way join rolls
  * line-level trade up to (customer_nation → supplier_nation) counts,
  * and an edge survives if its count clears 625/550 ≈ 1.14x the mean
  * share (`cnt * 550 >= total` — scale-invariant integer compare, no
  * float ratio). That keeps the graph genuinely sparse at every SF
  * (233 of 625 pairs at sf0.01, 114 at sf0.1) instead of the complete
  * graph the raw join produces.
  *
  * Determinism: ranks are integers scaled by 1e6. Each round is
  * rank' = 150000 + 850 * sum(rank_src DIV outdeg_src) DIV 1000 — the
  * standard d=0.85 update with every division integral, so the
  * cross-engine hash can't drift on float summation order. Dangling
  * nodes (no outgoing edge) simply leak rank, the classic simplified
  * formulation; nodes with no INCOMING edge settle at the 150000
  * floor.
  *
  * Scale: each iteration is one join of the edge list with the rank
  * vector plus one aggregate — the textbook distributed PageRank shape
  * (edges partition by src; ranks are the small side and broadcast
  * here). Five fixed iterations keep the gate deterministic; a
  * convergence-driven loop would `localCheckpoint` per round like
  * ConnectedComponents.resolve does.
  */
object GraphQueries {
  import RefQueries.table

  private val Iters = 5

  /** Memo for the cached edge DataFrames, keyed (session, sfDir,
    * weighted). Without it every call cached a FRESH copy of the same
    * ≤625-row derivation and never unpersisted it, so bench sweeps and
    * repeated query runs accumulated dead cached RDDs. One retained
    * entry per live (session, sfDir) pair is bounded and tiny, and it
    * lets all seven graph queries share one materialization per sweep.
    */
  private val edgeMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Boolean), DataFrame]()

  /** One eviction listener per session with live memo entries, so the
    * static map is bounded by LIVE sessions: on application end
    * (`spark.stop()`), every entry keyed by that session is dropped —
    * a harness cycling sessions otherwise retains edge frames whose
    * contexts are dead for the JVM lifetime (r14 VERDICT item 6). The
    * map doubles as the has-a-hook-been-installed guard; the spec
    * fires the registered listener directly (the context-stop EVENT
    * delivery is Spark's contract; the eviction body is ours to pin —
    * stopping the suite's one shared local context would kill every
    * later test in the JVM).
    */
  private[graft] val memoListeners = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, org.apache.spark.scheduler.SparkListener]()

  /** Drop `spark`'s memo entries (and their cached blocks, when the
    * context is still alive — on a genuinely stopped context the
    * blocks died with it and unpersist would be a dead call). Returns
    * the number evicted. The listener body; package-visible so the
    * spec can pin it against the real registered instance.
    */
  private[graft] def evictEdgeMemo(spark: SparkSession): Int = {
    var n = 0
    val it = edgeMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        // per-entry guard: this runs on the listener-bus thread during
        // context stop, where isStopped can flip between the check and
        // the unpersist (teardown race) — one entry's failure must not
        // abort the sweep and pin the REMAINING entries for the JVM
        // lifetime (the exact retention this eviction exists to prevent)
        try {
          if (!spark.sparkContext.isStopped)
            e.getValue.unpersist(blocking = false)
        } catch { case scala.util.control.NonFatal(_) => () }
        it.remove(); n += 1
      }
    }
    // drop the listener from the shared context's bus too (when the
    // context is still alive — the spec's simulated fire, or any future
    // non-app-end eviction): an evict + re-use cycle would otherwise
    // accumulate one dead listener per cycle for the context lifetime
    val l = memoListeners.remove(spark)
    try {
      if (l != null && !spark.sparkContext.isStopped)
        spark.sparkContext.removeSparkListener(l)
    } catch { case scala.util.control.NonFatal(_) => () }
    n
  }

  /** Memoize one derived edge frame per (session, sfDir, weighted),
    * installing the session's eviction listener on first use and
    * sweeping entries whose context already stopped (covers a session
    * stopped before its listener registration completed).
    */
  private def memoEdges(spark: SparkSession, sfDir: String,
      weighted: Boolean)(derive: => DataFrame): DataFrame = {
    memoListeners.computeIfAbsent(spark, s => {
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evictEdgeMemo(s); ()
        }
      }
      s.sparkContext.addSparkListener(l)
      l
    })
    edgeMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // the listener map must not retain dead sessions either (a context
    // stopped without its ApplicationEnd reaching our listener — e.g.
    // a dropped AsyncEventQueue event — would otherwise pin the
    // session object here for the JVM lifetime)
    memoListeners.keySet.removeIf(s => s.sparkContext.isStopped)
    val frame = edgeMemo.computeIfAbsent((spark, sfDir, weighted), _ => derive)
    // re-cache on hit: harness sweeps (Verify/Bench run clearCache per
    // query) uncache the memo's one sanctioned CacheManager entry, and
    // without this every later graph query would re-run the 4-way
    // derivation once per plan reference — the exact recompute the
    // memo exists to prevent. This also self-heals the shared-plan
    // seam: sessions of one context share the CacheManager by
    // canonicalized plan, so another session's eviction uncaching the
    // shared entry costs one re-cache here, never a silent recompute.
    if (!org.apache.spark.sql.graft.Bridge.isPlanCached(frame)) frame.cache()
    frame
  }

  /** Spec probe: memo entries held for `spark`. */
  private[graft] def edgeMemoEntryCount(spark: SparkSession): Int = {
    var n = 0
    edgeMemo.keySet.forEach(k => if (k._1 eq spark) n += 1)
    n
  }

  /** Shared edge derivation: line-level trade rolled up to
    * (customer_nation → supplier_nation), thresholded to keep the
    * graph sparse (see object scaladoc). Cached, never unpersisted:
    * the returned plans reference it from several joins deep, so
    * dropping the blocks would force the 4-way join to re-run per
    * reference when the caller finally executes. <= 625 rows — the
    * session keeps it (one copy per (session, sfDir) via [[edgeMemo]],
    * evicted when the session's context ends).
    */
  private[graft] def tradeEdges(spark: SparkSession, sfDir: String): DataFrame =
    memoEdges(spark, sfDir, weighted = false)(deriveTradeEdges(spark, sfDir))

  /** Spec access to the directed edge list (bounded ≤625 rows) so
    * brute-force graph recomputes pin the SAME derivation the
    * operators run on, not a reimplementation that could drift.
    */
  private[graft] def tradeEdgesForSpec(spark: SparkSession,
      sfDir: String): Array[(Long, Long)] =
    tradeEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private def deriveTradeEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("src"))
    val li = table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val supp = table(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("dst"))

    val counted = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    // total via a 1-row cross join: never collected to the driver
    val total = counted.agg(sum("cnt").as("tot"))
    counted.crossJoin(broadcast(total))
      .where(col("cnt") * 550 >= col("tot"))
      .select("src", "dst")
      .cache()
  }

  /** [[tradeEdges]] with the trade count kept as the edge WEIGHT —
    * same derivation, same threshold, for the weighted-propagation
    * operators. Cached for the same multi-reference reason, memoized
    * per (session, sfDir) like the unweighted variant.
    */
  private def tradeEdgesWeighted(spark: SparkSession, sfDir: String): DataFrame =
    memoEdges(spark, sfDir, weighted = true)(
      deriveTradeEdgesWeighted(spark, sfDir))

  private def deriveTradeEdgesWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("src"))
    val li = table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val supp = table(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("dst"))
    val counted = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val total = counted.agg(sum("cnt").as("tot"))
    counted.crossJoin(broadcast(total))
      .where(col("cnt") * 550 >= col("tot"))
      .select("src", "dst", "cnt")
      .cache()
  }

  /** The counted/edges CTE pair shared by every graph oracle.
    *
    * TWIN DOCTRINE (learned the hard way, twice): DuckDB inlines CTEs
    * by default, so any CTE referenced more than once PER LEVEL of an
    * unrolled iteration multiplies the re-derivation of everything
    * beneath it — the expansion is exponential in the round count
    * (betweenness: measured OOM at 100 GiB; eigenvector: killed at
    * 21 GB / 21 CPU-min, 0.87 s materialized; ktruss: 57.7 GB RSS).
    * Every round CTE with >1 reference per level MUST carry
    * `AS MATERIALIZED`. `counted` (self-referenced by the scalar SUM)
    * and `edges` (referenced 1-3× by downstream CTEs) are materialized
    * here so no twin ever re-runs the 4-way lineitem join.
    */
  private val EdgeCtes =
    """counted AS MATERIALIZED (
      |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
      |         CAST(s.s_nationkey AS BIGINT) AS dst,
      |         COUNT(*) AS cnt
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), edges AS MATERIALIZED (
      |  SELECT src, dst FROM counted
      |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted)
      |)""".stripMargin

  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    pagerank(nodes, edges, Iters)
      .select(col("node").as("nationkey"), col("rank"))
      .orderBy(desc("rank"), col("nationkey"))
  }

  /** `graph_triangles` — per-node triangle counts on the undirected
    * trade graph: the standard clustering/community signal (a node in
    * many triangles sits in a dense trading bloc).
    *
    * Algorithm: canonicalize to a < b once (each undirected edge
    * stored a single time), then the ordered two-path join
    * (a<b<c: e1=(a,b), e2=(b,c)) closed against e3=(a,c) counts every
    * triangle EXACTLY once — the node-ordering trick that keeps the
    * join from producing each triangle 6×. Per-node counts fall out by
    * exploding the 3 corners.
    *
    * Scale: this is the textbook distributed triangle count (node-
    * iterator with ordering); the joins key on single node ids, so at
    * real graph scale they hash-partition by vertex and the hot-vertex
    * mitigation is the same degree-ordering already applied (high-
    * degree nodes appear mostly as the 'c' side). Here the edge list is
    * dimension-sized and broadcast.
    */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val e1 = und
    val e2 = und.select(col("a").as("b2"), col("b").as("c"))
    val e3 = und.select(col("a").as("a3"), col("b").as("c3"))
    val tri = e1
      .join(broadcast(e2), col("b") === col("b2"))
      .join(broadcast(e3), col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    val corners = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("nationkey"))
      .join(broadcast(corners),
        col("nationkey") === col("node"), "left")
      .select(col("nationkey"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("nationkey")
  }

  val graphTrianglesSql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), tri AS MATERIALIZED (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |), corners AS MATERIALIZED (
       |  SELECT a AS node FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri
       |), cnt AS (
       |  SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
       |)
       |SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey,
       |       COALESCE(c.n_triangles, 0) AS n_triangles
       |FROM nation n LEFT JOIN cnt c ON c.node = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY nationkey""".stripMargin

  /** Core fixed-iteration integer PageRank: `nodes(node)`,
    * `edges(src, dst)` → `(node, rank)` with rank scaled by 1e6.
    */
  /** The rank vector is |nodes| rows by construction, so it (and the
    * per-node contribution/degree frames) broadcast EXPLICITLY — the
    * planner can't see through five iterations of joins to infer that,
    * and falling back to sort-merge would shuffle the edge list every
    * round. At web scale where ranks outgrow a broadcast, the hint
    * changes to ranks and edges co-partitioned on src (one shuffle to
    * establish, zero per iteration) — same algebra, different hint.
    *
    * Fully distributed: the rank vector lives in executor storage as a
    * localCheckpoint'd DataFrame for the whole loop — NOTHING is
    * collected to the driver between iterations (earlier rounds held
    * the vector driver-side, which is a bottleneck the moment ranks
    * outgrow one heap). Each round is one distributed job:
    * edges ⋈ broadcast(rank DIV outdeg) → partial+final agg to |nodes|
    * groups → left-join nodes → checkpoint the new vector.
    * localCheckpoint (not cache) truncates lineage so the plan stays
    * O(1) per round instead of nesting every prior round — the
    * ConnectedComponents.resolve doctrine; a cluster deployment points
    * spark.checkpoint.dir at durable storage and uses checkpoint() for
    * executor-loss recovery. Replaced rounds' blocks are dropped
    * eagerly or checkpoint storage grows linearly with iterations.
    * All divisions are integral (DIV), so the result is bit-identical
    * to the unrolled integer-arithmetic oracle.
    */
  /** Driver-local damped-rank fixed point over a BOUNDED weighted edge
    * list — the exact integer arithmetic of the distributed loops in
    * [[pagerank]] / [[graphPagerankWeighted]] / [[graphPpr]], replayed
    * on the driver: per edge (s, d, w) the contribution is
    * (rank(s)·w) DIV totw(s); next(v) = base(v) + (850·Σc) DIV 1000.
    * Unweighted is the w = 1 special case ((rank·1) DIV deg =
    * rank DIV deg, the pre-divide spelling — same floors). Only
    * edge-ENDPOINT ranks are computed; callers coalesce non-endpoint
    * nodes to base(v) (they receive no mass and their own mass never
    * reaches an edge). Same doctrine as the Tarjan/union-find fast
    * paths: the trade graph is SCHEMA-bounded (≤ |nations|² edges
    * derived by one distributed hash-agg from lineitem — the 100 TB
    * side), so the fixed point is a bounded model artifact; each
    * caller guards the bound with a measured limit(bound+1) grab.
    */
  private def dampedRankLocal(edges: Array[(Long, Long, Long)],
      init: Long => Long, base: Long => Long,
      iters: Int): Array[(Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val totw = edges.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(n => n -> init(n)).toMap
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d, w) <- edges)
        sums(d) += rank(s) * w / totw(s)
      rank = nodes.map(n => n -> (base(n) + 850L * sums(n) / 1000L)).toMap
    }
    nodes.map(n => (n, rank(n)))
  }

  /** (node, lrank) LocalRelation from a driver-resolved rank vector —
    * broadcast-joined back onto the full node set by the callers.
    */
  private def localRankDf(spark: SparkSession,
      ranks: Array[(Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ranks.map { case (n, r) => org.apache.spark.sql.Row(n, r) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lrank",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Bound for the damped-rank local fast paths — measured per call
    * via limit(bound+1), never assumed (the graphBowtie guard
    * doctrine).
    */
  private val LocalRankEdgeBound = 500000

  /** Node-count bound for the distributed damped-rank loops'
    * per-round NODE-SIZED broadcasts (contrib/sums/rank frames): two
    * longs per node is ~100 MB of hash relation at this bound — a safe
    * executor-memory footprint. Above it the same joins run as plain
    * shuffle joins (AQE still upgrades them back if runtime stats
    * allow). The guard is MEASURED per call via limit(bound+1), never
    * assumed (the LocalRankEdgeBound doctrine) — a generic caller with
    * a billion-node graph must not broadcast O(nodes) every round.
    */
  private val BroadcastNodeBound = 2000000

  /** The measured guard: returns `broadcast` when the node set fits
    * [[BroadcastNodeBound]], identity otherwise. One bounded count job
    * per distributed-loop invocation — negligible next to the loop.
    */
  private def nodeSideHint(nodeIds: DataFrame): DataFrame => DataFrame =
    if (nodeIds.limit(BroadcastNodeBound + 1).count() <= BroadcastNodeBound)
      broadcast
    else identity

  /** Shared-neighbor hub cap for the co-occurrence link-prediction
    * family (neighbor_overlap / resource_alloc / adamic_adar): the
    * candidate self-join keys on the shared neighbor z and fans out
    * deg(z)² pairs, so super-hub z's are EXCLUDED from candidate
    * generation in code, not in a comment — the standard hub cut (for
    * RA/AA a super-hub's per-term 1/deg ≈ 0 anyway; for raw common
    * counts the cut is the documented approximation at web scale,
    * exactly the CopurchaseBasketCap doctrine). 10⁴ is ~400× this
    * corpus's max degree, so every gate hash is the uncapped answer;
    * the oracles apply the identical filter.
    */
  private[graft] val HubNeighborCap = 10000L

  /** Candidate-generation adjacency for the co-occurrence family:
    * drops rows whose SHARED-NEIGHBOR key has degree above `cap`.
    * `nbrDeg` (`nbr`, `deg`) is the caller's EXISTING degree frame
    * re-keyed (degree by nbr == degree by x on a bidirected
    * adjacency) — reusing it keeps the cap to one broadcast semi
    * filter instead of adding a second degree aggregate (A/B'd:
    * recomputing cost ~0.2–0.5 s of extra exchange per query).
    * PERSISTED per call via Persist.intermediate (default mode: LAZY
    * localCheckpoint, not cache()): every
    * caller feeds it to BOTH sides of the co-occurrence self-join, and
    * union/join branches get no common-subexpression elimination —
    * unpersisted, each side re-derived the filter chain (the
    * ConnectedComponents fwd-cache doctrine; A/B'd 3.6 → 2.6 s on
    * neighbor_overlap). Default-mode blocks are owned by the RDD,
    * not the session CacheManager, so the ContextCleaner frees them as
    * soon as the query's frames are dropped — a long-lived session
    * running the co-occurrence family repeatedly accumulates nothing
    * (cache() leaked one capped adjacency per invocation; r13 VERDICT
    * item 5; under the knob's explicit cache mode that obligation
    * returns and is documented at Persist). The spec overrides `cap`
    * to pin the cut on a synthetic hub and pins the no-cache-growth
    * contract.
    */
  private[graft] def capHubs(adj: DataFrame, nbrDeg: DataFrame,
      cap: Long = HubNeighborCap): DataFrame =
    // re-project (x, nbr): the USING join puts the key column first
    adj.join(broadcast(nbrDeg.where(col("deg") <= cap).select("nbr")),
      Seq("nbr")).select("x", "nbr").persistIntermediate

  /** `localBound` = 0 disables the driver-local fast path — the spec
    * hook that pins the distributed loop's plan contract (no
    * LocalRelation leaves) independently of the default adaptive
    * behavior.
    */
  private[graft] def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int,
      localBound: Int = LocalRankEdgeBound): DataFrame = {
    val nodeIds = nodes.select(col("node").cast("long").as("node"))
    val grabbed =
      if (localBound > 0)
        edges.select(col("src").cast("long"), col("dst").cast("long"))
          .limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localBound > 0 && grabbed.length <= localBound) {
      val es = grabbed.map(r => (r.getLong(0), r.getLong(1), 1L))
      val lab = localRankDf(nodes.sparkSession,
        dampedRankLocal(es, _ => 1000000L, _ => 150000L, iters))
      return nodeIds
        .join(broadcast(lab), Seq("node"), "left")
        .select(col("node"), coalesce(col("lrank"),
          lit(if (iters == 0) 1000000L else 150000L)).as("rank"))
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").cast("long").as("src"), col("deg"))
      .truncateLineage(true)
    // contrib/sums are O(nodes) per round: broadcast only while the
    // measured node count fits (nodeSideHint) — a generic caller with
    // a node set past the bound gets plain shuffle joins instead
    val side = nodeSideHint(nodeIds)
    var rank = nodeIds.withColumn("rank", lit(1000000L)).truncateLineage(true)
    for (_ <- 1 to iters) {
      // pre-divide: each edge contributes rank_src DIV deg_src, so the
      // broadcast side carries the quotient directly (one row per
      // source node, not per edge)
      val contrib = rank.join(deg, rank("node") === deg("src"))
        .select(col("src"), expr("rank DIV deg").as("c"))
      val sums = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("node"))
        .join(side(contrib), "src")
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodeIds
        .join(side(sums), Seq("node"), "left")
        .select(col("node"),
          expr("150000L + (850L * coalesce(s, 0L)) DIV 1000L").as("rank"))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(rank)
      rank = next
    }
    // deg's checkpoint blocks are dead once the last round is
    // materialized — drop them or every pagerank invocation leaks a
    // degree table into executor storage for the session lifetime
    // (catalog.clearCache() does not touch RDD-level persists). The
    // FINAL rank checkpoint must stay: the returned plan reads it and
    // its lineage is truncated — it is the result, node-sized by
    // contract.
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(deg)
    rank
  }

  /** r1..r5 are mechanically unrolled (DuckDB supports recursive CTEs
    * with aggregates, but five explicit rounds read as exactly the
    * Spark loop above and can't hide an off-by-one).
    */
  val graphPagerankSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST(150000 + 850 * COALESCE(c.s, 0) // 1000 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
         |    FROM edges e
         |    JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, deg AS MATERIALIZED (
       |  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), r0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
       |), $rounds
       |SELECT node AS nationkey, rank FROM r$Iters
       |ORDER BY rank DESC, nationkey""".stripMargin
  }

  /** `graph_degree` — degree distribution of the customer→order graph:
    * how many customers placed exactly k orders, INCLUDING k = 0 (the
    * left join is the part a naive group-by silently drops). A
    * count-of-counts is two hash aggregates; the second's key space is
    * the max degree — at any scale the heavy shuffle is the first
    * aggregate, which map-side combines on o_custkey.
    */
  def graphDegree(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = table(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("degree"))
    table(spark, sfDir, "customer")
      .select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("degree")
  }

  val graphDegreeSql: String =
    """WITH d AS (
      |  SELECT c.c_custkey, COALESCE(o.degree, 0) AS degree
      |  FROM customer c LEFT JOIN (
      |    SELECT o_custkey, COUNT(*) AS degree FROM orders GROUP BY o_custkey
      |  ) o ON c.c_custkey = o.o_custkey
      |)
      |SELECT degree, COUNT(*) AS n_customers
      |FROM d GROUP BY degree ORDER BY degree""".stripMargin

  /** `graph_bfs` — single-source shortest HOP distance over the
    * directed trade graph (source = nation 0), the frontier-expansion
    * primitive under reachability, radius, and influence queries.
    *
    * Spelling: min-distance propagation, the BFS twin of
    * ConnectedComponents.resolve's min-label loop. The distance vector
    * starts as (source → 0, everything else NULL=∞); each round every
    * node takes the null-skipping `least` of its own distance and
    * min(in-neighbor distance) + 1; fixpoint when no distance changed
    * (`changed` bit carried IN the round's checkpoint, so convergence
    * is a scan of the node-sized vector, not an extra join job). At
    * fixpoint the vector IS the exact hop distance; iterations needed
    * = eccentricity of the source, bounded by maxIters with the same
    * fail-loudly contract as ConnectedComponents (a silently partial
    * BFS would undercount reachability).
    *
    * Scale: each round is one broadcast-join of the edge list with the
    * node-sized distance vector + one partial+final min aggregate —
    * NOTHING driver-side inside the loop, lineage truncated per round
    * by localCheckpoint. When distances outgrow a broadcast, the hint
    * flips to ranks⋈edges co-partitioned on src, same algebra (the
    * pagerank doctrine above).
    */
  def graphBfs(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    // maxIters 30 >= any eccentricity on a 25-node graph
    bfs(nodes, edges, source = 0L, maxIters = 30)
      .select(col("node").as("nationkey"), col("dist"))
      .orderBy("nationkey")
  }

  /** Core min-distance loop: `nodes(node)`, `edges(src, dst)` →
    * `(node, dist)` with dist NULL for nodes unreachable from
    * `source`. See graphBfs for the contract and scale notes.
    */
  private[graft] def bfs(nodes: DataFrame, edges: DataFrame,
      source: Long, maxIters: Int): DataFrame = {
    var dist = nodes.select(col("node").cast("long").as("node"))
      .withColumn("dist", when(col("node") === source, 0L))
      .truncateLineage(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(broadcast(dist.where(col("dist").isNotNull)
          .select(col("node").as("src"), col("dist").as("dSrc"))), "src")
        .groupBy(col("dst").as("node"))
        .agg((min(col("dSrc")) + 1L).as("cand"))
      val next = dist.join(broadcast(nbrMin), Seq("node"), "left")
        // least/greatest skip NULLs: an unreached node (NULL) adopts
        // cand outright, an unreachable one stays NULL
        .select(col("node"),
          least(col("dist"), col("cand")).as("dist"),
          // parenthesize the NOT: `!x.as(...)` aliases first and negates
          // the aliased column, leaving the output unnamed
          (!(least(col("dist"), col("cand")) <=> col("dist"))).as("changed"))
        // LAZY checkpoint: the ungrouped count-if below touches every
        // partition, filling the checkpoint and answering convergence
        // in ONE job per round instead of eager-checkpoint + isEmpty
        // (the ConnectedComponents doctrine — isEmpty short-circuits
        // and would leave a partial lazy checkpoint). Truncation-
        // purpose, NOT Persist.intermediate-subject.
        .truncateLineage(false)
      converged = next
        .agg(count(when(col("changed"), lit(1))).as("c"))
        .head.getLong(0) == 0L
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(dist)
      dist = next
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      s"BFS did not converge in $maxIters rounds")
    dist.select(col("node"), col("dist"))
  }

  /** DuckDB twin: textbook recursive-CTE BFS. UNION (not UNION ALL)
    * dedups (node, dist) pairs per step, so the working set is bounded
    * by |nodes| × the dist cap even on cyclic graphs — no path
    * explosion; MIN(dist) per node afterwards is the shortest
    * distance. The dist < 24 recursion bound is total on a 25-node
    * graph (any shortest path has < |V| hops).
    */
  val graphBfsSql: String =
    s"""WITH RECURSIVE $EdgeCtes, walk(node, dist) AS (
       |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
       |  UNION
       |  SELECT e.dst, w.dist + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.dist < 24
       |), best AS (
       |  SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
       |)
       |SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, b.dist
       |FROM nation n LEFT JOIN best b ON b.node = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY nationkey""".stripMargin

  /** `graph_neighbor_overlap` — neighborhood similarity of node pairs
    * on the undirected trade graph: for every pair with at least one
    * common neighbor, the common-neighbor count, both degrees, and the
    * neighborhood Jaccard |Γx∩Γy| / |Γx∪Γy| scaled to 1e6 by integral
    * division (exact in both engines — no float ratio under the hash
    * gate). Common-neighbors/Jaccard is the standard link-prediction
    * and role-similarity signal.
    *
    * Spelling: the adjacency self-join on the SHARED NEIGHBOR — the
    * co-occurrence shape. x < y canonicalizes each pair once;
    * |Γx∪Γy| = deg x + deg y − common by inclusion-exclusion, so no
    * second join pass. Scale: the join keys on the shared-neighbor id
    * and hash-partitions by it; a hot hub fans out deg² pairs, so
    * super-hub shared neighbors are CUT from candidate generation by
    * the [[HubNeighborCap]] filter (in code, gate-inactive — see the
    * cap's scaladoc); reported degrees stay the true degrees.
    */
  def graphNeighborOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    // bidirectional adjacency: (x, nbr) once per undirected edge end
    val adj = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      .persistIntermediate
    val deg = adj.groupBy("x").agg(count(lit(1)).as("deg"))
    val cadj = capHubs(adj, deg.select(col("x").as("nbr"), col("deg")))
    val common = cadj.select(col("x"), col("nbr"))
      .join(broadcast(cadj.select(col("x").as("y"), col("nbr"))), "nbr")
      .where(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("common"))
    common
      .join(broadcast(deg), "x")
      .withColumnRenamed("deg", "deg_x")
      .join(broadcast(deg.select(col("x").as("y"), col("deg").as("deg_y"))), "y")
      .select(col("x"), col("y"), col("common"), col("deg_x"), col("deg_y"),
        expr("(common * 1000000L) DIV (deg_x + deg_y - common)").as("jaccard_1e6"))
      .orderBy("x", "y")
  }

  val graphNeighborOverlapSql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS x, b AS nbr FROM und
       |  UNION ALL
       |  SELECT b AS x, a AS nbr FROM und
       |), deg AS MATERIALIZED (
       |  SELECT x, COUNT(*) AS deg FROM adj GROUP BY x
       |), cadj AS MATERIALIZED (
       |  SELECT a.x, a.nbr FROM adj a
       |  JOIN deg d ON d.x = a.nbr AND d.deg <= $HubNeighborCap
       |), common AS MATERIALIZED (
       |  SELECT a1.x AS x, a2.x AS y, COUNT(*) AS common
       |  FROM cadj a1 JOIN cadj a2 ON a1.nbr = a2.nbr AND a1.x < a2.x
       |  GROUP BY 1, 2
       |)
       |SELECT c.x, c.y, c.common, dx.deg AS deg_x, dy.deg AS deg_y,
       |       CAST(c.common * 1000000 // (dx.deg + dy.deg - c.common) AS BIGINT) AS jaccard_1e6
       |FROM common c
       |JOIN deg dx ON dx.x = c.x
       |JOIN deg dy ON dy.x = c.y
       |ORDER BY c.x, c.y""".stripMargin

  /** `graph_resource_alloc` — resource-allocation link prediction (Zhou,
    * Lü & Zhang 2009): for every node pair sharing a neighbor,
    * RA(x,y) = Σ_{z ∈ Γx∩Γy} 1/deg(z). Unlike the raw common-neighbor
    * count (graph_neighbor_overlap), RA discounts hub neighbors — a
    * shared neighbor that touches everything carries almost no signal —
    * which is why it wins link-prediction benchmarks over plain Jaccard.
    *
    * Determinism: per-term integral division, 1e6 DIV deg(z), summed as
    * BIGINT — the score is DEFINED as the sum of floored per-neighbor
    * shares, identical in both engines (no float accumulation order).
    *
    * Scale: same co-occurrence self-join as neighbor_overlap, keyed on
    * the shared neighbor, plus ONE extra broadcast join against the
    * node-sized degree table to weight each match — no new shuffle
    * shape. Hub fan-out is cut in code by the shared
    * [[HubNeighborCap]] filter (a super-hub's 1/deg term is ≈ 0
    * anyway; gate-inactive — see the cap's scaladoc).
    */
  def graphResourceAlloc(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      .persistIntermediate
    val deg = adj.groupBy(col("x").as("z")).agg(count(lit(1)).as("deg"))
    val cadj = capHubs(adj, deg.select(col("z").as("nbr"), col("deg")))
    cadj.select(col("x"), col("nbr"))
      .join(broadcast(cadj.select(col("x").as("y"), col("nbr"))), "nbr")
      .where(col("x") < col("y"))
      .join(broadcast(deg), col("nbr") === col("z"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000L DIV deg")).as("ra_1e6"))
      .orderBy("x", "y")
  }

  val graphResourceAllocSql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS x, b AS nbr FROM und
       |  UNION ALL
       |  SELECT b AS x, a AS nbr FROM und
       |), deg AS MATERIALIZED (
       |  SELECT x AS z, COUNT(*) AS deg FROM adj GROUP BY x
       |), cadj AS MATERIALIZED (
       |  SELECT a.x, a.nbr FROM adj a
       |  JOIN deg d ON d.z = a.nbr AND d.deg <= $HubNeighborCap
       |)
       |SELECT a1.x, a2.x AS y, COUNT(*) AS common,
       |       CAST(SUM(1000000 // d.deg) AS BIGINT) AS ra_1e6
       |FROM cadj a1
       |JOIN cadj a2 ON a1.nbr = a2.nbr AND a1.x < a2.x
       |JOIN deg d ON d.z = a1.nbr
       |GROUP BY 1, 2
       |ORDER BY a1.x, y""".stripMargin

  /** `graph_pagerank_weighted` — PageRank with rank flowing in
    * proportion to edge WEIGHT (trade volume), not split evenly across
    * out-neighbors: each edge carries rank_src·w(src,dst) DIV W(src),
    * the weighted-graph generalization (Xing & Ghorbani 2004) that a
    * volume-skewed trade network actually wants — a nation trading 90%
    * with one partner should push 90% of its rank there, which the
    * uniform split of graph_pagerank flattens.
    *
    * Same doctrine as the uniform spelling: integral arithmetic
    * throughout (the per-EDGE quotient is the one difference — no
    * per-node pre-divide exists when weights differ per edge), the
    * rank vector localCheckpoint'd per round with nothing collected,
    * each round one broadcast-join + partial+final aggregate.
    */
  def graphPagerankWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val wedges = tradeEdgesWeighted(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    // driver-local fast path: the weighted generalization of the
    // pagerank one — per-edge mass (rank·cnt) DIV totw (see
    // dampedRankLocal); measured bound, distributed loop unchanged
    // above it
    val grabbedW = wedges
      .select(col("src").cast("long"), col("dst").cast("long"), col("cnt"))
      .limit(LocalRankEdgeBound + 1).collect()
    if (grabbedW.length <= LocalRankEdgeBound) {
      val es = grabbedW.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lab = localRankDf(spark,
        dampedRankLocal(es, _ => 1000000L, _ => 150000L, Iters))
      return nodes
        .join(broadcast(lab), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          coalesce(col("lrank"), lit(150000L)).as("rank"))
        .orderBy(desc("rank"), col("nationkey"))
    }
    val nodeIds = nodes.truncateLineage(true)
    val totw = wedges.groupBy("src").agg(sum(col("cnt")).as("tw"))
      .truncateLineage(true)
    // node-sized broadcast guard — see nodeSideHint
    val side = nodeSideHint(nodeIds)
    var rank = nodeIds.withColumn("rank", lit(1000000L)).truncateLineage(true)
    for (_ <- 1 to Iters) {
      val sums = wedges
        .join(side(rank.join(totw, rank("node") === totw("src"))
          .select(col("src"), col("rank"), col("tw"))), "src")
        .select(col("dst").as("node"), expr("(rank * cnt) DIV tw").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodeIds
        .join(side(sums), Seq("node"), "left")
        .select(col("node"),
          expr("150000L + (850L * coalesce(s, 0L)) DIV 1000L").as("rank"))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(rank)
      rank = next
    }
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(totw)
    rank.select(col("node").as("nationkey"), col("rank"))
      .orderBy(desc("rank"), col("nationkey"))
  }

  /** Unrolled like graphPagerankSql; the per-edge quotient
    * r.rank·e.cnt // t.tw mirrors the Spark round exactly.
    */
  val graphPagerankWeightedSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST(150000 + 850 * COALESCE(c.s, 0) // 1000 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank * e.cnt // t.tw) AS s
         |    FROM wedges e
         |    JOIN r${i - 1} r ON r.node = e.src
         |    JOIN totw t ON t.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, wedges AS MATERIALIZED (
       |  SELECT src, dst, cnt FROM counted
       |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted)
       |), totw AS MATERIALIZED (
       |  SELECT src, CAST(SUM(cnt) AS BIGINT) AS tw FROM wedges GROUP BY src
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), r0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
       |), $rounds
       |SELECT node AS nationkey, rank FROM r$Iters
       |ORDER BY rank DESC, nationkey""".stripMargin
  }

  private val HitsIters = 3

  /** `graph_hits` — HITS hubs & authorities (Kleinberg 1999) on the
    * directed trade graph: authority(j) = Σ_{i→j} hub(i),
    * hub(i) = Σ_{i→j} authority(j), alternated, each vector re-scaled
    * to a 1e6 max after every half-step (the max-norm spelling of the
    * usual normalization — integral, so the gate can hash it).
    * Exporter-nations score as hubs, importer-nations as authorities;
    * it is the asymmetric complement of PageRank's single score.
    *
    * Determinism: BIGINT sums of ≤1e6-scaled scores over a ≤625-edge
    * graph (≪ 2^63), then (v·1e6) DIV max(v) — every op integral, the
    * same doctrine as graphPagerank. Nodes without in-(out-)edges hold
    * score 0 via the left join + coalesce.
    *
    * Scale: each half-step is one broadcast-join of the edge list with
    * the node-sized score vector + one partial+final aggregate; the max
    * used for rescaling is folded in as a broadcast 1-row aggregate,
    * never collected. Same co-partitioned upgrade path as pagerank when
    * scores outgrow a broadcast.
    */
  def graphHits(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes0 = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    // driver-local fast path (the dampedRankLocal doctrine): the exact
    // integer half-steps — auth(d) = Σ hub(s) then ×1e6 DIV max, hub
    // symmetric — replayed over the bounded edge list. Non-endpoint
    // nodes hold 0 after the first half-step (propagate's left-join
    // coalesce), so only endpoint scores are computed and the output
    // coalesces the rest to 0; the max over endpoints IS the global
    // max (scores are non-negative).
    val grabbedH = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .limit(LocalRankEdgeBound + 1).collect()
    // nonEmpty guard: an empty edge list would make half()'s
    // raw.values.max throw on an empty endpoint map — fall through to
    // the distributed spelling, whose normalizeMax handles the
    // null/zero-max case gracefully (all scores 0)
    if (grabbedH.nonEmpty && grabbedH.length <= LocalRankEdgeBound &&
        HitsIters > 0) {
      val es = grabbedH.map(r => (r.getLong(0), r.getLong(1)))
      val endpoints = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      def half(from: Map[Long, Long], rev: Boolean): Map[Long, Long] = {
        val sums = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((s, d) <- es) {
          if (rev) sums(s) += from(d) else sums(d) += from(s)
        }
        val raw = endpoints.map(n => n -> sums(n)).toMap
        val mx = raw.values.max
        if (mx > 0) raw.view.mapValues(v => v * 1000000L / mx).toMap
        else raw
      }
      var hub = endpoints.map(n => n -> 1000000L).toMap
      var auth = Map.empty[Long, Long]
      for (_ <- 1 to HitsIters) {
        auth = half(hub, rev = false)
        hub = half(auth, rev = true)
      }
      import scala.jdk.CollectionConverters._
      val lab = spark.createDataFrame(
        endpoints.map(n =>
          org.apache.spark.sql.Row(n, hub(n), auth(n))).toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("lhub",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("lauth",
            org.apache.spark.sql.types.LongType, nullable = false))))
      return nodes0
        .join(broadcast(lab), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          coalesce(col("lhub"), lit(0L)).as("hub_1e6"),
          coalesce(col("lauth"), lit(0L)).as("auth_1e6"))
        .orderBy(desc("hub_1e6"), col("nationkey"))
    }
    val nodes = nodes0.truncateLineage(true)
    val side = nodeSideHint(nodes)
    // CHECKPOINT each half-step (the pagerank doctrine): every
    // half-step references its input vector twice (the rescale's max
    // aggregate + the join side), so without lineage truncation the
    // plan DOUBLES per half-step — 2^6 subplan executions by round 3,
    // measured 151 s at sf0.1 vs ~2 s checkpointed. The replaced
    // vector's blocks drop as soon as the next one is materialized.
    var hub = nodes.withColumn("score", lit(1000000L)).truncateLineage(true)
    var auth: DataFrame = null
    for (_ <- 1 to HitsIters) {
      val nextAuth = normalizeMax(propagate(nodes, edges, hub, "src", "dst", side))
        .truncateLineage(true)
      if (auth != null)
        org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(auth)
      auth = nextAuth
      val nextHub = normalizeMax(propagate(nodes, edges, auth, "dst", "src", side))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(hub)
      hub = nextHub
    }
    // the FINAL hub/auth checkpoints stay — the returned plan reads them
    nodes
      .join(broadcast(hub.select(col("node"), col("score").as("hub_1e6"))),
        Seq("node"))
      .join(broadcast(auth.select(col("node"), col("score").as("auth_1e6"))),
        Seq("node"))
      .select(col("node").as("nationkey"), col("hub_1e6"), col("auth_1e6"))
      .orderBy(desc("hub_1e6"), col("nationkey"))
  }

  /** One HITS half-step: sum `scores` over edges from `from`-side into
    * `to`-side, left-joined back to the full node set (0 for nodes with
    * no incident edge). `side` hints the node-sized score/sum frames:
    * callers pass the measured [[nodeSideHint]] guard (as [[pagerank]]
    * does), so a generic-graph invocation past [[BroadcastNodeBound]]
    * degrades to plain shuffle joins instead of broadcasting O(nodes)
    * per half-step.
    */
  private def propagate(nodes: DataFrame, edges: DataFrame,
      scores: DataFrame, from: String, to: String,
      side: DataFrame => DataFrame): DataFrame = {
    val summed = edges
      .join(side(scores.select(col("node").as(from), col("score"))), from)
      .groupBy(col(to).as("node")).agg(sum(col("score")).as("s"))
    nodes.join(side(summed), Seq("node"), "left")
      .select(col("node"), coalesce(col("s"), lit(0L)).as("score"))
  }

  /** Rescale a score vector to max 1e6 by integral division; all-zero
    * vectors pass through unchanged (NULL max guard).
    */
  private def normalizeMax(scores: DataFrame): DataFrame =
    scores
      .crossJoin(broadcast(scores.agg(max(col("score")).as("__mx"))))
      .select(col("node"),
        when(col("__mx") > 0,
          expr("(score * 1000000L) DIV __mx")).otherwise(col("score"))
          .as("score"))

  private val BetweennessRounds = 6

  /** `graph_betweenness` — betweenness centrality on the undirected
    * trade graph, the pair-counting spelling: per-source BFS layers
    * carry shortest-path COUNTS (σ at dist r = Σ of parents' σ at
    * r−1), and B(v) = Σ_{s<t, v∉{s,t}} σ_sv·σ_tv/σ_st over pairs where
    * d(s,v)+d(v,t) = d(s,t) — the identity that replaces Brandes'
    * sequential backward accumulation with two joins, which is what
    * makes the operator RELATIONAL (Brandes' δ-recursion is inherently
    * per-source sequential; the σ-product identity is one shuffle).
    * Per-term integral scoring ((σ_sv·σ_tv·10⁶) DIV σ_st, the RA
    * doctrine) keeps both engines bit-identical with no float
    * accumulation order.
    *
    * Scale: the all-pairs table is |sources|·|nodes| — exact
    * betweenness is quadratic BY DEFINITION, so at 100 TB you sample
    * pivots (in the spirit of Brandes & Pich 2007; see
    * [[betweenness]] for the PAIR-RESTRICTED estimator this engine
    * actually computes): the `sources` parameter IS that sample (the
    * gate passes all 25 nations, where the estimator IS exact
    * betweenness; a billion-node caller passes K random pivots and
    * rescales by C(n,2)/C(K,2) if magnitudes matter). Each BFS
    * round is one frontier ⋈ edges join + σ aggregate + anti-join —
    * all keyed on (source, node), nothing driver-side; the bounded
    * trade graph takes the measured driver-local replay instead.
    * Fail-loudly (the bfs doctrine): a frontier still alive after
    * [[BetweennessRounds]] throws rather than returning silently
    * truncated centralities.
    */
  def graphBetweenness(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val bidir = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    betweenness(nodes, bidir, BetweennessRounds)
      .orderBy("nationkey")
  }

  /** The engine behind [[graphBetweenness]]: `bidir` is the bidirected
    * neighbor list (`u`, `v` long); `sources` (default = `nodes`) is
    * the pivot set — the estimator is PAIR-RESTRICTED: B(v) sums over
    * pairs s&lt;t with BOTH endpoints drawn from `sources` (so a K-pivot
    * sample scores C(K,2)/C(n,2) of the pair terms; pass
    * `rescale = true` for the unbiased magnitude — see the factor's
    * derivation and variance bound at the `finish` helper below; ranks
    * concentrate without it). This is deliberately NOT the Brandes–Pich one-sided pivot
    * estimator (sources × all-targets): pair restriction is what the
    * σ-product identity computes with one join, and with
    * sources = nodes the two coincide exactly. The output always
    * covers all of `nodes`. Returns (`nationkey`, `btw_1e6`).
    * `localBound` = 0 forces the distributed loop (the pagerank spec
    * hook); Round13OpsSpec pins local == distributed on seeded random
    * graphs and sampled(sources = nodes) == full.
    */
  private[graft] def betweenness(nodes: DataFrame, bidir: DataFrame,
      maxRounds: Int, localBound: Int = LocalRankEdgeBound,
      sources: DataFrame = null, rescale: Boolean = false): DataFrame = {
    val spark = nodes.sparkSession
    // distinct: the local replay dedups its collected pivot list, so
    // the distributed seed must too — a pivot sampled twice (sampling
    // with replacement) would otherwise seed sigma = 2 at its own
    // source row and inflate every pair term through it
    val srcFrame = Option(sources).getOrElse(nodes)
      .select(col("node").cast("long").as("node"))
      .distinct()
    // `rescale`: multiply the pair-restricted estimate by
    // C(n,2)/C(K,2) — a K-pivot sample scores C(K,2) of the C(n,2)
    // pair terms, so for pivots drawn uniformly without replacement
    // every pair has inclusion probability C(K,2)/C(n,2) and the
    // rescaled sum is UNBIASED in expectation (Horvitz–Thompson with
    // equal inclusion probabilities; linearity of expectation needs no
    // pair independence). Per-node spread concentrates as
    // O(1/√C(K,2)) of the node's max pair contribution (Hoeffding over
    // the sampled bounded pair terms) — ranks concentrate much faster,
    // magnitudes carry the stated variance. Applied identically on the
    // local and distributed exits, AFTER the shared integer pipeline,
    // as one exact integer multiply + floor-DIV (floor error < 1 unit
    // of the 1e6 scale). The two counts are a node-frame aggregate and
    // a pivot-frame aggregate — both driver-bounded by contract.
    // `kKnown` skips the pivot-count job on the local fast path, where
    // the complete deduped pivot set was already collected (srcs.length
    // IS K) — the path exists to avoid per-job overhead on small graphs
    def finish(res: DataFrame, kKnown: Long = -1L): DataFrame =
      if (!rescale) res
      else {
        val n = nodes.select(col("node")).distinct().count()
        val k = if (kKnown >= 0) kKnown else srcFrame.count()
        if (k < 2 || k >= n) res
        else res.withColumn("btw_1e6", expr(
          s"CAST((CAST(btw_1e6 AS DECIMAL(38,0)) * ${n * (n - 1)}L) " +
            s"DIV ${k * (k - 1)}L AS BIGINT)"))
      }
    val grabbedB =
      if (localBound > 0)
        bidir.select(col("u").cast("long"), col("v").cast("long"))
          .limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    // the source set must also fit the driver for the local replay —
    // same measured limit(bound+1) probe as the edge list
    val grabbedS =
      if (localBound > 0 && grabbedB.length <= localBound)
        srcFrame.limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localBound > 0 && grabbedB.length <= localBound &&
        grabbedS.length <= localBound && grabbedS.nonEmpty) {
      val es = grabbedB.map(r => (r.getLong(0), r.getLong(1)))
      val nbrs = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val endpoints = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      // BFS from exactly the source set — the same seeds as the
      // distributed loop, so both paths compute the identical
      // pair-restricted estimator (an isolated source reaches only
      // itself and contributes no pair terms)
      val srcs = grabbedS.map(_.getLong(0)).distinct.sorted
      // per-source BFS with path counts (dist, sigma)
      val aps = srcs.map { s =>
        val dist = scala.collection.mutable.Map(s -> 0)
        val sigma = scala.collection.mutable.Map(s -> 1L)
        var frontier = Seq(s)
        var r = 0
        while (frontier.nonEmpty && r < maxRounds) {
          r += 1
          val sums = scala.collection.mutable.Map.empty[Long, Long]
            .withDefaultValue(0L)
          for (u <- frontier; w <- nbrs.getOrElse(u, Array.empty[Long]))
            if (!dist.contains(w)) sums(w) += sigma(u)
          frontier = sums.keys.toSeq.sorted
          for (w <- frontier) { dist(w) = r; sigma(w) = sums(w) }
        }
        if (frontier.nonEmpty && r == maxRounds) {
          // one more half-step proves (in)completeness, the bfs contract
          val more = frontier.exists(u =>
            nbrs.getOrElse(u, Array.empty[Long]).exists(!dist.contains(_)))
          if (more) throw new IllegalStateException(
            s"betweenness BFS did not finish in $maxRounds rounds")
        }
        s -> ((dist.toMap, sigma.toMap))
      }.toMap
      val btw = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      // pair loop over SOURCES only (both endpoints) — the same
      // restriction the distributed tail's i2-join-on-reached imposes
      for {
        s <- srcs; t <- srcs if s < t
        (dst, sigst) <- aps(s)._1.get(t).map(d => (d, aps(s)._2(t))).toSeq
        v <- endpoints if v != s && v != t
        dsv <- aps(s)._1.get(v).toSeq
        dtv <- aps(t)._1.get(v).toSeq
        if dsv + dtv == dst
      } btw(v) += aps(s)._2(v) * aps(t)._2(v) * 1000000L / sigst
      return finish(nodes
        .join(broadcast(localRankDf(spark,
          endpoints.map(n => (n, btw(n))))), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          coalesce(col("lrank"), lit(0L)).as("btw_1e6")),
        kKnown = srcs.length.toLong)
    }
    // distributed: layered frontier expansion carrying sigma, the
    // (source, node)-keyed generalization of bfs — seeded from the
    // SOURCE set (default nodes), matching the local replay
    var reached = srcFrame
      .select(col("node").as("s"), col("node").as("v"),
        lit(0).as("dist"), lit(1L).as("sigma"))
      .truncateLineage(true)
    var frontier = reached
    var r = 0
    var frontierCount = 1L
    while (frontierCount > 0 && r < maxRounds) {
      r += 1
      val newly = frontier
        .join(bidir.select(col("u").cast("long").as("v"),
          col("v").cast("long").as("w")), Seq("v"))
        .groupBy(col("s"), col("w").as("nv"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(reached.select(col("s"), col("v").as("nv")),
          Seq("s", "nv"), "left_anti")
        .select(col("s"), col("nv").as("v"), lit(r).as("dist"), col("sigma"))
        .truncateLineage(true)
      frontierCount = newly.count()
      if (frontierCount > 0) {
        val nextReached = reached.unionByName(newly).truncateLineage(true)
        // the replaced cumulative frame's blocks are dead once the new
        // one is materialized — drop them or checkpoint storage grows
        // linearly with rounds on a |sources|·|nodes|-sized frame (the
        // ConnectedComponents doctrine). The consumed frontier's blocks
        // die with it at r == 1 (same checkpoint); later rounds drop
        // the prior frontier explicitly.
        org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(reached)
        if (r > 1)
          org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(frontier)
        reached = nextReached
        frontier = newly
      } else {
        // terminal empty frontier: its checkpoint blocks are dead on
        // arrival — free them now (the loop-leak class r13 closed
        // elsewhere)
        org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(newly)
      }
    }
    if (frontierCount > 0) {
      // a BFS that filled its LAST legal round is complete, not
      // truncated — mirror the local replay's one-step lookahead (one
      // anti-join existence probe) before failing loudly
      val more = frontier
        .join(bidir.select(col("u").cast("long").as("v"),
          col("v").cast("long").as("w")), Seq("v"))
        .select(col("s"), col("w").as("v"))
        .join(reached.select(col("s"), col("v")), Seq("s", "v"), "left_anti")
        .limit(1).count()
      if (more > 0) throw new IllegalStateException(
        s"betweenness BFS did not finish in $maxRounds rounds")
    }
    // only `reached` feeds the pair-counting tail: the surviving
    // frontier's blocks (when any productive round ran) are dead here
    if (frontier ne reached)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(frontier)
    val pr = reached.where(col("s") < col("v"))
      .select(col("s"), col("v").as("t"),
        col("dist").as("dst"), col("sigma").as("sigst"))
    val i1 = reached.select(col("s"), col("v"),
      col("dist").as("d1"), col("sigma").as("g1"))
    val i2 = reached.select(col("s").as("t"), col("v"),
      col("dist").as("d2"), col("sigma").as("g2"))
    val terms = pr
      .join(i1, Seq("s"))
      .join(i2, Seq("t", "v"))
      .where(col("v") =!= col("s") && col("v") =!= col("t") &&
        col("d1") + col("d2") === col("dst"))
      .groupBy("v")
      .agg(sum(expr("(g1 * g2 * 1000000L) DIV sigst")).as("b"))
    finish(nodes
      .join(terms.withColumnRenamed("v", "node"), Seq("node"), "left")
      .select(col("node").as("nationkey"),
        coalesce(col("b"), lit(0L)).as("btw_1e6")))
  }

  val graphBetweennessSql: String = {
    val rounds = (1 to BetweennessRounds).map { r =>
      // MATERIALIZED: DuckDB inlines CTEs by default, and each a_r is
      // referenced twice per level (the NOT EXISTS and the union) plus
      // three times in the tail — inlined, the chain re-expands
      // exponentially (measured: OOM at 100 GiB on sf0.01)
      s"""f$r AS MATERIALIZED (
         |  SELECT p.s, b.v AS nv, SUM(p.sigma) AS sigma
         |  FROM n${r - 1} p JOIN bidir b ON b.u = p.v
         |  GROUP BY 1, 2
         |), n$r AS MATERIALIZED (
         |  SELECT f.s, f.nv AS v, $r AS dist, CAST(f.sigma AS BIGINT) AS sigma
         |  FROM f$r f
         |  WHERE NOT EXISTS (SELECT 1 FROM a${r - 1} x
         |                    WHERE x.s = f.s AND x.v = f.nv)
         |), a$r AS MATERIALIZED (
         |  SELECT * FROM a${r - 1} UNION ALL SELECT * FROM n$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), bidir AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM und
       |  UNION ALL
       |  SELECT b AS u, a AS v FROM und
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), n0 AS MATERIALIZED (
       |  SELECT node AS s, node AS v, 0 AS dist, CAST(1 AS BIGINT) AS sigma
       |  FROM nodes
       |), a0 AS MATERIALIZED (
       |  SELECT * FROM n0
       |), $rounds, pr AS (
       |  SELECT s, v AS t, dist AS dst, sigma AS sigst
       |  FROM a$BetweennessRounds WHERE s < v
       |), terms AS (
       |  SELECT i1.v AS node,
       |         SUM((i1.sigma * i2.sigma * 1000000) // p.sigst) AS b
       |  FROM pr p
       |  JOIN a$BetweennessRounds i1 ON i1.s = p.s
       |  JOIN a$BetweennessRounds i2 ON i2.s = p.t AND i2.v = i1.v
       |  WHERE i1.v != p.s AND i1.v != p.t
       |    AND i1.dist + i2.dist = p.dst
       |  GROUP BY i1.v
       |)
       |SELECT n.node AS nationkey, CAST(COALESCE(t.b, 0) AS BIGINT) AS btw_1e6
       |FROM nodes n LEFT JOIN terms t ON t.node = n.node
       |ORDER BY nationkey""".stripMargin
  }

  /** Katz attenuation α = [[KatzAlphaNum]]/1000. Must satisfy
    * α·λmax < 1 for the truncated series to be the Katz limit's
    * prefix; λmax of the trade graph is bounded by its max in-degree
    * (≤ 24 nations), so 0.03·24 = 0.72 < 1 with a per-node score
    * ceiling of 1e6/(1−0.72) ≈ 3.6e6 — longs never strain.
    */
  private val KatzAlphaNum = 30L

  /** `graph_katz` — Katz centrality (Katz 1953) on the directed trade
    * graph: x(v) = β + α·Σ_{u→v} x(u), iterated [[Iters]] fixed rounds
    * from x⁰ = β = 1e6 — the truncated Katz series, the walk-counting
    * centrality that (unlike PageRank) does NOT divide a node's
    * influence by its out-degree: a hub nation lends full weight to
    * every partner. Integral arithmetic throughout (β = 1e6 scaled,
    * α·s = (30·s) DIV 1000), the pagerank fixed-iteration doctrine.
    *
    * Scale: identical shape to [[pagerank]] minus the degree
    * pre-divide — per round one edge ⋈ node-sized-score join (guarded
    * by [[nodeSideHint]]) and one partial+final aggregate; the
    * driver-local fast path replays the same integer rounds under the
    * measured [[LocalRankEdgeBound]].
    */
  def graphKatz(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val grabbedZ = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .limit(LocalRankEdgeBound + 1).collect()
    if (grabbedZ.length <= LocalRankEdgeBound) {
      val es = grabbedZ.map(r => (r.getLong(0), r.getLong(1)))
      val endpoints = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var x = endpoints.map(_ -> 1000000L).toMap
      for (_ <- 1 to Iters) {
        val sums = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((u, v) <- es) sums(v) += x(u)
        // non-negative longs: / == DIV
        x = endpoints.map(n =>
          n -> (1000000L + KatzAlphaNum * sums(n) / 1000L)).toMap
      }
      return nodes
        .join(broadcast(localRankDf(spark,
          endpoints.map(n => (n, x(n))))), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          // a node with no in-edges holds exactly β forever
          coalesce(col("lrank"), lit(1000000L)).as("katz"))
        .orderBy(desc("katz"), col("nationkey"))
    }
    val nodeIds = nodes.truncateLineage(true)
    val side = nodeSideHint(nodeIds)
    var x = nodeIds.withColumn("katz", lit(1000000L)).truncateLineage(true)
    for (_ <- 1 to Iters) {
      val sums = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("node"))
        .join(side(x.select(col("node").as("src"), col("katz"))), "src")
        .groupBy("node").agg(sum(col("katz")).as("s"))
      val next = nodeIds
        .join(side(sums), Seq("node"), "left")
        .select(col("node"),
          expr(s"1000000L + ($KatzAlphaNum * coalesce(s, 0L)) DIV 1000L")
            .as("katz"))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(x)
      x = next
    }
    x.select(col("node").as("nationkey"), col("katz"))
      .orderBy(desc("katz"), col("nationkey"))
  }

  val graphKatzSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""k$i AS (
         |  SELECT n.node,
         |         CAST(1000000 + ($KatzAlphaNum * COALESCE(c.s, 0)) // 1000
         |              AS BIGINT) AS katz
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(k.katz) AS s
         |    FROM edges e JOIN k${i - 1} k ON k.node = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), k0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS katz FROM nodes
       |), $rounds
       |SELECT node AS nationkey, katz FROM k$Iters
       |ORDER BY katz DESC, nationkey""".stripMargin
  }

  /** `graph_eigenvector` — eigenvector centrality by power iteration
    * on the UNDIRECTED trade graph (self-loops dropped, mutual pairs
    * collapsed): x ← A·x, rescaled to a 1e6 max after every round —
    * the max-norm spelling of the usual normalization, integral so the
    * gate can hash it (the [[graphHits]] doctrine with one vector and
    * a symmetric edge set). Bonacich's "importance of your neighbors"
    * score: the principal-eigenvector direction emerges in a few
    * rounds on this diameter-2 graph; [[Iters]] fixed rounds keep both
    * engines on the identical prefix.
    *
    * Scale: each round is one broadcast-or-shuffle join (the
    * [[nodeSideHint]] guard) of the bidirected edge list with the
    * node-sized score vector + one aggregate + a 1-row max rescale —
    * identical to a HITS half-step; the driver-local replay runs under
    * the measured edge bound.
    */
  def graphEigenvector(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val bidir = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    // nonEmpty: the replay's max() needs at least one endpoint (the
    // graphHits guard); empty graphs fall through to the distributed
    // spelling whose normalizeMax handles the zero-max case
    val grabbedE = bidir
      .select(col("u").cast("long"), col("v").cast("long"))
      .limit(LocalRankEdgeBound + 1).collect()
    if (grabbedE.nonEmpty && grabbedE.length <= LocalRankEdgeBound) {
      val es = grabbedE.map(r => (r.getLong(0), r.getLong(1)))
      val endpoints = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var x = endpoints.map(_ -> 1000000L).toMap
      for (_ <- 1 to Iters) {
        val sums = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((u, v) <- es) sums(v) += x(u)
        val raw = endpoints.map(n => n -> sums(n)).toMap
        val mx = raw.values.max
        x = if (mx > 0) raw.view.mapValues(v => v * 1000000L / mx).toMap
        else raw
      }
      return nodes
        .join(broadcast(localRankDf(spark,
          endpoints.map(n => (n, x(n))))), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          coalesce(col("lrank"), lit(0L)).as("eig"))
        .orderBy(desc("eig"), col("nationkey"))
    }
    val nodeIds = nodes.truncateLineage(true)
    val side = nodeSideHint(nodeIds)
    var x = nodeIds.withColumn("score", lit(1000000L)).truncateLineage(true)
    for (_ <- 1 to Iters) {
      val next = normalizeMax(propagate(nodeIds, bidir, x, "u", "v", side))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(x)
      x = next
    }
    x.select(col("node").as("nationkey"), col("score").as("eig"))
      .orderBy(desc("eig"), col("nationkey"))
  }

  val graphEigenvectorSql: String = {
    val rounds = (1 to Iters).map { r =>
      // MATERIALIZED is load-bearing: e_r references s_r THREE times
      // (two scalar MAX subqueries + the FROM); inlined, DuckDB
      // re-derives the whole chain ~3^Iters times including the 4-way
      // EdgeCtes join (measured: killed at 21 GB / 21 CPU-min at
      // sf0.01; materialized: 0.87 s). Any round CTE referenced more
      // than once per level must be MATERIALIZED — the EdgeCtes
      // doctrine.
      s"""s$r AS MATERIALIZED (
         |  SELECT n.node, COALESCE(x.s, 0) AS s
         |  FROM nodes n LEFT JOIN (
         |    SELECT b.v AS node, SUM(p.score) AS s
         |    FROM bidir b JOIN e${r - 1} p ON p.node = b.u
         |    GROUP BY b.v
         |  ) x ON x.node = n.node
         |), e$r AS MATERIALIZED (
         |  SELECT node,
         |         CAST(CASE WHEN (SELECT MAX(s) FROM s$r) > 0
         |              THEN (s * 1000000) // (SELECT MAX(s) FROM s$r)
         |              ELSE s END AS BIGINT) AS score
         |  FROM s$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), bidir AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM und
       |  UNION ALL
       |  SELECT b AS u, a AS v FROM und
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), e0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
       |), $rounds
       |SELECT node AS nationkey, score AS eig FROM e$Iters
       |ORDER BY eig DESC, nationkey""".stripMargin
  }

  /** DuckDB twin: the three rounds unrolled, each half-step a
    * join+sum+left-join mirroring [[propagate]] and a `// max` rescale
    * mirroring [[normalizeMax]] (max via a scalar subquery — nonempty
    * edge set in this corpus, so the NULL-max guard is not needed).
    */
  private val LpaIters = 4

  /** `graph_label_propagation` — community detection by synchronous
    * label propagation (Raghavan et al. 2007): every node starts as
    * its own label; each of [[LpaIters]] fixed rounds, a node adopts
    * the label held by most of its UNDIRECTED neighbors, ties broken
    * by smallest label — the deterministic spelling of the classic
    * random-tie LPA, so both engines converge identically (and the
    * fixed round count sidesteps synchronous LPA's oscillation
    * non-termination, the pagerank fixed-iteration doctrine).
    *
    * Scale: per round ONE join of the bidirected edge list against the
    * label vector and one (node, label) hash aggregate with a struct
    * argmax folded in — all DataFrames, nothing on the driver, label
    * vector localCheckpoint'd per round so the plan doesn't double.
    * Argmax by `max(struct(count, −label))` is one aggregate, not a
    * window — no per-node sort.
    */
  def graphLabelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the near-complete trade graph collapses LPA to one community in
    // round 1 (min-label floods every neighborhood) — communities only
    // exist in the PREFERRED-PARTNER structure, so propagate over each
    // nation's top-2 trade partners (rank by cnt desc, dst tie-break:
    // deterministic), the standard sparsification for dense graphs
    val rankW = Window.partitionBy("src").orderBy(desc("cnt"), col("dst"))
    val e = tradeEdgesWeighted(spark, sfDir)
      .withColumn("rn", row_number().over(rankW))
      .where(col("rn") <= 2).select("src", "dst")
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    // undirected neighbor relation: both orientations, deduped so a
    // mutual preferred pair still casts ONE vote per neighbor
    val bidir0 = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
    lpaLabels(nodes, bidir0, LpaIters)
      .select(col("node").as("nationkey"), col("lbl").as("community"))
      .orderBy("nationkey")
  }

  /** Synchronous LPA over a DEDUPED bidirected neighbor list `bidir0`
    * (`u`, `v` long): each of `iters` rounds every node adopts the
    * argmax-vote label of its in-neighbors — max count, ties to the
    * SMALLEST label; nodes receiving no vote keep their label. Returns
    * (`node`, `lbl`) for every node in `nodes`.
    *
    * `localBound` = 0 disables the driver-local fast path (the
    * [[pagerank]] spec hook) — Round13OpsSpec pins the two paths
    * label-for-label on seeded random graphs, so the replayed argmax
    * (maxBy (count, −label)) cannot drift from the distributed
    * max(struct(c, −lbl)) spelling.
    */
  private[graft] def lpaLabels(nodes: DataFrame, bidir0: DataFrame,
      iters: Int, localBound: Int = LocalRankEdgeBound): DataFrame = {
    val spark = nodes.sparkSession
    // driver-local fast path (the dampedRankLocal doctrine): replay the
    // argmax rounds over the bounded edge list; non-endpoint nodes
    // never receive a vote and keep their own id
    val grabbedL =
      if (localBound > 0)
        bidir0.select(col("u").cast("long"), col("v").cast("long"))
          .limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localBound > 0 && grabbedL.length <= localBound) {
      val es = grabbedL.map(r => (r.getLong(0), r.getLong(1)))
      val endpoints = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      var lbl = endpoints.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        val votes = es.groupBy(_._2).view.mapValues { in =>
          in.groupBy(p => lbl(p._1)).view.mapValues(_.length)
            .toSeq.maxBy { case (l, c) => (c, -l) }._1
        }.toMap
        lbl = endpoints.map(n => n -> votes.getOrElse(n, lbl(n))).toMap
      }
      return nodes
        .join(broadcast(localRankDf(spark,
          endpoints.map(n => (n, lbl(n))))), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("lrank"), col("node")).as("lbl"))
    }
    val bidir = bidir0.truncateLineage()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
      .truncateLineage()
    for (_ <- 1 to iters) {
      val votes = bidir
        .join(labels.select(col("node").as("u"), col("lbl")), "u")
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max(struct(col("c").as("c"), (-col("lbl")).as("ml"))).as("m"))
        .select(col("v").as("node"), (-col("m.ml")).as("win"))
      val next = labels
        .join(votes, Seq("node"), "left")
        .select(col("node"), coalesce(col("win"), col("lbl")).as("lbl"))
        .truncateLineage()
      // replaced label vector's blocks are dead once `next` is
      // materialized (the ConnectedComponents doctrine)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(labels)
      labels = next
    }
    // the FINAL labels checkpoint stays — the returned plan reads it
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(bidir)
    labels
  }

  val graphLabelPropagationSql: String = {
    val rounds = (1 to LpaIters).map { r =>
      val prev = s"l${r - 1}"
      s"""v$r AS MATERIALIZED (
         |  SELECT b.v AS node, p.lbl, COUNT(*) AS c
         |  FROM bidir b JOIN $prev p ON p.node = b.u
         |  GROUP BY 1, 2
         |), a$r AS MATERIALIZED (
         |  SELECT node, max(struct_pack(c := c, ml := -lbl)) AS m
         |  FROM v$r GROUP BY node
         |), l$r AS MATERIALIZED (
         |  SELECT p.node,
         |         CAST(COALESCE(-(a.m).ml, p.lbl) AS BIGINT) AS lbl
         |  FROM $prev p LEFT JOIN a$r a USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, wedges AS MATERIALIZED (
       |  SELECT src, dst, cnt FROM counted
       |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted)
       |), top2 AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |           row_number() OVER (PARTITION BY src
       |                              ORDER BY cnt DESC, dst) AS rn
       |    FROM wedges) WHERE rn <= 2
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), bidir AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM top2
       |  UNION
       |  SELECT dst AS u, src AS v FROM top2
       |), l0 AS MATERIALIZED (
       |  SELECT node, node AS lbl FROM nodes
       |), $rounds
       |SELECT node AS nationkey, lbl AS community
       |FROM l$LpaIters ORDER BY nationkey""".stripMargin
  }

  val graphHitsSql: String = {
    def half(prev: String, out: String, from: String, to: String): String =
      s"""${out}_raw AS MATERIALIZED (
         |  SELECT e.$to AS node, SUM(p.score) AS s
         |  FROM edges e JOIN $prev p ON p.node = e.$from
         |  GROUP BY e.$to
         |), $out AS MATERIALIZED (
         |  SELECT n.node,
         |         CAST(COALESCE(r.s, 0) * 1000000 //
         |              GREATEST((SELECT MAX(COALESCE(r2.s, 0)) FROM nodes n2
         |               LEFT JOIN ${out}_raw r2 ON r2.node = n2.node), 1)
         |              AS BIGINT) AS score
         |  FROM nodes n LEFT JOIN ${out}_raw r ON r.node = n.node
         |)""".stripMargin
    val rounds = (1 to HitsIters).map { i =>
      half(if (i == 1) "h0" else s"h${i - 1}", s"a$i", "src", "dst") + ", " +
        half(s"a$i", s"h$i", "dst", "src")
    }.mkString(", ")
    s"""WITH $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), h0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
       |), $rounds
       |SELECT n.node AS nationkey, h.score AS hub_1e6, a.score AS auth_1e6
       |FROM nodes n
       |JOIN h$HitsIters h ON h.node = n.node
       |JOIN a$HitsIters a ON a.node = n.node
       |ORDER BY hub_1e6 DESC, nationkey""".stripMargin
  }

  /** `graph_clustering_coeff` — local clustering coefficient per node
    * (Watts & Strogatz 1998): cc(v) = 2·t(v) / (d(v)·(d(v)−1)) where
    * t(v) is the number of triangles through v and d(v) the undirected
    * degree — how close each nation's trading neighborhood is to a
    * clique. Scaled-integer spelling: cc_1e6 = 2·t·10⁶ DIV (d·(d−1)),
    * 0 for degree < 2 (the coefficient is undefined there; 0 is the
    * standard convention).
    *
    * Scale: triangle counts come from the same ordered two-path join
    * as graph_triangles (each triangle found exactly once, corners
    * exploded), degrees from one aggregate over the bidirected
    * adjacency — all joins key on single node ids so they partition by
    * vertex at real scale; here the edge list is dimension-sized and
    * broadcast. No new shuffle shape beyond the triangle query.
    */
  def graphClusteringCoeff(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persistIntermediate
    val deg = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
    val e2 = und.select(col("a").as("b2"), col("b").as("c"))
    val e3 = und.select(col("a").as("a3"), col("b").as("c3"))
    val tri = und
      .join(broadcast(e2), col("b") === col("b2"))
      .join(broadcast(e3), col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    val corners = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("nationkey"))
      .join(broadcast(deg), col("nationkey") === col("x"), "left")
      .join(broadcast(corners), col("nationkey") === col("node"), "left")
      .select(col("nationkey"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("n_triangles"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr("(2 * coalesce(tri, 0L) * 1000000L) DIV (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_1e6"))
      .orderBy("nationkey")
  }

  val graphClusteringCoeffSql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), deg AS MATERIALIZED (
       |  SELECT x, COUNT(*) AS deg FROM (
       |    SELECT a AS x FROM und UNION ALL SELECT b FROM und
       |  ) GROUP BY x
       |), tri AS MATERIALIZED (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |), corners AS MATERIALIZED (
       |  SELECT node, COUNT(*) AS tri FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri
       |  ) GROUP BY node
       |)
       |SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey,
       |       COALESCE(d.deg, 0) AS deg,
       |       COALESCE(c.tri, 0) AS n_triangles,
       |       CASE WHEN COALESCE(d.deg, 0) >= 2
       |            THEN CAST(2 * COALESCE(c.tri, 0) * 1000000
       |                      // (d.deg * (d.deg - 1)) AS BIGINT)
       |            ELSE 0 END AS cc_1e6
       |FROM nation n
       |LEFT JOIN deg d ON d.x = CAST(n.n_nationkey AS BIGINT)
       |LEFT JOIN corners c ON c.node = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY nationkey""".stripMargin

  private val KcoreK = 3
  private val KcoreRounds = 5

  /** `graph_kcore` — k-core membership (Seidman 1983) by synchronous
    * peeling: repeatedly delete every node whose degree among the
    * SURVIVORS falls below k; what remains is the maximal subgraph
    * where every node keeps ≥ k neighbors — the standard "dense
    * nucleus" extractor (spam cores, cohesive trading blocs).
    * [[KcoreRounds]] fixed synchronous rounds (the pagerank
    * fixed-iteration doctrine: both engines unroll the same rounds, so
    * the gate can't drift on convergence detection); on this corpus
    * the survivor set reaches its fixpoint well inside 5 rounds.
    *
    * Scale: per round one join of the adjacency against the survivor
    * vector (both ends must survive) plus one degree aggregate —
    * exactly the distributed peeling step; the survivor vector is
    * node-sized, broadcast here, localCheckpoint'd so the plan stays
    * O(1) per round instead of nesting all prior rounds.
    */
  def graphKcore(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj0 = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
    kcoreSurvivors(adj0, KcoreK, KcoreRounds)
      .select(col("node").as("nationkey"), col("core_deg"))
      .orderBy("nationkey")
  }

  /** Synchronous k-core peeling over a bidirected adjacency `adj0`
    * (`x`, `nbr` long, both orientations of each undirected edge):
    * `rounds` fixed rounds of "recount degree among survivors, drop
    * < k". Returns (`node`, `core_deg`) for the surviving members.
    *
    * `localBound` = 0 disables the driver-local replay (the
    * [[pagerank]] spec hook); Round13OpsSpec pins local == distributed
    * member-for-member on seeded random graphs.
    */
  private[graft] def kcoreSurvivors(adj0: DataFrame, k: Int, rounds: Int,
      localBound: Int = LocalRankEdgeBound): DataFrame = {
    val spark = adj0.sparkSession
    // driver-local fast path (the dampedRankLocal doctrine): replay the
    // peels over the bounded undirected adjacency
    val grabbedK =
      if (localBound > 0)
        adj0.select(col("x").cast("long"), col("nbr").cast("long"))
          .limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localBound > 0 && grabbedK.length <= localBound) {
      val es = grabbedK.map(r => (r.getLong(0), r.getLong(1)))
      var surv = es.map(_._1).distinct.toSet
      var degL = Map.empty[Long, Long]
      for (_ <- 1 to rounds) {
        degL = es.filter(p => surv(p._1) && surv(p._2))
          .groupBy(_._1).view.mapValues(_.length.toLong).toMap
        surv = degL.filter(_._2 >= k).keySet
      }
      val rows = degL.toSeq.filter(_._2 >= k).sortBy(_._1)
      return localRankDf(spark, rows.toArray)
        .select(col("node"), col("lrank").as("core_deg"))
    }
    val adj = adj0.truncateLineage(true)
    var survivors = adj.select("x").distinct().truncateLineage(true)
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      val nextDeg = adj
        .join(broadcast(survivors), "x")
        .join(broadcast(survivors.select(col("x").as("nbr"))), "nbr")
        .groupBy("x").agg(count(lit(1)).as("deg"))
        .truncateLineage(true)
      // replaced rounds' blocks are dead once nextDeg is materialized
      // (the ConnectedComponents doctrine); the FINAL deg checkpoint
      // stays — the returned plan reads it
      if (deg != null)
        org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(deg)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(survivors)
      deg = nextDeg
      survivors = deg.where(col("deg") >= k).select("x")
        .truncateLineage(true)
    }
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(survivors)
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(adj)
    deg.where(col("deg") >= k)
      .select(col("x").cast("long").as("node"), col("deg").as("core_deg"))
  }

  val graphKcoreSql: String = {
    val rounds = (1 to KcoreRounds).map { r =>
      val prev = s"n${r - 1}"
      s"""d$r AS MATERIALIZED (
         |  SELECT a.x, COUNT(*) AS deg
         |  FROM adj a
         |  JOIN $prev sx ON sx.x = a.x
         |  JOIN $prev sy ON sy.x = a.nbr
         |  GROUP BY a.x
         |), n$r AS MATERIALIZED (
         |  SELECT x FROM d$r WHERE deg >= $KcoreK
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS x, b AS nbr FROM und
       |  UNION ALL
       |  SELECT b AS x, a AS nbr FROM und
       |), n0 AS MATERIALIZED (
       |  SELECT DISTINCT x FROM adj
       |), $rounds
       |SELECT x AS nationkey, deg AS core_deg
       |FROM d$KcoreRounds WHERE deg >= $KcoreK
       |ORDER BY nationkey""".stripMargin
  }

  /** `graph_rich_club` — the rich-club coefficient φ(k) for every
    * degree threshold k: among nodes of degree > k, the realized
    * fraction of possible edges (Colizza et al. 2006) — "do the hubs
    * trade with each other", the structural question degree and
    * assortativity each only half-answer. Pure integer counting: a
    * pair contributes to every k below min(deg a, deg b), so one
    * min-degree rollup + a threshold-range join produce all φ(k) rows
    * in two dimension-sized aggregates; φ is floored ppm of
    * 2·E_k / (n_k·(n_k−1)).
    *
    * Scale: degree and pair frames are node/edge-sized; the k range is
    * bounded by max degree. Nothing touches the fact table after the
    * shared edge derivation.
    */
  def graphRichClub(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("x"))
      .unionByName(und.select(col("b").as("x")))
    val deg = adj.groupBy("x").agg(count(lit(1)).as("deg"))
      .truncateLineage(true)
    val pairMin = und
      .join(deg.select(col("x").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("deg").as("db")), "b")
      .select(least(col("da"), col("db")).as("mind"))
    val ks = spark.range(0, 24).select(col("id").as("k"))
    val nodesK = ks.crossJoin(deg).where(col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val edgesK = ks.crossJoin(pairMin).where(col("mind") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    nodesK
      .join(edgesK, Seq("k"), "left")
      .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
      .where(col("n_nodes") >= 2)
      .select(col("k"), col("n_nodes"), col("n_edges"),
        expr("n_edges * 2000000L div (n_nodes * (n_nodes - 1L))")
          .as("phi_ppm"))
      .orderBy("k")
  }

  val graphRichClubSql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), deg AS MATERIALIZED (
       |  SELECT x, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM (SELECT a AS x FROM und UNION ALL SELECT b AS x FROM und)
       |  GROUP BY x
       |), pm AS MATERIALIZED (
       |  SELECT least(da.deg, db.deg) AS mind
       |  FROM und
       |  JOIN deg da ON da.x = und.a
       |  JOIN deg db ON db.x = und.b
       |), nk AS MATERIALIZED (
       |  SELECT r.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |  FROM range(0, 24) r(k) JOIN deg d ON d.deg > r.k
       |  GROUP BY r.k
       |), ek AS MATERIALIZED (
       |  SELECT r.k, CAST(COUNT(*) AS BIGINT) AS n_edges
       |  FROM range(0, 24) r(k) JOIN pm ON pm.mind > r.k
       |  GROUP BY r.k
       |)
       |SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
       |       CAST(COALESCE(ek.n_edges, 0) * 2000000
       |            // (nk.n_nodes * (nk.n_nodes - 1)) AS BIGINT) AS phi_ppm
       |FROM nk LEFT JOIN ek ON ek.k = nk.k
       |WHERE nk.n_nodes >= 2
       |ORDER BY nk.k""".stripMargin

  private val CorenessRounds = 12

  /** `graph_coreness` — the FULL core decomposition (every node's core
    * number, not just membership at one fixed k like [[graphKcore]]):
    * computed by the h-index fixpoint of Lü et al. 2016 — core⁰ = deg,
    * core^{t+1}(v) = H({core^t(u) : u ∈ N(v)}), which converges to the
    * peeling coreness without ANY sequential peel. The h-index is a
    * per-node window: sort neighbor values descending, H = max over
    * rows of min(rank, value) — pure integers. Fixed
    * [[CorenessRounds]] rounds (the pagerank unroll doctrine); the
    * spec proves the fixpoint equals brute-force peeling on this
    * corpus.
    *
    * Scale: THIS is why the operator exists — sequential peeling is
    * inherently serial (each peel depends on the last), while the
    * h-index iteration is one join + one window per round, every round
    * fully distributed, converging in O(diameter-ish) rounds. The
    * node-sized core frame broadcasts; the edge frame never reshuffles.
    */
  def graphCoreness(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj0 = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
    corenessLabels(adj0, CorenessRounds)
      .select(col("node").as("nationkey"), col("coreness"))
      .orderBy("nationkey")
  }

  /** The h-index coreness fixpoint over a bidirected adjacency `adj0`
    * (`x`, `nbr` long): core⁰ = deg, core^{t+1}(x) = max_i min(i, nc_i)
    * with neighbors sorted (coreness desc, id asc). Returns
    * (`node`, `coreness`) for every edge endpoint.
    *
    * `localBound` = 0 disables the driver-local replay (the
    * [[pagerank]] spec hook); Round13OpsSpec pins local == distributed
    * value-for-value on seeded random graphs, so the replayed sort
    * order can't drift from the window spelling's (desc nc, nbr).
    */
  private[graft] def corenessLabels(adj0: DataFrame, rounds: Int,
      localBound: Int = LocalRankEdgeBound): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = adj0.sparkSession
    // driver-local fast path: the h-index iteration — neighbors sorted
    // by (coreness desc, id), c(x) = max_i min(i, nc_i) — replayed over
    // the bounded adjacency, identical tie order to the window spelling
    val grabbedC =
      if (localBound > 0)
        adj0.select(col("x").cast("long"), col("nbr").cast("long"))
          .limit(localBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localBound > 0 && grabbedC.length <= localBound) {
      val es = grabbedC.map(r => (r.getLong(0), r.getLong(1)))
      val nbrs = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var coreL = nbrs.view.mapValues(_.length.toLong).toMap
      for (_ <- 1 to rounds) {
        coreL = nbrs.map { case (x, ns) =>
          val sorted = ns.map(nb => (coreL(nb), nb))
            .sortBy { case (nc, nb) => (-nc, nb) }
          x -> sorted.zipWithIndex
            .map { case ((nc, _), i) => math.min(i + 1L, nc) }.max
        }
      }
      return localRankDf(spark, coreL.toArray.sortBy(_._1))
        .select(col("node"), col("lrank").as("coreness"))
    }
    val adj = adj0.truncateLineage(true)
    var core = adj.groupBy("x").agg(count(lit(1)).as("c"))
      .truncateLineage(true)
    val w = Window.partitionBy("x").orderBy(desc("nc"), col("nbr"))
    for (_ <- 1 to rounds) {
      val next = adj
        .join(broadcast(core.select(col("x").as("nbr"), col("c").as("nc"))),
          "nbr")
        .withColumn("rn", row_number().over(w))
        .groupBy("x")
        .agg(max(least(col("rn").cast("long"), col("nc"))).as("c"))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(core)
      core = next
    }
    // the FINAL core checkpoint stays (the returned plan reads it);
    // the adjacency's blocks are dead once the loop is done
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(adj)
    core.select(col("x").cast("long").as("node"), col("c").as("coreness"))
  }

  val graphCorenessSql: String = {
    val rounds = (1 to CorenessRounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT x, CAST(MAX(least(rn, nc)) AS BIGINT) AS c
         |  FROM (
         |    SELECT a.x, p.c AS nc,
         |           row_number() OVER (PARTITION BY a.x
         |                              ORDER BY p.c DESC, a.nbr) AS rn
         |    FROM adj a JOIN c${r - 1} p ON p.x = a.nbr
         |  ) GROUP BY x
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS x, b AS nbr FROM und
       |  UNION ALL
       |  SELECT b AS x, a AS nbr FROM und
       |), c0 AS (
       |  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM adj GROUP BY x
       |), $rounds
       |SELECT x AS nationkey, c AS coreness
       |FROM c$CorenessRounds ORDER BY nationkey""".stripMargin
  }

  /** `graph_adamic_adar` — Adamic–Adar link prediction (Adamic & Adar
    * 2003): for node pairs sharing neighbors,
    * AA(x,y) = Σ_{z ∈ Γx∩Γy} 1/log(deg z) — like resource allocation
    * but with a logarithmic hub discount, the classic middle ground
    * between raw common-neighbor counts (no discount) and RA's 1/deg
    * (aggressive discount).
    *
    * Determinism: the per-neighbor term is 10¹² DIV log2_1e6(deg z)
    * via the [[graft.functions.IntegerLog2]] kernel (bit length +
    * shared 256-entry mantissa table — bit-identical in both engines
    * by construction), summed as BIGINT: aa_1e6 ≈ 10⁶/log₂(deg).
    * A shared neighbor touches both endpoints, so deg(z) ≥ 2 and
    * log2_1e6 ≥ 10⁶ — the division is always defined.
    *
    * Scale: identical shuffle shape to graph_resource_alloc — the
    * co-occurrence self-join keyed on the shared neighbor plus one
    * broadcast degree join, with the same in-code [[HubNeighborCap]]
    * hub cut on candidate generation (a super-hub's 1/log term barely
    * moves the score); the log kernel is a codegen'd narrow map.
    */
  def graphAdamicAdar(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.IntegerLog2
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      .persistIntermediate
    val deg = adj.groupBy(col("x").as("z")).agg(count(lit(1)).as("deg"))
    val cadj = capHubs(adj, deg.select(col("z").as("nbr"), col("deg")))
    cadj.select(col("x"), col("nbr"))
      .join(broadcast(cadj.select(col("x").as("y"), col("nbr"))), "nbr")
      .where(col("x") < col("y"))
      .join(broadcast(deg), col("nbr") === col("z"))
      .withColumn("lg", IntegerLog2.log2s(col("deg")))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000000000L DIV lg")).as("aa_1e6"))
      .orderBy("x", "y")
  }

  val graphAdamicAdarSql: String = {
    val log2deg = graft.functions.IntegerLog2.log2Sql("d.deg")
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS x, b AS nbr FROM und
       |  UNION ALL
       |  SELECT b AS x, a AS nbr FROM und
       |), deg AS MATERIALIZED (
       |  SELECT x AS z, COUNT(*) AS deg FROM adj GROUP BY x
       |), cadj AS MATERIALIZED (
       |  SELECT a.x, a.nbr FROM adj a
       |  JOIN deg d ON d.z = a.nbr AND d.deg <= $HubNeighborCap
       |)
       |SELECT a1.x, a2.x AS y, COUNT(*) AS common,
       |       CAST(SUM(1000000000000 // $log2deg) AS BIGINT) AS aa_1e6
       |FROM cadj a1
       |JOIN cadj a2 ON a1.nbr = a2.nbr AND a1.x < a2.x
       |JOIN deg d ON d.z = a1.nbr
       |GROUP BY 1, 2
       |ORDER BY a1.x, y""".stripMargin
  }

  /** `graph_reciprocity` — edge reciprocity of the DIRECTED trade graph:
    * the fraction of non-loop edges (u→v) whose reverse (v→u) also
    * clears the trade threshold — how symmetric are trading
    * relationships? (Directed-graph health metric; the thresholded
    * derivation makes it non-trivial: raw trade is near-complete, the
    * SPARSE graph is not.) Reported as n_edges, n_reciprocal and an
    * integral ppm ratio.
    *
    * Scale: one self-join of the edge list on the swapped key — edge-
    * keyed hash join, dimension-sized here, vertex-partitioned at real
    * scale. One aggregate.
    */
  def graphReciprocity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir).where(col("src") =!= col("dst"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    edges.join(broadcast(rev.withColumn("has_rev", lit(1L))),
        Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("n_edges"),
        sum(coalesce(col("has_rev"), lit(0L))).as("n_reciprocal"))
      .select(col("n_edges"), col("n_reciprocal"),
        expr("n_reciprocal * 1000000L DIV n_edges").as("recip_ppm"))
  }

  val graphReciprocitySql: String =
    s"""WITH $EdgeCtes, e AS MATERIALIZED (
       |  SELECT src, dst FROM edges WHERE src != dst
       |)
       |SELECT COUNT(*) AS n_edges,
       |       CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_reciprocal,
       |       CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
       |            * 1000000 // COUNT(*) AS BIGINT) AS recip_ppm
       |FROM e
       |LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src""".stripMargin

  /** `graph_modularity` — Newman–Girvan modularity of a given partition
    * of the trade graph, here the REGION partition (does intra-region
    * trade exceed the random-graph expectation?): per community c,
    * contrib(c) = m_c/m − (d_c/2m)², Q = Σ contrib. Reported PER
    * COMMUNITY (the chi2 per-cell doctrine — a summed Q would be an
    * order-dependent float sum; per-community contributions are each
    * one fixed integer formula): contrib_1e6 = (4·m·m_c − d_c²)·10⁶
    * DIV (4·m²), exact BIGINTs throughout.
    *
    * This is the evaluation half of community detection — score any
    * labelling (label propagation, regions, a business hierarchy)
    * against the graph; detection lives in graph_label_propagation.
    *
    * Scale: one broadcast join tags each undirected edge with its two
    * communities; m_c and d_c are one aggregate each over edge-ends
    * keyed by the community domain. Nothing iterates.
    */
  def graphModularity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persistIntermediate
    val nat = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"),
        col("n_regionkey").cast("long").as("community"))
    val tagged = und
      .join(broadcast(nat.select(col("node").as("a"), col("community").as("ca"))), "a")
      .join(broadcast(nat.select(col("node").as("b"), col("community").as("cb"))), "b")
    val m = und.agg(count(lit(1)).as("m"))
    val mc = tagged.where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("m_c"))
    val dc = tagged.select(col("ca").as("community"))
      .unionByName(tagged.select(col("cb").as("community")))
      .groupBy("community").agg(count(lit(1)).as("d_c"))
    table(spark, sfDir, "region")
      .select(col("r_regionkey").cast("long").as("community"))
      .join(broadcast(mc), Seq("community"), "left")
      .join(broadcast(dc), Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"),
        coalesce(col("m_c"), lit(0L)).as("m_c"),
        coalesce(col("d_c"), lit(0L)).as("d_c"),
        // m is the TOTAL edge count, so 4·m² (and d_c²·10⁶) clears 2⁶³
        // on a ~10⁹-edge graph — whole contribution widened through
        // DECIMAL(38,0), the analytics_pareto overflow class
        // (tools/audit_overflow.py); DIV returns LONG either way
        expr("(CAST(4 AS DECIMAL(38,0)) * m * coalesce(m_c, 0L)" +
          " - CAST(coalesce(d_c, 0L) AS DECIMAL(38,0)) * coalesce(d_c, 0L))" +
          " * 1000000 DIV (CAST(4 AS DECIMAL(38,0)) * m * m)")
          .as("contrib_1e6"))
      .orderBy("community")
  }

  val graphModularitySql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), nat AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node,
       |         CAST(n_regionkey AS BIGINT) AS community
       |  FROM nation
       |), tagged AS MATERIALIZED (
       |  SELECT u.a, u.b, na.community AS ca, nb.community AS cb
       |  FROM und u
       |  JOIN nat na ON na.node = u.a
       |  JOIN nat nb ON nb.node = u.b
       |), m AS MATERIALIZED (
       |  SELECT COUNT(*) AS m FROM und
       |), mc AS MATERIALIZED (
       |  SELECT ca AS community, COUNT(*) AS m_c
       |  FROM tagged WHERE ca = cb GROUP BY ca
       |), dc AS MATERIALIZED (
       |  SELECT community, COUNT(*) AS d_c FROM (
       |    SELECT ca AS community FROM tagged
       |    UNION ALL
       |    SELECT cb FROM tagged
       |  ) GROUP BY community
       |)
       |SELECT CAST(r.r_regionkey AS BIGINT) AS community,
       |       COALESCE(mc.m_c, 0) AS m_c,
       |       COALESCE(dc.d_c, 0) AS d_c,
       |       CAST((CAST(4 AS HUGEINT) * m.m * COALESCE(mc.m_c, 0)
       |             - CAST(COALESCE(dc.d_c, 0) AS HUGEINT) * COALESCE(dc.d_c, 0))
       |            * 1000000 // (CAST(4 AS HUGEINT) * m.m * m.m) AS BIGINT) AS contrib_1e6
       |FROM region r
       |LEFT JOIN mc ON mc.community = CAST(r.r_regionkey AS BIGINT)
       |LEFT JOIN dc ON dc.community = CAST(r.r_regionkey AS BIGINT)
       |CROSS JOIN m
       |ORDER BY community""".stripMargin

  /** `graph_assortativity` — degree assortativity (Newman 2002): the
    * Pearson correlation of endpoint degrees across all edge-ends — do
    * high-degree nations trade with other hubs (assortative, r > 0) or
    * with the periphery (disassortative, r < 0)? Social networks trend
    * positive, technological/trade networks negative; a single number
    * summarizing the mixing pattern.
    *
    * Determinism: degrees are tiny integers, so all five sufficient
    * statistics are exact BIGINT sums over the bidirected pair list;
    * the final r is one fixed IEEE op sequence (the [[StatQueries]]
    * doctrine). Each undirected edge contributes both orientations —
    * the standard symmetric spelling that makes r independent of edge
    * storage order.
    *
    * Scale: one degree aggregate plus two broadcast joins over the
    * edge list keyed by vertex — the graph_neighbor_overlap shuffle
    * shape, nothing new.
    */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val edges = tradeEdges(spark, sfDir)
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .persistIntermediate
    val deg = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val pairs = adj
      .join(broadcast(deg.select(col("node").as("u"), col("deg").as("dx"))), "u")
      .join(broadcast(deg.select(col("node").as("v"), col("deg").as("dy"))), "v")
    val stats = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum("dx").as("sx"), sum("dy").as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
    val nD = col("n_pairs").cast(DoubleType)
    stats.select(col("n_pairs"),
      ((nD * col("sxy").cast(DoubleType) -
        col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
        (sqrt(nD * col("sxx").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
          sqrt(nD * col("syy").cast(DoubleType) -
            col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
        .as("assortativity"))
  }

  val graphAssortativitySql: String =
    s"""WITH $EdgeCtes, und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src != dst
       |), adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM und
       |  UNION ALL
       |  SELECT b AS u, a AS v FROM und
       |), deg AS MATERIALIZED (
       |  SELECT u AS node, COUNT(*) AS deg FROM adj GROUP BY u
       |), s AS (
       |  SELECT COUNT(*) AS n_pairs,
       |         CAST(SUM(dx.deg) AS BIGINT) AS sx,
       |         CAST(SUM(dy.deg) AS BIGINT) AS sy,
       |         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
       |         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
       |         CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS syy
       |  FROM adj
       |  JOIN deg dx ON dx.node = adj.u
       |  JOIN deg dy ON dy.node = adj.v
       |)
       |SELECT n_pairs,
       |       (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |       (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |        sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS assortativity
       |FROM s""".stripMargin

  private val SsspRounds = 5
  private val SsspInf = 1000000000000000L

  /** `graph_sssp_weighted` — single-source shortest paths with edge
    * costs, Bellman–Ford style synchronous relaxation (the Pregel/
    * GraphX SSSP shape): dist'(v) = min(dist v, min over in-edges
    * (u,v) of dist(u) + cost(u,v)), [[SsspRounds]] fixed rounds from
    * source node 0. Edge cost is 10⁹ DIV cnt — heavier trade = cheaper
    * hop — so the result ranks nations by how cheaply goods reach them
    * from nation 0 through the trade network. Integer throughout;
    * unreachable nodes surface as NULL (both engines agree: the
    * [[SsspInf]] sentinel never leaves the engine).
    *
    * Scale: per round ONE join of the directed edge list against the
    * distance vector plus a min-aggregate — the textbook distributed
    * Bellman–Ford; the distance vector is node-sized and broadcast,
    * localCheckpoint'd per round (the pagerank doctrine). Fixed rounds
    * bound the gate; a convergence loop would test "any dist changed"
    * per round at cluster scale.
    */
  def graphSsspWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val wedges = tradeEdgesWeighted(spark, sfDir)
      .select(col("src"), col("dst"),
        expr("1000000000L DIV cnt").as("cost"))
      .truncateLineage(true)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    var dist = nodes
      .withColumn("dist",
        when(col("node") === 0L, lit(0L)).otherwise(lit(SsspInf)))
      .truncateLineage(true)
    for (_ <- 1 to SsspRounds) {
      val relax = wedges
        .join(broadcast(dist.select(col("node").as("src"), col("dist"))), "src")
        .where(col("dist") < SsspInf)
        .groupBy(col("dst")).agg(min(col("dist") + col("cost")).as("via"))
      dist = dist
        .join(broadcast(relax), col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("dist"), coalesce(col("via"), lit(SsspInf))).as("dist"))
        .truncateLineage(true)
    }
    dist
      .select(col("node").as("nationkey"),
        when(col("dist") < SsspInf, col("dist")).as("dist_cost"))
      .orderBy("nationkey")
  }

  val graphSsspWeightedSql: String = {
    val rounds = (1 to SsspRounds).map { r =>
      val prev = s"s${r - 1}"
      s"""v$r AS MATERIALIZED (
         |  SELECT e.dst, MIN(p.dist + e.cost) AS via
         |  FROM wedges e JOIN $prev p ON p.node = e.src
         |  WHERE p.dist < $SsspInf
         |  GROUP BY e.dst
         |), s$r AS MATERIALIZED (
         |  SELECT p.node, LEAST(p.dist, COALESCE(v.via, $SsspInf)) AS dist
         |  FROM $prev p LEFT JOIN v$r v ON v.dst = p.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, wedges AS MATERIALIZED (
       |  SELECT src, dst, CAST(1000000000 // cnt AS BIGINT) AS cost
       |  FROM counted
       |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted)
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), s0 AS MATERIALIZED (
       |  SELECT node,
       |         CASE WHEN node = 0 THEN 0
       |              ELSE CAST($SsspInf AS BIGINT) END AS dist
       |  FROM nodes
       |), $rounds
       |SELECT node AS nationkey,
       |       CASE WHEN dist < $SsspInf THEN dist END AS dist_cost
       |FROM s$SsspRounds ORDER BY nationkey""".stripMargin
  }

  // ---- bipartite co-purchase projection -------------------------------

  /** `graph_copurchase` — the part-part projection of the
    * customer×part bipartite purchase graph: part pairs bought by ≥ 3
    * common customers, ranked by co-purchase count — the
    * collaborative-filtering backbone ("customers who bought X also
    * bought Y"). Baskets dedupe to DISTINCT (customer, part) BEFORE the
    * pairing, so one customer re-ordering a pair many times counts
    * once.
    *
    * Scale: the projection self-join is keyed by customer and is
    * quadratic in BASKET SIZE, not in customers or parts — the
    * standard market-basket shape. Whale baskets are CAPPED in code,
    * not in a comment: each basket keeps its [[CopurchaseBasketCap]]
    * lowest part ids (row_number per customer) BEFORE the self-join,
    * bounding any one customer's pair fan-out at cap·(cap−1)/2
    * (~131k pairs) instead of letting a million-item basket become a
    * 10¹²-pair hot key. The cap is deterministic (order by part) and
    * INACTIVE on this corpus — measured max distinct-part basket is 90
    * at sf0.01 / 105 at sf0.1, 5× under the cap, and TPC-H basket size
    * grows with orders-per-customer (constant), not with SF — so the
    * gate hash is the uncapped answer; the oracle applies the identical
    * cap. Support floor + top-100 keep the output ranked and
    * deterministic (count desc, pair asc).
    */
  def graphCopurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val baskets = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
    copurchasePairs(baskets, minSupport = 3)
      .orderBy(desc("n_common"), col("p1"), col("p2"))
      .limit(100)
      .transform(RefQueries.gateSort(_, "p1", "p2"))
  }

  /** Deterministic whale-basket cap for the co-purchase projection:
    * per-customer pair work is bounded by cap·(cap−1)/2. 512 is ~5×
    * the largest basket this corpus produces at any gate SF (90/105
    * measured), so the cap changes nothing here while making the
    * operator safe on real retail-shaped data where a single
    * registry/bot account can hold millions of items.
    */
  private[graft] val CopurchaseBasketCap = 512

  /** The capped part-part projection over a (`cust`, `part`) basket
    * frame (duplicates allowed — deduped here): keep each customer's
    * `cap` lowest part ids, self-join on customer, count
    * co-occurrences, floor at `minSupport`. Factored out so
    * Round13OpsSpec can feed a synthetic whale basket and assert the
    * pair count stays bounded.
    *
    * ONE exchange serves the whole per-customer prefix: the explicit
    * repartition(cust) satisfies the dedup's ClusteredDistribution
    * (cust ⊆ (cust, part)) and the cap window's partitionBy(cust),
    * whose WindowGroupLimit keeps memory bounded even pre-cap — the
    * naive spelling paid a separate exchange for each (measured
    * 2.68 → 2.20 s at sf0.1). The self-join sides still re-exchange
    * off the cache (AQE leaves a cached plan's output partitioning
    * unreliable for reuse), but on capped, deduped rows. (A join-free
    * collect_list + transform/slice pair lambda was measured WORSE —
    * 4.97 s — array HOFs run interpreted; the plan-shape pitfalls
    * note applies.)
    */
  private[graft] def copurchasePairs(baskets: DataFrame, minSupport: Int,
      cap: Int = CopurchaseBasketCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy("cust").orderBy("part")
    val capped = baskets
      .repartition(col("cust"))
      .dropDuplicates("cust", "part")
      .withColumn("rn", row_number().over(byCust))
      .where(col("rn") <= cap)
      .select("cust", "part")
      .persistHotIntermediate
    capped.select(col("cust"), col("part").as("p1"))
      .join(capped.select(col("cust"), col("part").as("p2")), "cust")
      .where(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minSupport)
  }

  val graphCopurchaseSql: String =
    s"""WITH baskets AS MATERIALIZED (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), capped AS MATERIALIZED (
      |  SELECT cust, part FROM baskets
      |  QUALIFY row_number() OVER (PARTITION BY cust ORDER BY part)
      |          <= $CopurchaseBasketCap
      |), pairs AS MATERIALIZED (
      |  SELECT a.part AS p1, b.part AS p2, COUNT(*) AS n_common
      |  FROM capped a JOIN capped b
      |    ON a.cust = b.cust AND a.part < b.part
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT * FROM pairs WHERE n_common >= 3
      |  ORDER BY n_common DESC, p1, p2 LIMIT 100
      |)
      |SELECT p1, p2, n_common FROM top ORDER BY p1, p2""".stripMargin

  // ---- k-truss cohesion -----------------------------------------------

  /** `graph_ktruss` — the 12-truss of the undirected trade graph:
    * edges whose TRIANGLE SUPPORT (common-neighbor count) stays ≥ 10
    * through 4 synchronous peeling rounds — the edge-cohesion upgrade
    * of `graph_kcore` (a k-core can be triangle-free; a k-truss is
    * built from triangles, the community-core definition of Cohen
    * 2008). Support recomputes per round over the SURVIVING edge set,
    * so removals cascade exactly like the vertex peeling in k-core's
    * fixed-round doctrine.
    *
    * Scale: per round one triangle join (edge ⋈ both endpoints'
    * adjacency — the `graph_triangles` shape) and one filter;
    * localCheckpoint per round. Fixed 4 rounds is the gateable
    * restatement of run-to-fixpoint, same contract as k-core/SSSP.
    */
  def graphKtruss(spark: SparkSession, sfDir: String): DataFrame = {
    val KtrussSupport = 10
    val base = tradeEdges(spark, sfDir).where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .truncateLineage(true)
    var und = base
    var supp: DataFrame = null
    for (_ <- 1 to 4) {
      val adj = und.select(col("a").as("x"), col("b").as("n"))
        .unionByName(und.select(col("b").as("x"), col("a").as("n")))
      supp = und
        .join(adj.select(col("x").as("a"), col("n")), "a")
        .join(adj.select(col("x").as("b"), col("n")), Seq("b", "n"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
        .truncateLineage(true)
      und = supp.where(col("support") >= KtrussSupport)
        .select("a", "b").truncateLineage(true)
    }
    supp.where(col("support") >= KtrussSupport)
      .select("a", "b", "support")
      .orderBy("a", "b")
  }

  val graphKtrussSql: String = {
    val rounds = (1 to 4).map { r =>
      // MATERIALIZED: u_{r-1} is referenced THREE times per level (the
      // supp FROM + twice through adj) and adj_r twice — inlined,
      // DuckDB re-derives ~5^4 copies of the chain down to the 4-way
      // EdgeCtes join (measured: checker at 57.7 GB RSS at sf0.01,
      // one version bump from the OOM that bit betweenness). The
      // EdgeCtes doctrine: any round CTE referenced more than once
      // per level must be MATERIALIZED.
      s"""adj$r AS MATERIALIZED (
         |  SELECT a AS x, b AS n FROM u${r - 1}
         |  UNION ALL SELECT b, a FROM u${r - 1}
         |), supp$r AS MATERIALIZED (
         |  SELECT u.a, u.b, COUNT(*) AS support
         |  FROM u${r - 1} u
         |  JOIN adj$r p ON p.x = u.a
         |  JOIN adj$r q ON q.x = u.b AND q.n = p.n
         |  GROUP BY u.a, u.b
         |), u$r AS MATERIALIZED (
         |  SELECT a, b FROM supp$r WHERE support >= 10
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, u0 AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src <> dst
       |), $rounds
       |SELECT a, b, support FROM supp4 WHERE support >= 10
       |ORDER BY a, b""".stripMargin
  }

  // ---- deterministic random walks -------------------------------------

  /** `graph_random_walk` — length-4 walks from every nation on the
    * directed trade graph, the sampling primitive under node2vec/
    * DeepWalk-style graph embeddings. "Random" is a DETERMINISTIC
    * hash: at step t from node u, the successor is the out-neighbor v
    * minimizing (u·1315423911 + v·2654435761 + t·97) mod 1000003 (min
    * v on ties) — reproducible across engines and retries, the same
    * never-random()-at-query-time rule as `analytics_abtest`. Walks
    * stop early at out-degree-0 dead ends.
    *
    * Scale: one walker per start node, each step ONE join of the
    * walker vector against the edge list + one per-walker struct-min —
    * walks of length L are L edge joins regardless of graph size, the
    * standard distributed walk shape (embedding pipelines batch
    * thousands of walkers through the identical plan).
    */
  def graphRandomWalk(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir).where(col("src") =!= col("dst"))
    var st = nodes.select(col("node").as("start"), col("node").as("cur"))
    var out = st.withColumn("step", lit(0L))
    for (t <- 1 to 4) {
      st = st.join(edges, st("cur") === edges("src"))
        .withColumn("mix",
          (col("cur") * 1315423911L + col("dst") * 2654435761L +
            lit(t.toLong) * 97L) % 1000003L)
        .groupBy("start")
        .agg(min(struct(col("mix"), col("dst"))).as("m"))
        .select(col("start"), col("m.dst").as("cur"))
        // per-round truncation (the pagerank doctrine — this walk was
        // the one iterative query missing it): without it each union
        // branch nests the whole previous chain, so the t-th step's
        // join+agg plans t times — 10 join+agg subtrees for 4 steps.
        // Measured NEUTRAL at sf0.1 (r20 probe 1.72 → 1.68 s: edges is
        // the memo-cached tradeEdges frame, so the nested recompute was
        // cheap here); kept for the doctrine's real target — an
        // uncached/expensive edge source, where each step would re-run
        // the whole chain
        .truncateLineage(true)
      out = out.unionByName(st.withColumn("step", lit(t.toLong)))
    }
    out.select(col("start"), col("step"), col("cur").as("node"))
      .orderBy("start", "step")
  }

  val graphRandomWalkSql: String = {
    val steps = (1 to 4).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT s.start,
         |         (MIN(struct_pack(
         |            mix := (s.cur * 1315423911 + e.dst * 2654435761 + $t * 97)
         |                     % 1000003,
         |            dst := e.dst))).dst AS cur
         |  FROM s${t - 1} s JOIN edges e ON e.src = s.cur AND e.src <> e.dst
         |  GROUP BY s.start
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), s0 AS MATERIALIZED (
       |  SELECT node AS start, node AS cur FROM nodes
       |), $steps
       |SELECT start, step, cur AS node FROM (
       |  SELECT start, CAST(0 AS BIGINT) AS step, cur FROM s0
       |  UNION ALL SELECT start, 1, cur FROM s1
       |  UNION ALL SELECT start, 2, cur FROM s2
       |  UNION ALL SELECT start, 3, cur FROM s3
       |  UNION ALL SELECT start, 4, cur FROM s4
       |) ORDER BY start, step""".stripMargin
  }

  // ---- minimum spanning tree ------------------------------------------

  /** `graph_mst` — minimum spanning tree of the weighted trade graph
    * (cost = 10⁹ DIV trade count, the SSSP scaling) via distributed
    * BORŮVKA ([[graft.ops.Mst.boruvka]]): O(log n) rounds of
    * per-component cheapest-edge picks + CC merges, the parallel-MST
    * algorithm (Prim/Kruskal are sequential by construction). Weights
    * are uniquified by endpoint-packing, so the MST is UNIQUE and the
    * gate deterministic; the oracle computes the same unique tree with
    * a one-row-per-step recursive Prim — a spelling that only works
    * because the oracle graph is small, which is the point of shipping
    * the log-round distributed operator.
    */
  def graphMst(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdgesWeighted(spark, sfDir)
      .select(col("src"), col("dst"),
        expr("CAST(1000000000 DIV cnt AS BIGINT)").as("cost"))
    graft.ops.Mst.boruvka(nodes, edges)
      .orderBy("a", "b")
  }

  val graphMstSql: String =
    s"""WITH RECURSIVE $EdgeCtes, wed AS (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |         CAST(MIN(1000000000 // cnt) AS BIGINT) AS cost
       |  FROM counted
       |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted) AND src <> dst
       |  GROUP BY 1, 2
       |), uw AS (
       |  SELECT a, b, cost, cost * 1048576 + a * 1024 + b AS w FROM wed
       |), nn AS (SELECT COUNT(DISTINCT n_nationkey) AS n FROM nation),
       |prim(tn, te, n) AS (
       |  SELECT [CAST(0 AS BIGINT)],
       |         CAST([] AS STRUCT(a BIGINT, b BIGINT, cost BIGINT, w BIGINT)[]),
       |         1
       |  UNION ALL
       |  SELECT list_append(tn, CASE WHEN list_contains(tn, best.a)
       |                              THEN best.b ELSE best.a END),
       |         list_append(te, best), n + 1
       |  FROM prim, (
       |    SELECT min_by(struct_pack(a := u.a, b := u.b,
       |                              cost := u.cost, w := u.w), u.w) AS best
       |    FROM uw u, prim p
       |    WHERE list_contains(p.tn, u.a) <> list_contains(p.tn, u.b)
       |  ) x(best)
       |  WHERE n < (SELECT n FROM nn) AND best IS NOT NULL
       |)
       |SELECT e.a, e.b, e.cost
       |FROM (SELECT unnest(te) AS e FROM prim
       |      WHERE n = (SELECT MAX(n) FROM prim))
       |ORDER BY e.a, e.b""".stripMargin

  // ---- two-hop reach ---------------------------------------------------

  /** `graph_two_hop` — friends-of-friends accounting on the directed
    * trade graph: per nation, the distinct 1-hop out-neighborhood size
    * and the count of nodes at EXACTLY distance 2 (reachable via two
    * edges, not self, not already a direct neighbor) — the audience-
    * expansion / influence-frontier primitive.
    *
    * Spelling: one edge self-join on the middle node, then a distinct
    * + anti-join against the 1-hop set and a per-source count; nodes
    * with no edges report zeros via the left join. At scale the
    * self-join shuffles on the middle-node key and the result stays
    * bounded by the 2-hop closure — the standard FoF shape (the
    * neighbor-overlap operator shares the same first join).
    */
  def graphTwoHop(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val e = tradeEdges(spark, sfDir)
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val oneHop = e.groupBy("src").agg(countDistinct("dst").as("n_1hop"))
    val twoHop = e.select(col("src"), col("dst").as("mid"))
      .join(e.select(col("src").as("mid"), col("dst").as("far")), "mid")
      .where(col("far") =!= col("src"))
      .select("src", "far").distinct()
      .join(e.select(col("src"), col("dst").as("far")), Seq("src", "far"),
        "left_anti")
      .groupBy("src").agg(count(lit(1)).as("n_2hop"))
    nodes
      .join(oneHop.withColumnRenamed("src", "node"), Seq("node"), "left")
      .join(twoHop.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node").as("nationkey"),
        coalesce(col("n_1hop"), lit(0L)).as("n_1hop"),
        coalesce(col("n_2hop"), lit(0L)).as("n_2hop"))
      .orderBy("nationkey")
  }

  val graphTwoHopSql: String =
    s"""WITH $EdgeCtes, e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM edges WHERE src <> dst
       |), one AS (
       |  SELECT src, COUNT(DISTINCT dst) AS n_1hop FROM e GROUP BY src
       |), two AS (
       |  SELECT a.src, COUNT(*) AS n_2hop FROM (
       |    SELECT DISTINCT x.src, y.dst AS far
       |    FROM e x JOIN e y ON x.dst = y.src
       |    WHERE y.dst <> x.src
       |      AND NOT EXISTS (SELECT 1 FROM e d
       |                      WHERE d.src = x.src AND d.dst = y.dst)
       |  ) a GROUP BY a.src
       |)
       |SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey,
       |       COALESCE(o.n_1hop, 0) AS n_1hop,
       |       COALESCE(t.n_2hop, 0) AS n_2hop
       |FROM nation n
       |LEFT JOIN one o ON o.src = CAST(n.n_nationkey AS BIGINT)
       |LEFT JOIN two t ON t.src = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY nationkey""".stripMargin

  // ---- personalized pagerank ------------------------------------------

  /** `graph_ppr` — PERSONALIZED PageRank from a seed set ({0, 7}):
    * random-walk-with-restart where teleportation returns to the seeds
    * instead of spreading uniformly, the standard relevance/
    * recommendation primitive (nodes far from the seeds decay toward
    * zero — locality the uniform `graph_pagerank` cannot express).
    * Same integer fixed-point doctrine as the uniform operator: ranks
    * in 1e6 scale, 5 rounds, rank' = tele(v) + 0.85·Σ inbound
    * contributions with DIV-floor arithmetic; tele(v) distributes the
    * SAME total teleport mass as the uniform variant (0.15·1e6 per
    * node, i.e. 150000·n) but concentrated on the seeds:
    * tele(seed) = 150000·n DIV |S|, 0 elsewhere. The seed start vector
    * equals tele, the standard PPR initialization.
    *
    * Scale: identical shape to [[pagerank]] — per round one node-sized
    * broadcast join against the edge list plus one aggregate; n is a
    * 1-row broadcast scalar, nothing collected.
    */
  def graphPpr(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    val seeds = Seq(0L, 7L)
    // driver-local fast path (dampedRankLocal): init = base = the
    // teleport vector — seeds split 15% of n·1e6, everyone else 0;
    // non-endpoint nodes keep exactly their teleport mass
    val grabbedP = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .limit(LocalRankEdgeBound + 1).collect()
    if (grabbedP.length <= LocalRankEdgeBound) {
      val es = grabbedP.map(r => (r.getLong(0), r.getLong(1), 1L))
      val nTotL = nodes.count()
      val teleOf = (n: Long) =>
        if (seeds.contains(n)) 150000L * nTotL / seeds.size else 0L
      val lab = localRankDf(spark,
        dampedRankLocal(es, teleOf, teleOf, Iters))
      return nodes
        .join(broadcast(lab), Seq("node"), "left")
        .select(col("node").as("nationkey"),
          coalesce(col("lrank"),
            when(col("node").isin(seeds: _*),
              lit(150000L * nTotL / seeds.size)).otherwise(lit(0L)))
            .as("rank"))
        .orderBy(desc("rank"), col("nationkey"))
    }
    val nTot = nodes.agg(count(lit(1)).as("n"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").cast("long").as("src"), col("deg"))
      .truncateLineage(true)
    val tele = nodes.crossJoin(broadcast(nTot))
      .select(col("node"),
        when(col("node").isin(seeds: _*),
          expr(s"(150000L * n) DIV ${seeds.size}")).otherwise(lit(0L))
          .as("tele"))
      .truncateLineage(true)
    // node-sized broadcast guard — see nodeSideHint
    val side = nodeSideHint(nodes)
    var rank = tele.select(col("node"), col("tele").as("rank"))
      .truncateLineage(true)
    for (_ <- 1 to Iters) {
      val contrib = rank.join(deg, rank("node") === deg("src"))
        .select(col("src"), expr("rank DIV deg").as("c"))
      val sums = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("node"))
        .join(side(contrib), "src")
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = tele
        .join(side(sums), Seq("node"), "left")
        .select(col("node"),
          expr("tele + (850L * coalesce(s, 0L)) DIV 1000L").as("rank"))
        .truncateLineage(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(rank)
      rank = next
    }
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(deg)
    rank.select(col("node").as("nationkey"), col("rank"))
      .orderBy(desc("rank"), col("nationkey"))
  }

  val graphPprSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""p$i AS (
         |  SELECT t.node,
         |         CAST(t.tele + 850 * COALESCE(c.s, 0) // 1000 AS BIGINT) AS rank
         |  FROM tele t LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
         |    FROM edges e
         |    JOIN p${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = t.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCtes, deg AS MATERIALIZED (
       |  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
       |), nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), tele AS MATERIALIZED (
       |  SELECT node,
       |         CASE WHEN node IN (0, 7)
       |              THEN CAST(150000 * (SELECT COUNT(*) FROM nodes) // 2 AS BIGINT)
       |              ELSE CAST(0 AS BIGINT) END AS tele
       |  FROM nodes
       |), p0 AS (
       |  SELECT node, tele AS rank FROM tele
       |), $rounds
       |SELECT node AS nationkey, rank FROM p$Iters
       |ORDER BY rank DESC, nationkey""".stripMargin
  }

  // ---- closeness centrality -------------------------------------------

  /** `graph_closeness` — out-closeness centrality of every nation on the
    * directed trade graph: reach count, total hop distance, and the
    * Wasserman–Faust-normalized closeness
    * (r−1)/Σd · (r−1)/(n−1) — the standard form that stays comparable
    * on disconnected graphs (r = nodes reached incl. self).
    *
    * Spelling: MULTI-SOURCE BFS — one frontier per root, all roots in
    * the same DataFrame: state is the REACHED (root, node, dist)
    * triples only (never the n² matrix of unreached pairs); each round
    * propagates the whole state across the edge list in ONE join + one
    * (root, node) min-aggregate, and convergence is read off a
    * (count, Σdist) fingerprint — min-propagation is monotone (pairs
    * only appear, distances only shrink), so the fingerprint is a
    * fixpoint iff the state is. localCheckpoint per round as
    * everywhere. Exact all-pairs closeness is O(n·m) work by
    * definition; at corpus scale the SAME loop runs with a sampled
    * landmark set as `roots` (Eppstein–Wang estimation) — the state
    * shape and round structure don't change, only |roots|.
    */
  /** All-pairs min-hop closure (root, node, dist) of the trade graph —
    * the shared state behind closeness / harmonic / eccentricity (one
    * spelling, so the three centralities cannot drift on BFS
    * semantics; previously each carried its own copy of the loop).
    *
    * Driver-local fast path under the dampedRankLocal doctrine: when
    * BOTH the edge list and the node list prove bounded (measured
    * limit(bound+1) grabs), plain per-root BFS on the driver builds
    * the LocalRelation directly — the distributed frontier loop paid
    * ~40 tiny fingerprint-checked rounds (~2.5 s each query) for a
    * ≤ |nations|²-row answer. Above either bound: the same
    * min-aggregate frontier-expansion loop as before (the
    * graph_reachability doctrine — graph_bfs keeps the anchored
    * distributed single-source spelling).
    */
  private def allPairsHops(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val grabbedE = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .limit(LocalRankEdgeBound + 1).collect()
    val grabbedN =
      if (grabbedE.length <= LocalRankEdgeBound)
        nodes.select(col("node").cast("long"))
          .limit(LocalRankEdgeBound + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (grabbedE.length <= LocalRankEdgeBound &&
        grabbedN.nonEmpty && grabbedN.length <= LocalRankEdgeBound) {
      val adj = grabbedE.map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val ns = grabbedN.map(_.getLong(0)).sorted
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      for (root <- ns) {
        val dist = scala.collection.mutable.Map(root -> 0L)
        var frontier = Seq(root)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long])
            .filterNot(dist.contains)).distinct
          next.foreach(w => dist(w) = dist(frontier.head) + 1)
          frontier = next
        }
        for ((nd, d) <- dist.toSeq.sortBy(_._1))
          rows += org.apache.spark.sql.Row(root, nd, d)
      }
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("root",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("dist",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    var reach = nodes
      .select(col("node").as("root"), col("node"), lit(0L).as("dist"))
      .truncateLineage(true)
    var fingerprint = (-1L, -1L)
    var converged = false
    var it = 0
    while (!converged && it < 40) {
      val cand = reach
        .join(edges.withColumnRenamed("src", "node"), "node")
        .select(col("root"), col("dst").as("node"),
          (col("dist") + 1L).as("dist"))
      val next = reach.unionByName(cand)
        .groupBy("root", "node").agg(min("dist").as("dist"))
        // truncation-purpose, NOT knob-subject (Persist.intermediate)
        .truncateLineage(false)
      val fp = next.agg(count(lit(1)).as("c"), sum("dist").as("s")).head
      val nfp = (fp.getLong(0), fp.getLong(1))
      converged = nfp == fingerprint
      fingerprint = nfp
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(reach)
      reach = next
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      "multi-source BFS did not converge in 40 rounds")
    reach
  }

  def graphCloseness(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    val n = nodes.count()
    allPairsHops(nodes, edges).groupBy("root")
      .agg(count(lit(1)).as("n_reached"), sum("dist").as("total_dist"))
      .select(col("root").as("nationkey"), col("n_reached"),
        col("total_dist"),
        when(col("total_dist") > 0,
          (col("n_reached") - 1).cast("double") / col("total_dist") *
            (col("n_reached") - 1).cast("double") / lit((n - 1).toDouble))
          .otherwise(lit(0.0d)).as("closeness"))
      .orderBy("nationkey")
  }

  val graphClosenessSql: String =
    s"""WITH RECURSIVE $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), walk(root, node, dist) AS (
       |  SELECT node AS root, node, CAST(0 AS BIGINT) FROM nodes
       |  UNION
       |  SELECT w.root, e.dst, w.dist + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.dist < 24
       |), best AS (
       |  SELECT root, node, MIN(dist) AS dist FROM walk GROUP BY root, node
       |), agg AS (
       |  SELECT root, COUNT(*) AS n_reached, CAST(SUM(dist) AS BIGINT) AS total_dist
       |  FROM best GROUP BY root
       |)
       |SELECT root AS nationkey, n_reached, total_dist,
       |       CASE WHEN total_dist > 0
       |            THEN CAST(n_reached - 1 AS DOUBLE) / total_dist *
       |                 CAST(n_reached - 1 AS DOUBLE) /
       |                 ((SELECT COUNT(*) FROM nodes) - 1)
       |            ELSE 0.0 END AS closeness
       |FROM agg ORDER BY nationkey""".stripMargin

  // ---- harmonic centrality ---------------------------------------------

  /** `graph_harmonic` — harmonic centrality of every nation on the
    * directed trade graph: Σ_{v≠u} 1/d(u,v), the centrality that stays
    * well-defined on DISCONNECTED graphs (unreached nodes contribute 0
    * instead of poisoning the sum with ∞ — the reason Boldi–Vigna
    * recommend it over closeness). Same multi-source BFS state and
    * round structure as [[graphCloseness]]; only the rollup differs.
    *
    * Determinism: Σ 1/d over doubles is summation-order-dependent, so
    * the sum runs in EXACT INTEGERS — each distance contributes
    * L DIV d with L = 5354228880 = lcm(1..24) (every BFS distance on
    * this graph is ≤ 24, the same bound the closeness oracle's
    * recursion cap relies on, so the division is exact, not just
    * deterministic). The normalized double is one division pair over
    * the exact scaled sum at the very end.
    *
    * Scale: identical contract to closeness — O(n·m) exact by
    * definition, landmark-sampled `roots` at corpus scale, state is
    * reached pairs only, one join + one min-aggregate per round,
    * `localCheckpoint` lineage truncation.
    */
  def graphHarmonic(spark: SparkSession, sfDir: String): DataFrame = {
    val L = 5354228880L // lcm(1..24)
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    val n = nodes.count()
    allPairsHops(nodes, edges).where(col("dist") > 0)
      .groupBy("root")
      .agg(sum(expr(s"${L}L div dist")).cast("long").as("harmonic_sc"),
        count(lit(1)).as("n_reached"))
      .select(col("root").as("nationkey"), col("n_reached"),
        col("harmonic_sc"),
        (col("harmonic_sc").cast("double") / lit(L.toDouble) /
          lit((n - 1).toDouble)).as("harmonic_norm"))
      .orderBy("nationkey")
  }

  val graphHarmonicSql: String =
    s"""WITH RECURSIVE $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), walk(root, node, dist) AS (
       |  SELECT node AS root, node, CAST(0 AS BIGINT) FROM nodes
       |  UNION
       |  SELECT w.root, e.dst, w.dist + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.dist < 24
       |), best AS (
       |  SELECT root, node, MIN(dist) AS dist FROM walk GROUP BY root, node
       |), agg AS (
       |  SELECT root,
       |         CAST(SUM(5354228880 // dist) AS BIGINT) AS harmonic_sc,
       |         COUNT(*) AS n_reached
       |  FROM best WHERE dist > 0 GROUP BY root
       |)
       |SELECT root AS nationkey, n_reached, harmonic_sc,
       |       CAST(harmonic_sc AS DOUBLE) / 5354228880.0 /
       |       ((SELECT COUNT(*) FROM nodes) - 1) AS harmonic_norm
       |FROM agg ORDER BY nationkey""".stripMargin

  // ---- eccentricity / diameter / radius --------------------------------

  /** `graph_eccentricity` — per-node eccentricity on the directed trade
    * graph (the longest shortest path out of each node, over its
    * REACHABLE set — the disconnected-safe reading), plus the graph's
    * diameter and radius and the center/periphery flags they induce:
    * the structural report next to the per-node centralities. Pure
    * integer aggregates over the same multi-source BFS state as
    * [[graphCloseness]]/[[graphHarmonic]] — no fp anywhere.
    *
    * Scale: the BFS contract of its siblings (O(n·m) exact, landmark
    * sampling at corpus scale); diameter/radius are two scalars
    * broadcast back over the O(n) eccentricity frame.
    */
  def graphEccentricity(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    val ecc = allPairsHops(nodes, edges).groupBy("root")
      .agg(max("dist").as("ecc"), count(lit(1)).as("n_reached"))
    val bounds = ecc.agg(max("ecc").as("diameter"), min("ecc").as("radius"))
    ecc.crossJoin(broadcast(bounds))
      .select(col("root").as("nationkey"), col("n_reached"), col("ecc"),
        col("diameter"), col("radius"),
        (col("ecc") === col("radius")).as("is_center"),
        (col("ecc") === col("diameter")).as("is_periphery"))
      .orderBy("nationkey")
  }

  val graphEccentricitySql: String =
    s"""WITH RECURSIVE $EdgeCtes, nodes AS MATERIALIZED (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), walk(root, node, dist) AS (
       |  SELECT node AS root, node, CAST(0 AS BIGINT) FROM nodes
       |  UNION
       |  SELECT w.root, e.dst, w.dist + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.dist < 24
       |), best AS (
       |  SELECT root, node, MIN(dist) AS dist FROM walk GROUP BY root, node
       |), ecc AS MATERIALIZED (
       |  SELECT root, CAST(MAX(dist) AS BIGINT) AS ecc,
       |         COUNT(*) AS n_reached
       |  FROM best GROUP BY root
       |), b AS MATERIALIZED (
       |  SELECT MAX(ecc) AS diameter, MIN(ecc) AS radius FROM ecc
       |)
       |SELECT root AS nationkey, n_reached, ecc, b.diameter, b.radius,
       |       ecc = b.radius AS is_center,
       |       ecc = b.diameter AS is_periphery
       |FROM ecc, b ORDER BY nationkey""".stripMargin

  // ---- strongly connected components ----------------------------------

  /** `graph_scc` — strongly connected components of the DIRECTED trade
    * graph: every nation labeled with the min nation id of its mutual-
    * reachability class. Trade cycles (A sells to B sells to ... sells
    * back to A) are the directed structure none of the undirected
    * operators (`dedup_clusters`' CC, label propagation) can see.
    *
    * Runs [[graft.ops.StronglyConnectedComponents.resolve]] — the
    * FB/coloring peeling algorithm with trivial-SCC trimming, fully
    * distributed, `localCheckpoint` per round (see the op's scaladoc
    * for the doctrine and why double min-propagation is WRONG). The
    * oracle restates the DEFINITION, not the algorithm: a recursive-CTE
    * transitive closure, scc_id(v) = min(w : v→*w ∧ w→*v, plus v) —
    * fine at oracle scale, impossible at 100 TB, which is exactly the
    * point of shipping the iterative operator.
    */
  def graphScc(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    graft.ops.StronglyConnectedComponents.resolve(nodes, edges)
      .select(col("node").as("nationkey"), col("scc_id"))
      .orderBy("nationkey")
  }

  val graphSccSql: String =
    s"""WITH RECURSIVE $EdgeCtes, closure AS (
       |  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
       |  UNION
       |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src
       |  WHERE c.a <> e.dst
       |), mutual AS (
       |  SELECT c1.a AS v, c1.b AS w
       |  FROM closure c1 JOIN closure c2 ON c1.a = c2.b AND c1.b = c2.a
       |), mn AS MATERIALIZED (
       |  SELECT v, MIN(w) AS mw FROM mutual GROUP BY v
       |)
       |SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey,
       |       LEAST(CAST(n.n_nationkey AS BIGINT),
       |             COALESCE(mn.mw, CAST(n.n_nationkey AS BIGINT))) AS scc_id
       |FROM nation n LEFT JOIN mn ON mn.v = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY nationkey""".stripMargin

  // ---- bow-tie decomposition -------------------------------------------

  /** `graph_bowtie` — the Broder et al. (2000) bow-tie decomposition of
    * the directed trade graph: the LARGEST strongly connected component
    * is the CORE (ties to the smaller scc id), `in` nodes can reach the
    * core without belonging to it, `out` nodes are reachable FROM the
    * core, and everything else is `other` (tendrils/disconnected) —
    * the canonical macro-structure question for any directed graph
    * (who feeds the trading core, who only consumes from it). IN and
    * OUT are disjoint by construction: a node in both would mutually
    * reach the core and BE core.
    *
    * Composition: the FB-coloring SCC resolution
    * ([[graft.ops.StronglyConnectedComponents]]) does the distributed
    * heavy lifting; reachability then runs on the SCC CONDENSATION —
    * one distinct-aggregated (scc, scc) edge list, collected and closed
    * on the driver (plain BFS, no per-round Spark jobs). The
    * condensation of this graph is bounded (≤ |nations| components,
    * ≤ |nations|² edges — derived by one hash-agg from lineitem), so
    * the collect is a bounded model artifact like the IVF centroids;
    * the earlier spelling ran two 40-round frontier-BFS loops on the
    * full node set and paid ~40 tiny Spark jobs' fixed overhead for
    * the same answer (5.8 s → the condensation closure is one job per
    * side). For a graph whose condensation is NOT driver-bounded
    * (web-scale crawls), swap the closure back to the frontier-BFS
    * doctrine of `graph_reachability` — the labels join is unchanged.
    * The oracle restates the DEFINITION via one transitive closure
    * used four ways — fine at oracle scale, impossible at 100 TB.
    */
  def graphBowtie(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val edges = tradeEdges(spark, sfDir)
    val scc = graft.ops.StronglyConnectedComponents.resolve(nodes, edges)
      .truncateLineage(true)
    // condensation: distinct (scc(src), scc(dst)) pairs, self-loops
    // dropped — a bounded artifact (≤ |sccs|² rows)
    val lab = scc.withColumnRenamed("node", "src")
      .withColumnRenamed("scc_id", "s1")
    val lab2 = scc.withColumnRenamed("node", "dst")
      .withColumnRenamed("scc_id", "s2")
    // guard the driver-bounded assumption instead of just documenting
    // it (round-11 advice): grab bound+1 rows in ONE job — a short read
    // proves the condensation is complete and collectable; overflow
    // fails loudly with the doctrine pointer rather than silently
    // ballooning the driver
    val condBound = 1000000
    val condRows = edges.join(lab, "src").join(lab2, "dst")
      .where(col("s1") =!= col("s2"))
      .select("s1", "s2").distinct()
      .limit(condBound + 1).collect()
    if (condRows.length > condBound) throw new IllegalStateException(
      s"graph_bowtie: SCC condensation exceeds $condBound edges — not " +
        "driver-bounded; close reachability with the frontier-BFS " +
        "spelling of graph_reachability instead")
    val condensation = condRows.map(r => (r.getLong(0), r.getLong(1)))
    // core scc: most members, ties to the smaller id — one tiny agg
    val coreId = scc.groupBy("scc_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("scc_id")).limit(1)
      .collect().head.getLong(0)
    def closure(adj: Map[Long, Seq[Long]]): Set[Long] = {
      var seen = Set(coreId)
      var frontier = Seq(coreId)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
          .filterNot(seen)
        seen ++= next
        frontier = next
      }
      seen
    }
    val fwdScc = closure(condensation.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap)
    val bwdScc = closure(condensation.groupBy(_._2)
      .view.mapValues(_.map(_._1).toSeq).toMap)
    scc
      .select(col("node").as("nationkey"), col("scc_id"),
        when(col("scc_id") === coreId, "core")
          .when(col("scc_id").isin(bwdScc.toSeq: _*), "in")
          .when(col("scc_id").isin(fwdScc.toSeq: _*), "out")
          .otherwise("other").as("component"))
      .orderBy("nationkey")
  }

  val graphBowtieSql: String =
    s"""WITH RECURSIVE $EdgeCtes, closure AS (
       |  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
       |  UNION
       |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src
       |  WHERE c.a <> e.dst
       |), mutual AS (
       |  SELECT c1.a AS v, c1.b AS w
       |  FROM closure c1 JOIN closure c2 ON c1.a = c2.b AND c1.b = c2.a
       |), lab AS MATERIALIZED (
       |  SELECT CAST(n.n_nationkey AS BIGINT) AS node,
       |         LEAST(CAST(n.n_nationkey AS BIGINT),
       |               COALESCE(mn.mw, CAST(n.n_nationkey AS BIGINT))) AS scc_id
       |  FROM nation n LEFT JOIN (
       |    SELECT v, MIN(w) AS mw FROM mutual GROUP BY v
       |  ) mn ON mn.v = CAST(n.n_nationkey AS BIGINT)
       |), core AS MATERIALIZED (
       |  SELECT scc_id AS core_id FROM lab
       |  GROUP BY scc_id ORDER BY COUNT(*) DESC, scc_id LIMIT 1
       |), coreset AS MATERIALIZED (
       |  SELECT l.node FROM lab l, core WHERE l.scc_id = core.core_id
       |)
       |SELECT l.node AS nationkey, l.scc_id,
       |       CASE WHEN l.scc_id = core.core_id THEN 'core'
       |            WHEN EXISTS (SELECT 1 FROM closure c JOIN coreset k
       |                         ON c.b = k.node WHERE c.a = l.node)
       |              THEN 'in'
       |            WHEN EXISTS (SELECT 1 FROM closure c JOIN coreset k
       |                         ON c.a = k.node WHERE c.b = l.node)
       |              THEN 'out'
       |            ELSE 'other' END AS component
       |FROM lab l, core
       |ORDER BY nationkey""".stripMargin
}
