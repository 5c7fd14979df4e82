package graft.queries

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

  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
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
    val edges = counted.crossJoin(broadcast(total))
      .where(col("cnt") * 550 >= col("tot"))
      // cached, never unpersisted: the returned plan still references
      // this frame (5 iterations deep), so dropping the blocks here
      // would force the 4-way join to re-run once per iteration when
      // the caller finally executes. <= 625 rows — the session keeps it.
      .select("src", "dst")
      .cache()

    val nodes = table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    pagerank(nodes, edges, Iters)
      .select(col("node").as("nationkey"), col("rank"))
      .orderBy(desc("rank"), col("nationkey"))
  }

  /** Core fixed-iteration integer PageRank: `nodes(node)`,
    * `edges(src, dst)` → `(node, rank)` with rank scaled by 1e6.
    */
  /** The rank vector is |nodes| rows by construction, so it (and the
    * per-node contribution/degree frames) broadcast EXPLICITLY — the
    * planner can't see through five iterations of joins to infer that,
    * and falling back to sort-merge would shuffle the edge list every
    * round. At web scale where ranks outgrow a broadcast, the shape
    * changes to ranks and edges co-partitioned on src (one shuffle to
    * establish, zero per iteration) — same algebra, different hint.
    */
  private[graft] def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .join(broadcast(outdeg), "src")
        .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes
        .join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("850 * coalesce(s, CAST(0 AS BIGINT)) DIV 1000")).as("rank"))
    }
    ranks
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
    s"""WITH counted AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst,
       |         COUNT(*) AS cnt
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2
       |), edges AS (
       |  SELECT src, dst FROM counted
       |  WHERE cnt * 550 >= (SELECT SUM(cnt) FROM counted)
       |), deg AS (
       |  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
       |), nodes AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
       |), r0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
       |), $rounds
       |SELECT node AS nationkey, rank FROM r$Iters
       |ORDER BY rank DESC, nationkey""".stripMargin
  }
}
