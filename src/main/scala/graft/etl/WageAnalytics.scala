package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's SQL analytic layer (reference: airflow_pipeline/views.sql
  * and notebooks/analysis.ipynb), re-expressed as Spark SQL views plus the
  * notebook's flagship aggregation.
  *
  * Expects two tables/views to exist in the session catalog:
  * `onet_skills` (cleaned O*NET skills) and `oews_by_state` (cleaned OEWS).
  *
  * Scale notes: the join (views.sql:18-27) keys a ~62k-row (at reference
  * scale; arbitrarily large at 100 TB) skills fact against a per-state OEWS
  * dimension that stays small (~1k rows/state) — Catalyst auto-broadcasts
  * the dimension, so the join is shuffle-free on the fact side. The
  * aggregate view (views.sql:3-14) is a partial+final HashAggregate on
  * `split_onet_soc_code` — map-side combine collapses each partition to
  * ≤#distinct-codes rows before the exchange.
  */
object WageAnalytics {

  /** Q6 — `CREATE OR REPLACE VIEW vw_oews_avg_over_onet` (views.sql:3-14):
    * Q2 CTE + Q1 split_part + Q3 group-avg + Q4 round.
    */
  val AvgOverOnetBody: String =
    """WITH cte1 AS (
      |  SELECT *, split_part(onet_soc_code, '.', 1) AS split_onet_soc_code
      |  FROM onet_skills
      |)
      |SELECT split_onet_soc_code,
      |       ROUND(AVG(data_value), 2)     AS mean_data_value,
      |       ROUND(AVG(standard_error), 2) AS mean_sd,
      |       ROUND(AVG(lower_ci_bound), 2) AS mean_lower_ci_bound,
      |       ROUND(AVG(upper_ci_bound), 2) AS mean_upper_ci_bound
      |FROM cte1
      |GROUP BY split_onet_soc_code""".stripMargin

  /** Q6 — `CREATE OR REPLACE VIEW vw_onet_closest_oews` (views.sql:16-27):
    * Q2 CTE + Q1 split_part + Q5 inner equi-join, SELECT * both sides.
    */
  val ClosestOewsBody: String =
    """WITH cte1 AS (
      |  SELECT *, split_part(onet_soc_code, '.', 1) AS split_onet_soc_code
      |  FROM onet_skills
      |)
      |SELECT *
      |FROM cte1 t1
      |JOIN oews_by_state t2
      |  ON t1.split_onet_soc_code = t2.soc_code""".stripMargin

  /** Register both views (assumes `onet_skills` / `oews_by_state` exist).
    *
    * `persistent = true` matches the reference, whose views live in the
    * Postgres catalog (views.sql:3,18) and outlive any one connection:
    * `CREATE OR REPLACE VIEW` lands in the shared session catalog and
    * survives `spark.newSession()` (PipelineSpec asserts it). Persistent
    * views can only reference catalog TABLES, so the JDBC-target
    * pipeline — whose `onet_skills`/`oews_by_state` are JDBC-backed TEMP
    * views — must keep the views temporary (a persistent view over a
    * temp view is an analysis error by design).
    */
  def createViews(spark: SparkSession, persistent: Boolean = false): Unit = {
    val kind = if (persistent) "VIEW" else "TEMPORARY VIEW"
    spark.sql(s"CREATE OR REPLACE $kind vw_oews_avg_over_onet AS\n$AvgOverOnetBody")
    spark.sql(s"CREATE OR REPLACE $kind vw_onet_closest_oews AS\n$ClosestOewsBody")
  }

  /** Q7+Q8 — the notebook's flagship query (analysis.ipynb cell 4):
    * mean annual wage per title over the join view, top-k descending.
    * Physical plan: HashAggregate(partial) → Exchange → HashAggregate
    * (final) → TakeOrderedAndProject (true top-k; no full sort even at
    * 100 TB). `title` added as secondary sort key: the reference's tie
    * order is pandas-sort-unstable, so we pin a deterministic one.
    */
  def topTitlesByWage(spark: SparkSession, k: Int = 10): DataFrame =
    spark.table("vw_onet_closest_oews")
      .groupBy("title")
      .agg(avg("annual_mean_wage").as("annual_mean_wage"))
      .orderBy(desc("annual_mean_wage"), asc("title"))
      .limit(k)
}
