package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.streaming.EventAnalytics

/** Oracle-gated queries for the streaming-shaped analytics (batch form of
  * the same transforms Structured Streaming runs — see EventAnalytics)
  * and the multimodal binary plumbing.
  */
object StreamQueries {
  import RefQueries.table

  def streamWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
    EventAnalytics.hourlyByType(table(spark, sfDir, "events"))
      .orderBy("window_start", "event_type")

  val streamWindowAggSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  def streamSessionize(spark: SparkSession, sfDir: String): DataFrame =
    EventAnalytics.sessionize(table(spark, sfDir, "events"), gapMinutes = 240)
      .orderBy("user_id", "session_seq")

  val streamSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > CAST(240 AS BIGINT) * 60 * 1000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |), s AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                                   ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM g
      |)
      |SELECT user_id, session_seq,
      |       strftime(to_timestamp(MIN(us) / 1000000.0), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(to_timestamp(MAX(us) / 1000000.0), '%Y-%m-%d %H:%M:%S') AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Binary metadata through pure SQL expressions (oracle-checked). */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.packFromText(table(spark, sfDir, "documents"))
      .select(
        col("doc_id"), col("media_type"),
        length(col("content")).as("n_bytes"),
        sha2(col("content"), 256).as("digest"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id, 'text/utf-8' AS media_type,
      |       octet_length(encode(text)) AS n_bytes,
      |       sha256(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Full mapPartitions feature-extraction path (stubbed decode) —
    * engine-side typed pipeline, rows-only driver check.
    */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractFeatures(spark,
        Multimodal.packFromText(table(spark, sfDir, "documents")))
      .toDF()
      .orderBy("doc_id")
}
