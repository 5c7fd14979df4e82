package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table, written so the SAME
  * transform runs in batch (driver oracle gate) and under Structured
  * Streaming (readStream → watermark → window agg; see StreamingSpec).
  *
  * The testdata parquet stores `ts` as TIMESTAMP(NANOS), which Spark
  * surfaces as a nano-long under `nanosAsLong`; `withEventTime` converts
  * to a microsecond TimestampType (floor), matching DuckDB's `epoch_us`
  * truncation so cross-engine comparisons stay exact.
  *
  * Scale: tumbling-window aggregation is partial+final HashAggregate on
  * (window, type) — map-side combined, no skew risk beyond event_type
  * cardinality. Sessionization shuffles once on user_id; per-user event
  * counts are bounded, so the per-partition sort inside the window
  * operator is small. In streaming, the same aggregation is incremental
  * with watermark-bounded state.
  */
object EventAnalytics {

  /** Explicit read schema (ts as nano-long — see above). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** nano-long → TimestampType (µs floor). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts_utc",
      timestamp_micros(floor(col("ts") / 1000L).cast("long")))

  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Tumbling 1-hour window aggregation per event type. Runs unchanged on
    * a streaming DataFrame (add a watermark upstream for append mode).
    */
  def hourlyByType(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts_utc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionization (batch form): a new session starts when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * Gaps compared in integer microseconds on both engines — exact.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_utc", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    withEventTime(events)
      .withColumn("us", unix_micros(col("ts_utc")))
      .withColumn("new_session",
        when(lag("us", 1).over(byUser).isNull ||
          col("us") - lag("us", 1).over(byUser) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        date_format(min(col("ts_utc")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts_utc")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("sum_value"))
  }

  /** Streaming form of `hourlyByType`: event-time watermark + windowed
    * aggregation. Caller picks the sink/output mode (see StreamingSpec).
    */
  def hourlyByTypeStream(events: DataFrame, watermark: String): DataFrame =
    withEventTime(events)
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventsSchema).parquet(dir)
}
