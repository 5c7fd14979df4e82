package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only parity-surface decomposition (not part of the library). */
object ScratchParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[parity] $label%-40s ${ts(1)}%.2f s (min ${ts.head}%.2f)")
    }
    noop(queries.RefQueries.table(spark, sf, "part").select("p_partkey")) // warm

    val ev = queries.RefQueries.table(spark, sf, "events")
    def jsonBase = ev.select(col("event_id"), col("event_type"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k").as("prop_k"))
    time("json gateSort (repartition 1)") {
      noop(jsonBase.repartition(1).sortWithinPartitions(col("event_id")))
    }
    time("json coalesce(1) sort") {
      noop(jsonBase.coalesce(1).sortWithinPartitions(col("event_id")))
    }
    time("etl_date_parse current") { noop(SparkEntry.queries("etl_date_parse")(spark, sf)) }
    time("etl_json_extract current") { noop(SparkEntry.queries("etl_json_extract")(spark, sf)) }
    time("etl_full_clean current") { noop(SparkEntry.queries("etl_full_clean")(spark, sf)) }
    time("etl_drop_last_n current") { noop(SparkEntry.queries("etl_drop_last_n")(spark, sf)) }
    time("q2_cte current") { noop(SparkEntry.queries("q2_cte")(spark, sf)) }
    time("q6_view current") { noop(SparkEntry.queries("q6_view")(spark, sf)) }
    time("q1_split_part current") { noop(SparkEntry.queries("q1_split_part")(spark, sf)) }
    time("q4_round current") { noop(SparkEntry.queries("q4_round")(spark, sf)) }
    time("etl_cell_scrub current") { noop(SparkEntry.queries("etl_cell_scrub")(spark, sf)) }
  }
}
