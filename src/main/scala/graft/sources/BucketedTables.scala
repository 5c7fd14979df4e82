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
  /** File names a Spark managed parquet write leaves behind — the ONLY
    * contents an orphaned managed-table directory can legitimately
    * hold. Anything else means the path is not ours to destroy.
    */
  private val ManagedWriteLeaving = java.util.regex.Pattern.compile(
    "part-.*|_SUCCESS|\\..+\\.crc|_committed_.*|_started_.*|" +
      "_temporary|_metadata|_common_metadata")

  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, source: Option[String] = None): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    // a managed table's warehouse directory can outlive its catalog
    // entry (the in-memory catalog dies with the session, the files do
    // not), and saveAsTable refuses to ADOPT an orphaned location even
    // in Overwrite mode (LOCATION_ALREADY_EXISTS) — so a re-run in a
    // fresh session would fail on the previous session's leavings.
    // When no live table claims the location, clear it first; when the
    // table EXISTS, Overwrite handles replacement. The location is
    // resolved through the session catalog (NOT string-built from
    // spark.sql.warehouse.dir): defaultTablePath honors the identifier's
    // database — qualified or the session's CURRENT one — where a
    // hand-derived <warehouse>/<name> path would target the wrong
    // directory for anything but a default-database name. And only a
    // directory whose contents are recognizably a prior managed parquet
    // write is deleted: a library call must not destroy a path it
    // cannot prove it owns (e.g. an external table that happens to sit
    // at the default location).
    if (!spark.catalog.tableExists(tableName)) {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        val foreign = fs.listStatus(loc).map(_.getPath.getName)
          .filterNot(n => ManagedWriteLeaving.matcher(n).matches())
        if (foreign.nonEmpty)
          throw new IllegalStateException(
            s"refusing to clear $loc for table $tableName: it holds " +
              s"files a managed parquet write never produces " +
              s"(${foreign.take(5).mkString(", ")}) — not provably an " +
              "orphaned managed-table location; remove it manually or " +
              "choose another table name")
        fs.delete(loc, true)
      }
    }
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)
    // provenance stamp for [[ensureBucketed]]'s staleness check — set
    // AFTER the write so a failed write never leaves a fresh-looking
    // stamp on stale data. Values go through the SQL-literal escape
    // (a path with a quote must not break — or truncate — the ALTER
    // after the table write already succeeded), and the LAYOUT stamp
    // records key/buckets/columns so a layout built by older code from
    // the same source still reads as stale when the shape changed.
    source.foreach { s =>
      def q(v: String) = v.replace("'", "''")
      val layout = s"$key/$buckets/${df.columns.mkString(",")}"
      df.sparkSession.sql(
        s"ALTER TABLE $tableName SET TBLPROPERTIES(" +
          s"'$SourceProp'='${q(s)}', '$LayoutProp'='${q(layout)}')")
      ()
    }
  }

  /** Table property recording what a bucketed table was built FROM. */
  val SourceProp: String = "graft.bucketed.source"

  /** Table property recording the layout SHAPE (bucket key, bucket
    * count, column list) the table was built WITH — the second half of
    * [[ensureBucketed]]'s freshness check: same source + different
    * shape is a rebuild, not a reuse. Key and bucket count are always
    * compared; the column list only when the caller passes its
    * expected `columns` (the by-name build must not be constructed
    * just to read a schema off it).
    */
  val LayoutProp: String = "graft.bucketed.layout"

  /** Idempotent layout materialization — the steady-state entry point.
    * Build and write the bucketed table ONLY when it is absent or was
    * built from a different `source` (tracked via [[SourceProp]]);
    * otherwise the existing layout is reused as-is. Returns true iff a
    * write happened. `build` is by-name: a reuse never constructs the
    * input frame at all.
    *
    * This is what makes the layout's economics real: [[writeBucketed]]
    * pays the one-time shuffle, and every subsequent query in the same
    * warehouse rides the layout for free — the amortized plan the
    * 100 TB story is about. Callers that WANT the write each run (gate
    * queries exercising layout fidelity) call [[writeBucketed]]
    * directly.
    */
  def ensureBucketed(spark: SparkSession, tableName: String, key: String,
      buckets: Int, source: String, columns: Seq[String] = Nil)(
      build: => DataFrame): Boolean =
    synchronized {
      val fresh = spark.catalog.tableExists(tableName) && {
        val ident =
          spark.sessionState.sqlParser.parseTableIdentifier(tableName)
        val props = spark.sessionState.catalog.getTableMetadata(ident)
          .properties
        // freshness = same source AND same layout shape. Key + bucket
        // count are always compared (checkable without constructing
        // the by-name build). The stamped COLUMN LIST is compared only
        // when the caller passes `columns` — the by-name contract (a
        // reuse never constructs `build`) means the expected projection
        // must arrive as data, not be inferred from the frame; callers
        // that omit it accept that same-key/same-bucket column drift is
        // caught only on writeBucketed-side rebuilds (r17 advice: the
        // earlier scaladoc overstated what the bare prefix check saw).
        props.get(SourceProp).contains(source) &&
          props.get(LayoutProp).exists { stamped =>
            if (columns.nonEmpty)
              stamped == s"$key/$buckets/${columns.mkString(",")}"
            else stamped.startsWith(s"$key/$buckets/")
          }
      }
      if (fresh) false
      else {
        val df = build
        // loud once, not a silent rebuild loop: a stated column list
        // that can never match what the build stamps would fail the
        // freshness check on EVERY call and re-pay the full layout
        // shuffle each time (r17 review) — at scale the dominant cost
        if (columns.nonEmpty && df.columns.toSeq != columns)
          throw new IllegalArgumentException(
            s"ensureBucketed($tableName): stated columns " +
              s"(${columns.mkString(",")}) != the built frame's " +
              s"(${df.columns.mkString(",")}) — the layout stamp could " +
              "never match and every call would silently rebuild")
        writeBucketed(df, tableName, key, buckets, Some(source))
        true
      }
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
