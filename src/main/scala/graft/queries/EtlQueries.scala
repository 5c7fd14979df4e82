package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.OewsCleaner

/** The reference's row-level ETL transforms (SURVEY.md §2.4: R1 cell
  * scrub, R2 try-cast coercion, R4 date parse, R5 drop-last-N) exposed as
  * oracle-checkable queries over testdata. Noisy inputs are synthesized
  * from integer columns only — double→string formatting differs across
  * engines, int→string does not.
  *
  * The Spark side runs the PRODUCTION expressions (OewsCleaner.scrub etc.);
  * the oracle SQL restates the same semantics in DuckDB's dialect, so the
  * gate checks the real cleaning code, not a test-only copy.
  */
object EtlQueries {
  import RefQueries.table

  /** R1+R2 — cell scrub + numeric coercion. Five observed value shapes
    * (FIXTURES.md A1) keyed off p_partkey % 5: suppression sentinel,
    * footnote+$+commas, digit footnote, plain number, garbage.
    */
  def etlCellScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val noisy = table(spark, sfDir, "part").select(
      col("p_partkey"),
      expr("""CASE p_partkey % 5
             |  WHEN 0 THEN '(' || CAST(p_partkey % 9 + 1 AS STRING) || ')-'
             |  WHEN 1 THEN '()$' || format_number(p_partkey * 1000L, 0)
             |  WHEN 2 THEN '(' || CAST(p_partkey % 9 AS STRING) || ')' || CAST(p_size AS STRING)
             |  WHEN 3 THEN CAST(p_size * 100 AS STRING)
             |  ELSE 'N/A'
             |END""".stripMargin).as("noisy"))
    noisy
      .withColumn("clean_val", OewsCleaner.scrub(col("noisy")))
      .withColumn("val_num", expr("try_cast(clean_val AS DOUBLE)"))
      .orderBy("p_partkey")
  }

  val etlCellScrubSql: String =
    """WITH noisy_t AS (
      |  SELECT p_partkey,
      |         CASE p_partkey % 5
      |           WHEN 0 THEN '(' || CAST(p_partkey % 9 + 1 AS VARCHAR) || ')-'
      |           WHEN 1 THEN '()$' || format('{:,}', CAST(p_partkey AS BIGINT) * 1000)
      |           WHEN 2 THEN '(' || CAST(p_partkey % 9 AS VARCHAR) || ')' || CAST(p_size AS VARCHAR)
      |           WHEN 3 THEN CAST(p_size * 100 AS VARCHAR)
      |           ELSE 'N/A'
      |         END AS noisy
      |  FROM part
      |), scrubbed AS (
      |  SELECT p_partkey, noisy,
      |         CASE WHEN noisy IS NULL OR regexp_matches(noisy, '^\(\d+\)-$') THEN NULL
      |              ELSE replace(replace(
      |                     CASE WHEN contains(noisy, ')')
      |                          THEN trim(regexp_replace(noisy, '^[^)]*\)', ''))
      |                          ELSE noisy END, '$', ''), ',', '')
      |         END AS clean_val
      |  FROM noisy_t
      |)
      |SELECT p_partkey, noisy, clean_val, TRY_CAST(clean_val AS DOUBLE) AS val_num
      |FROM scrubbed ORDER BY p_partkey""".stripMargin

  /** R4 — `MM/yyyy` date parse with coerce-to-NULL on garbage
    * (load_data.py:231 ≙ try_to_timestamp). Date strings synthesized from
    * o_orderdate; every 13th key is garbage.
    */
  def etlDateParse(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        expr("""CASE WHEN o_orderkey % 13 = 0 THEN 'not-a-date'
               |     ELSE lpad(CAST(month(o_orderdate) AS STRING), 2, '0')
               |          || '/' || CAST(year(o_orderdate) AS STRING)
               |END""".stripMargin).as("date_str"))
      .withColumn("parsed_date",
        try_to_timestamp(col("date_str"), lit("MM/yyyy")).cast("date"))
      .orderBy("o_orderkey")

  val etlDateParseSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 13 = 0 THEN 'not-a-date'
      |              ELSE lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
      |                   || '/' || CAST(year(o_orderdate) AS VARCHAR)
      |         END AS date_str
      |  FROM orders
      |)
      |SELECT o_orderkey, date_str,
      |       CAST(try_strptime(date_str, '%m/%Y') AS DATE) AS parsed_date
      |FROM s ORDER BY o_orderkey""".stripMargin

  /** R5 — ordered drop-last-N (load_data.py:79 drops 2 scraped footer
    * rows). Scale-safe spelling: an unpartitioned window (`row_number`
    * over global ORDER BY) funnels every row through ONE task — fatal at
    * 100×. Instead fetch the N largest keys with a top-k on JUST the key
    * column (TakeOrderedAndProject, no full sort), reduce to the N-th
    * largest, and broadcast that 1-row cutoff as a filter. Requires a
    * unique ordering key (event_id is); with ties the windowed form is
    * nondeterministic anyway.
    */
  def etlDropLastN(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"))
    val cutoff = ev.select("event_id")
      .orderBy(col("event_id").desc).limit(2)
      .agg(min("event_id").as("cutoff"))
    ev.join(broadcast(cutoff), col("event_id") < col("cutoff"))
      .select("event_id", "event_type")
      .orderBy("event_id")
  }

  /** Semi-structured extraction: parse the events `props` JSON column
    * with Spark's JSON machinery (`from_json` with an explicit schema —
    * codegen'd Jackson parse, the shape metadata extraction takes in a
    * training-data pipeline). Oracle uses DuckDB's JSON functions.
    * Semantics seam on MALFORMED json: Spark from_json coerces to NULL,
    * DuckDB json_extract_string throws — equivalent only on valid-JSON
    * corpora like this one (all 10k props parse).
    */
  def etlJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("prop_k"))
      .orderBy("event_id")

  val etlJsonExtractSql: String =
    """SELECT event_id, event_type,
      |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events ORDER BY event_id""".stripMargin

  val etlDropLastNSql: String =
    """SELECT event_id, event_type FROM (
      |  SELECT event_id, event_type,
      |         row_number() OVER (ORDER BY event_id) AS rn,
      |         count(*) OVER () AS cnt
      |  FROM events
      |) WHERE rn <= cnt - 2 ORDER BY event_id""".stripMargin
}
