package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the cleaned outputs (SURVEY.md §1.2; reference
  * DDL at load_data.py:151-200). Raw ingest stays schema-on-read strings
  * (the reference's scraped table is all-object), but everything the
  * engine EMITS is declared: nullable long for the suppression-prone
  * integer columns, double for rates/wages, timestamp for the parsed
  * month.
  */
object Schemas {

  val OewsCleaned: StructType = StructType(
    Seq(
      StructField("soc_code", StringType),
      StructField("occupation", StringType),
      StructField("employment", LongType),
      StructField("employment_percent_relative_std_error", DoubleType),
      StructField("hourly_mean_wage", DoubleType),
      StructField("annual_mean_wage", LongType),
      StructField("wage_percent_relative_std_error", DoubleType),
      StructField("hourly_10th_percentile_wage", DoubleType),
      StructField("hourly_25th_percentile_wage", DoubleType),
      StructField("hourly_median_wage", DoubleType),
      StructField("hourly_75th_percentile_wage", DoubleType),
      StructField("hourly_90th_percentile_wage", DoubleType),
      StructField("annual_10th_percentile_wage", LongType),
      StructField("annual_25th_percentile_wage", LongType),
      StructField("annual_median_wage", LongType),
      StructField("annual_75th_percentile_wage", LongType),
      StructField("annual_90th_percentile_wage", LongType),
      StructField("employment_per_1000_jobs", DoubleType),
      StructField("location_quotient", DoubleType)))

  val OnetSkillsCleaned: StructType = StructType(
    Seq(
      StructField("onet_soc_code", StringType),
      StructField("title", StringType),
      StructField("element_id", StringType),
      StructField("element_name", StringType),
      StructField("scale_id", StringType),
      StructField("scale_name", StringType),
      StructField("data_value", DoubleType),
      StructField("n", LongType),
      StructField("standard_error", DoubleType),
      StructField("lower_ci_bound", DoubleType),
      StructField("upper_ci_bound", DoubleType),
      StructField("recommend_suppress", StringType),
      StructField("not_relevant", StringType),
      StructField("date", TimestampType),
      StructField("domain_source", StringType)))

  private def ddlFor(name: String, schema: StructType): String =
    s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING parquet"

  /** K2 — DDL-first create-if-not-exists (load_data.py:151-200 issues
    * CREATE TABLE IF NOT EXISTS before every append). Idempotent;
    * subsequent appends (K3) rely on the declared schema rather than
    * inferring one from the first batch.
    */
  def ensureTables(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sql(ddlFor("oews_by_state", OewsCleaned))
    spark.sql(ddlFor("onet_skills", OnetSkillsCleaned))
  }
}
