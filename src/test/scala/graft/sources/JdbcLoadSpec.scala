package graft.sources

import java.nio.file.Files
import java.time.LocalDate
import graft.TestSpark
import graft.etl.{LoadTarget, Pipeline, PipelineConfig, Schemas}
import org.scalatest.funsuite.AnyFunSuite

/** JDBC sink/source semantics (SURVEY.md §2 S5/K2/K3) against embedded
  * Derby — the sandbox stand-in for the reference's Postgres
  * (load_data.py:17,147-213): DDL-first idempotent create, append with
  * no dedup, full read-back.
  */
class JdbcLoadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("K2: ensureTable is create-if-not-exists (idempotent)") {
    val url = freshUrl()
    assert(!JdbcLoad.tableExists(url, "oews_by_state"))
    JdbcLoad.ensureTable(url, "oews_by_state", Schemas.OewsCleaned)
    assert(JdbcLoad.tableExists(url, "oews_by_state"))
    JdbcLoad.ensureTable(url, "oews_by_state", Schemas.OewsCleaned) // no-op
    assert(JdbcLoad.tableExists(url, "oews_by_state"))
  }

  test("K3 + S5: append duplicates on rerun; read-back round-trips values") {
    val url = freshUrl()
    JdbcLoad.ensureTable(url, "onet_skills", Schemas.OnetSkillsCleaned)
    // real cleaned data, nulls included
    val cleaned = graft.etl.OnetCleaner.clean(
      spark.read.parquet(
        s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet"))
      .limit(200).cache()
    JdbcLoad.append(cleaned, url, "onet_skills")
    assert(JdbcLoad.read(spark, url, "onet_skills").count() == 200L)
    // K3: rerun appends, no dedup (reference to_sql(if_exists='append'))
    JdbcLoad.append(cleaned, url, "onet_skills")
    assert(JdbcLoad.read(spark, url, "onet_skills").count() == 400L)
    // values round-trip exactly (row-wise, nulls preserved): DB content
    // must equal the input appended twice
    val cols = cleaned.columns.toSeq
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString(""))
    assert(sortedRows(JdbcLoad.read(spark, url, "onet_skills"))
      .sameElements(sortedRows(cleaned.union(cleaned))))
  }

  test("pipeline run end-to-end with a JDBC load target") {
    val url = freshUrl()
    val base = Files.createTempDirectory("graft-pipe-jdbc").toString
    val cfg = PipelineConfig(base, LocalDate.parse("2025-09-17"))
    Pipeline.writeStage(
      spark.read.parquet(s"${TestSpark.RefData}/oews_raw/2025-09-17/oews_raw.parquet"),
      cfg, "oews_raw")
    Pipeline.writeStage(
      spark.read.parquet(s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet"),
      cfg, "onet_skills_raw")
    Pipeline.run(spark, cfg, LoadTarget.Jdbc(url))
    assert(JdbcLoad.read(spark, url, "oews_by_state").count() == 736L)
    assert(JdbcLoad.read(spark, url, "onet_skills").count() == 62580L)
    // the analytic views work over the JDBC-backed tables too (the
    // reference defines views.sql in the same database it loads)
    assert(spark.table("vw_onet_closest_oews").count() == 53760L)
  }
}
