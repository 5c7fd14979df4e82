package graft.etl

import java.nio.file.Files
import java.time.LocalDate
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sink semantics (SURVEY.md §2.2): K1 date-partitioned parquet stages are
  * overwrite-idempotent within a run date; K3 table loads append with no
  * key and no dedup (rerun duplicates rows — observable reference
  * behavior, load_data.py:202-213).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("end-to-end: stage writes, append load, views over catalog tables") {
    val base = Files.createTempDirectory("graft-pipe").toString
    val cfg = PipelineConfig(base, LocalDate.parse("2025-09-17"))

    // seed raw stages from the reference's shipped raw parquets
    Pipeline.writeStage(
      spark.read.parquet(s"${TestSpark.RefData}/oews_raw/2025-09-17/oews_raw.parquet"),
      cfg, "oews_raw")
    Pipeline.writeStage(
      spark.read.parquet(s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet"),
      cfg, "onet_skills_raw")

    spark.sql("DROP TABLE IF EXISTS oews_by_state")
    spark.sql("DROP TABLE IF EXISTS onet_skills")
    Pipeline.run(spark, cfg)

    // stage boundary materialized at the dated path (K1/O2)
    assert(Files.exists(java.nio.file.Paths.get(s"$base/oews_cleaned/2025-09-17")))
    assert(spark.table("oews_by_state").count() == 736L)
    assert(spark.table("onet_skills").count() == 62580L)
    assert(spark.table("vw_onet_closest_oews").count() == 53760L)

    // K1: re-running a transform for the same date is idempotent
    Pipeline.transformOews(spark, cfg)
    assert(Pipeline.readStage(spark, cfg, "oews_cleaned").count() == 736L)

    // K3: re-running a load APPENDS (no dedup — reference semantics)
    Pipeline.loadOews(spark, cfg)
    assert(spark.table("oews_by_state").count() == 1472L)

    // the analytic views are PERSISTENT catalog views (reference parity:
    // views.sql's live in Postgres, not a connection) — a NEW session
    // sharing the catalog still resolves them, where a TEMP view would
    // be gone; they read the post-append state through to the tables
    val fresh = spark.newSession()
    assert(fresh.catalog.tableExists("vw_onet_closest_oews"))
    assert(fresh.table("vw_onet_closest_oews").count() == 2 * 53760L)
    assert(fresh.table("vw_oews_avg_over_onet").count() ==
      spark.table("vw_oews_avg_over_onet").count())
  }
}
