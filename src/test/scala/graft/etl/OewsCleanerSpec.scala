package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Golden test: the reference ships exact raw→cleaned parquet pairs
  * (SURVEY.md §5); cleaning its raw OEWS table must reproduce its cleaned
  * table bit-for-bit (schema, order, values, NULLs).
  */
class OewsCleanerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("golden: clean(oews_raw/2025-09-17) == oews_cleaned/2025-09-17") {
    val raw = spark.read.parquet(s"${TestSpark.RefData}/oews_raw/2025-09-17/oews_raw.parquet")
    val want = spark.read.parquet(s"${TestSpark.RefData}/oews_cleaned/2025-09-17/oews_cleaned.parquet")
    val got = OewsCleaner.clean(raw)

    assert(got.columns.toSeq == want.columns.toSeq, "column names/order")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)), "schema types")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      Schemas.OewsCleaned.map(f => (f.name, f.dataType)),
      "declared schema drifted from the cleaner's output")

    val sortCols = got.columns.toIndexedSeq.map(col)
    val g = got.orderBy(sortCols: _*).collect().toSeq
    val w = want.orderBy(sortCols: _*).collect().toSeq
    assert(g.size == 736 && g.size == w.size)
    g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs:\n got: $a\nwant: $b")
    }
  }

  test("golden: clean(oews_raw/2025-09-16) == oews_cleaned/2025-09-16") {
    val raw = spark.read.parquet(s"${TestSpark.RefData}/oews_raw/2025-09-16/oews_raw.parquet")
    val want = spark.read.parquet(s"${TestSpark.RefData}/oews_cleaned/2025-09-16/oews_cleaned.parquet")
    val got = OewsCleaner.clean(raw)
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "value multiset differs from 09-16 golden")
  }

  test("P1 column-name normalization matches observed headers") {
    assert(OewsCleaner.normalizeName("Occupation (SOC code)") == "occupation_soc_code")
    assert(OewsCleaner.normalizeName("Employment(1)") == "employment")
    assert(OewsCleaner.normalizeName("Employment percent relative standard error(3)") ==
      "employment_percent_relative_std_error")
    assert(OewsCleaner.normalizeName("Employment per 1,000 jobs()") == "employment_per_1000_jobs")
    assert(OewsCleaner.normalizeName("Hourly mean wage()") == "hourly_mean_wage")
    assert(OewsCleaner.normalizeName("Location Quotient()") == "location_quotient")
  }

  test("R1 scrub edge sentinels (observed value shapes)") {
    import spark.implicits._
    val in = Seq("()2,091,480", "()$26.61", "()1,000.000", "(5)-", "(8)-", "(11)-",
      "plain", "All Occupations", "Physicians, Pathologists", null)
      .toDF("v")
    val out = in.select(OewsCleaner.scrub(col("v")).as("v")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("2091480", "26.61", "1000.000", null, null, null,
      "plain", "All Occupations", "Physicians Pathologists", null))
  }
}
