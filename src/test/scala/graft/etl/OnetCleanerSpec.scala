package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class OnetCleanerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("golden: clean(onet_skills_raw/2025-09-17) == onet_skills_cleaned/2025-09-17") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet")
    // golden `date` is TIMESTAMP(NANOS): read as nano-long (nanosAsLong),
    // convert to microsecond TimestampType for comparison
    val want = spark.read.parquet(s"${TestSpark.RefData}/onet_skills_cleaned/2025-09-17/onet_skills_cleaned.parquet")
      .withColumn("date", timestamp_micros((col("date") / 1000L).cast("long")))
    val got = OnetCleaner.clean(raw)

    assert(got.columns.toSeq == want.columns.toSeq, "column names/order")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)), "schema types")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      Schemas.OnetSkillsCleaned.map(f => (f.name, f.dataType)),
      "declared schema drifted from the cleaner's output")
    assert(got.count() == 62580L)
    // exact multiset equality without collecting 62k wide rows twice
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "value multiset differs from golden")
  }

  test("golden: clean(onet_skills_raw/2025-09-16) == onet_skills_cleaned/2025-09-16") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.RefData}/onet_skills_raw/2025-09-16/onet_skills_raw.parquet")
    val want = spark.read.parquet(s"${TestSpark.RefData}/onet_skills_cleaned/2025-09-16/onet_skills_cleaned.parquet")
      .withColumn("date", timestamp_micros((col("date") / 1000L).cast("long")))
    val got = OnetCleaner.clean(raw)
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "value multiset differs from 09-16 golden")
  }

  test("P4 column-name normalization matches observed headers") {
    assert(OnetCleaner.normalizeName("O*NET-SOC Code") == "onet_soc_code")
    assert(OnetCleaner.normalizeName("Element ID") == "element_id")
    assert(OnetCleaner.normalizeName("Recommend Suppress") == "recommend_suppress")
    assert(OnetCleaner.normalizeName("Date") == "date")
  }

  test("R4 date parse: MM/yyyy → first-of-month, garbage → NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("08/2023", "06/2010", "garbage", null).toDF("date")
    val got = OnetCleaner.clean(out).select(date_format(col("date"), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("2023-08-01", "2010-06-01", null, null))
  }
}
