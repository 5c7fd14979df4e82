package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Derived query goldens (SURVEY.md §5 / FIXTURES.md A5), recomputed from
  * the reference's shipped cleaned parquets through the Spark views.
  */
class WageAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def setup(): Unit = {
    spark.read.parquet(s"${TestSpark.RefData}/onet_skills_cleaned/2025-09-17/onet_skills_cleaned.parquet")
      .createOrReplaceTempView("onet_skills")
    spark.read.parquet(s"${TestSpark.RefData}/oews_cleaned/2025-09-17/oews_cleaned.parquet")
      .createOrReplaceTempView("oews_by_state")
    WageAnalytics.createViews(spark)
  }

  test("Q5 join view cardinality == 53,760") {
    setup()
    assert(spark.table("vw_onet_closest_oews").count() == 53760L)
  }

  test("Q3 agg view has 774 groups") {
    setup()
    assert(spark.table("vw_oews_avg_over_onet").count() == 774L)
  }

  test("Q7+Q8 notebook top-10 titles by mean annual wage") {
    setup()
    val got = WageAnalytics.topTitlesByWage(spark, 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val want = Set(
      "Dermatologists" -> 408680.0,
      "Oral and Maxillofacial Surgeons" -> 393490.0,
      "Anesthesiologists" -> 323940.0,
      "Allergists and Immunologists" -> 260290.0,
      "Hospitalists" -> 260290.0,
      "Physical Medicine and Rehabilitation Physicians" -> 260290.0,
      "Preventive Medicine Physicians" -> 260290.0,
      "Sports Medicine Physicians" -> 260290.0,
      "Urologists" -> 260290.0,
      "Physicians, Pathologists" -> 249030.0,
    )
    assert(got == want)
  }
}
