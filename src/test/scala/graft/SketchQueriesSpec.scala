package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SketchQueries

/** Pins the mathematical contracts of the sketch operators — the gate
  * proves cross-engine determinism, these prove the sketches estimate
  * what they claim.
  */
class SketchQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimate lands within 15% of the exact distinct count") {
    val rows = SketchQueries.olapHllDistinct(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_distinct").toDouble
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact < 0.15,
        s"flag ${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("count-min never underestimates and misses no true heavy hitter") {
    import spark.implicits._
    val reported = SketchQueries.olapCmsTopk(spark, TestSpark.Sf001).collect()
    reported.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("n_exact"),
        s"custkey ${r.get(0)} underestimated")
    }
    // est >= exact means every key with exact count over the threshold
    // MUST be reported — the sketch can add, never drop
    val trueHeavy = spark.read
      .parquet(s"${TestSpark.Sf001}/orders.parquet")
      .groupBy("o_custkey").count().where($"count" >= 18)
      .select($"o_custkey".cast("long")).as[Long].collect().toSet
    val reportedKeys = reported.map(_.getAs[Long]("custkey")).toSet
    assert(trueHeavy.subsetOf(reportedKeys),
      s"missed heavy hitters: ${trueHeavy diff reportedKeys}")
  }

  test("histogram quantile brackets the exact percentile within one bucket") {
    val rows = SketchQueries.olapQuantileSketch(spark, TestSpark.Sf001).collect()
    assert(rows.map(_.getAs[Long]("pctl")).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { r =>
      val est = r.getAs[Long]("est_val").toDouble
      val exact = r.getAs[Double]("exact_val")
      assert(est >= exact, s"p${r.get(0)}: upper edge below exact")
      // the rank-selected bucket's upper edge is within one bucket of the
      // NEAREST order statistic; the continuous (interpolated) percentile
      // can dip just below that bucket's lower edge, so the guaranteed
      // bound is two bucket widths, not one
      assert(est - exact <= 1000.0, s"p${r.get(0)}: outside the sketch error bound")
    }
  }

  test("bloom pruning has zero false negatives and visible false positives") {
    val rows = SketchQueries.joinBloomPrune(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    // independent truth: exact semi-join row count per flag
    val li = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
    val dim = spark.read.parquet(s"${TestSpark.Sf001}/supplier.parquet")
      .where(col("s_acctbal") > 5000).select(col("s_suppkey"))
    val truth = li.join(dim, li("l_suppkey") === dim("s_suppkey"), "left_semi")
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val total = r.getAs[Long]("n_total")
      val pass = r.getAs[Long]("n_bloom_pass")
      val nTrue = r.getAs[Long]("n_true")
      assert(nTrue == truth(flag), s"$flag: true-match count wrong")
      assert(pass >= nTrue, s"$flag: a true match failed the bloom filter")
      assert(pass <= total)
    }
  }
}
