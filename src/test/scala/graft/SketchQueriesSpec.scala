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

  test("KMV intersection: sample invariants and estimate within sketch error") {
    val r = graft.queries.SketchQueries
      .olapKmvIntersect(spark, TestSpark.Sf001).collect().head
    val (k, matched, estU, estI, exact) = (r.getAs[Long]("k_eff"),
      r.getAs[Long]("matched"), r.getAs[Long]("est_union"),
      r.getAs[Long]("est_intersect"), r.getAs[Long]("n_exact_intersect"))
    assert(k > 0 && matched >= 0 && matched <= k)
    assert(estI >= 0 && estI <= estU, "intersection can't exceed union")
    assert(estI == matched * estU / k, "integral KMV identity")
    // exact union for the relative-error check
    val li = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
      .where("l_shipdate >= '1995-01-01' AND l_shipdate < '1995-03-01'")
      .selectExpr("l_partkey AS pk").distinct().count()
    // KMV with k=256 has ~1/sqrt(k) ≈ 6% stderr — allow 4 sigma
    assert(math.abs(estU - li).toDouble / li < 0.25, s"estU=$estU exact=$li")
    assert(math.abs(estI - exact).toDouble / math.max(exact, 1) < 0.5,
      s"estI=$estI exact=$exact")
  }

  test("quality ensemble: vote arithmetic and band pass rates") {
    val rows = graft.queries.TextQueries
      .corpusQualityEnsemble(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (1 to 5).map(i => r.getAs[Long](s"pass$i"))
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getAs[Long]("n_pass") == flags.sum)
      assert(r.getAs[Long]("keep") == (if (flags.sum >= 4) 1L else 0L))
    }
    // a [p10, p90] band passes ~80% of docs per signal
    val n = rows.length
    (1 to 5).foreach { i =>
      val rate = rows.map(_.getAs[Long](s"pass$i")).sum.toDouble / n
      assert(rate > 0.6 && rate <= 0.97, s"signal $i pass rate $rate")
    }
  }
}
