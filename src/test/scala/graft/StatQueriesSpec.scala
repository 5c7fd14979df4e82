package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.StatQueries

/** Mathematical contracts of the statistics operators — the oracle gate
  * proves cross-engine determinism; these prove the formulas compute
  * what they claim.
  */
class StatQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("regression agrees with Spark's regr_slope/regr_intercept") {
    val rows = StatQueries.analyticsRegression(spark, TestSpark.Sf001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1, s"${r.get(0)}: r2 $r2 out of range")
    }
    // independent spelling: Spark's built-in OLS aggregates (double
    // accumulation, so compare with tolerance — the gated query exists
    // precisely because the builtin is not bit-deterministic)
    val builtin = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("bs"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("bi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (bs, bi) = builtin(r.getAs[String]("returnflag"))
      assert(math.abs(r.getAs[Double]("slope") - bs) <= 1e-6 * math.max(1, math.abs(bs)))
      assert(math.abs(r.getAs[Double]("intercept") - bi) <= 1e-6 * math.max(1, math.abs(bi)))
    }
  }

  test("correlation is bounded and covariance sign-consistent with it") {
    StatQueries.analyticsCorr(spark, TestSpark.Sf001).collect().foreach { r =>
      val pr = r.getAs[Double]("pearson_r")
      assert(pr >= -1 && pr <= 1, s"${r.get(0)}: r $pr out of range")
      assert(pr.sign == r.getAs[Double]("cov_samp").sign,
        s"${r.get(0)}: correlation and covariance disagree on sign")
    }
  }

  test("MAD outliers are a strict minority and MAD is non-negative") {
    StatQueries.analyticsMad(spark, TestSpark.Sf001).collect().foreach { r =>
      assert(r.getAs[Double]("mad") >= 0)
      assert(r.getAs[Long]("n_outliers") * 4 < r.getAs[Long]("n"),
        s"${r.get(0)}: >25% of rows flagged as outliers")
    }
  }

  test("imputation fills exactly the negative balances, with the segment mean") {
    val out = StatQueries.etlImpute(spark, TestSpark.Sf001)
    val bad = out.where(
      (col("was_imputed") && col("c_acctbal") >= 0) ||
        (!col("was_imputed") && col("acctbal_filled") =!= col("c_acctbal")) ||
        (col("was_imputed") && col("acctbal_filled") < 0)).count()
    assert(bad == 0)
    assert(out.where(col("was_imputed")).count() > 0, "fixture has no negatives")
  }

  test("min-max scaling lands in [0,1] and hits both endpoints per group") {
    val out = StatQueries.etlMinmaxScale(spark, TestSpark.Sf001).cache()
    try {
      assert(out.where(col("scaled") < 0 || col("scaled") > 1).count() == 0)
      val ends = out.groupBy("returnflag")
        .agg(min("scaled").as("lo"), max("scaled").as("hi")).collect()
      ends.foreach { r =>
        assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0)
      }
    } finally { out.unpersist(); () }
  }

  test("k-anonymity audit accounts for every customer") {
    val rows = StatQueries.etlKAnonymity(spark, TestSpark.Sf001).collect()
    val total = rows.map(_.getAs[Long]("group_size")).sum
    val customers = spark.read
      .parquet(s"${TestSpark.Sf001}/customer.parquet").count()
    assert(total == customers)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") == (r.getAs[Long]("group_size") < 5))
    }
  }

  test("A/B test: proportions in [0,1], conversions bounded by group size") {
    val r = StatQueries.analyticsAbtest(spark, TestSpark.Sf001).collect().head
    assert(r.getAs[Long]("conv0") <= r.getAs[Long]("n0"))
    assert(r.getAs[Long]("conv1") <= r.getAs[Long]("n1"))
    Seq("p0", "p1").foreach { c =>
      val p = r.getAs[Double](c)
      assert(p >= 0 && p <= 1, s"$c = $p")
      assert(p > 0 && p < 1, s"$c degenerate — z undefined, pick a better metric")
    }
  }

  test("normalization never grows the token stream") {
    import graft.queries.TextQueries
    TextQueries.textNormalize(spark, TestSpark.Sf001).collect().foreach { r =>
      assert(r.getAs[Long]("n_content") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_stemmed") <= r.getAs[Long]("n_content"))
    }
  }

  test("Gini is in [0,1) and zero only for perfectly equal balances") {
    StatQueries.analyticsGini(spark, TestSpark.Sf001).collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0 && g < 1, s"${r.get(0)}: gini $g out of range")
    }
  }

  test("seasonal-naive forecast scores only days with a week-earlier actual") {
    val rows = StatQueries.analyticsForecast(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      assert(r.getAs[Double]("mae_c") >= math.abs(r.getAs[Double]("bias_c")),
        s"${r.get(0)}: MAE below |bias| is arithmetically impossible")
    }
  }

  test("checksum is invariant under repartitioning (order independence)") {
    val a = StatQueries.etlChecksum(spark, TestSpark.Sf001).collect()
    // same data read again — different partitioning of the aggregation
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b =
      try StatQueries.etlChecksum(spark, TestSpark.Sf001).collect()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList)
  }

  test("STL decomposition reassembles exactly and respects edges") {
    val rows = StatQueries.analyticsStlDecompose(spark, TestSpark.Sf001)
      .collect()
    assert(rows.length > 20)
    // the 3-day edges carry no trend; interior rows reassemble exactly:
    // rev = trend + seasonal + residual (additive identity by construction)
    val (edge, interior) = rows.partition(_.isNullAt(2))
    assert(edge.length >= 6, "both series edges must be trendless")
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val (rev, t, s, res) = (r.getAs[Long]("rev_c"), r.getAs[Long]("trend_c"),
        r.getAs[Long]("seasonal_c"), r.getAs[Long]("resid_c"))
      assert(rev == t + s + res + (rev - t - s - res)) // tautology guard
      assert(res == rev - t - s, "additive identity must be exact")
    }
    // seasonal components repeat with period 7
    val byDay = interior.map(r => r.getAs[Long]("day") -> r.getAs[Long]("seasonal_c")).toMap
    byDay.foreach { case (d, s) =>
      byDay.get(d + 7).foreach(s7 => assert(s == s7, s"day $d seasonal drift"))
    }
  }

  test("churn accounting: retained + churned = active, rates bounded") {
    val rows = StatQueries.analyticsChurn(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, ret, ch, ppm) = (r.getAs[Long]("n_active"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_churned"),
        r.getAs[Long]("churn_ppm"))
      assert(ret + ch == a)
      assert(ppm == ch * 1000000L / a)
      assert(a > 0)
    }
  }

  test("point-in-time join covers every ship event exactly once") {
    val rows = graft.queries.EtlQueries.joinPointInTime(spark, TestSpark.Sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_ship_events") > 0))
    // a ship event is covered iff it lands on/after its customer's FIRST
    // version (the corpus ships some items before the order date, so
    // pre-history events exist and must drop — the PIT contract)
    val covered = spark.sql(
      s"""WITH fo AS (
         |  SELECT o_custkey, MIN(o_orderdate) AS f
         |  FROM parquet.`${TestSpark.Sf001}/orders.parquet` GROUP BY 1)
         |SELECT COUNT(*) FROM parquet.`${TestSpark.Sf001}/lineitem.parquet` l
         |JOIN parquet.`${TestSpark.Sf001}/orders.parquet` o
         |  ON o.o_orderkey = l.l_orderkey
         |JOIN fo ON fo.o_custkey = o.o_custkey
         |WHERE l.l_shipdate >= fo.f""".stripMargin).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_ship_events")).sum == covered)
    // (custkey, version) keys are unique
    val keys = rows.map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("version_key")))
    assert(keys.distinct.length == keys.length)
  }

  test("CDC apply: statuses partition the key space, last-writer wins") {
    val rows = graft.queries.EtlQueries.etlCdcApply(spark, TestSpark.Sf001)
      .collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
    assert(byStatus.keySet.subsetOf(
      Set("unchanged", "deleted", "inserted", "upserted")))
    assert(byStatus.contains("deleted") && byStatus.contains("upserted"))
    rows.foreach { r =>
      val deleted = r.getAs[String]("status") == "deleted"
      assert(r.isNullAt(r.fieldIndex("final_bal_c")) == deleted)
    }
    // one row per key in base ∪ stream
    val base = spark.read.parquet(s"${TestSpark.Sf001}/customer.parquet")
      .selectExpr("CAST(c_custkey AS LONG)").collect().map(_.getLong(0)).toSet
    val evKeys = spark.read.parquet(s"${TestSpark.Sf001}/orders.parquet")
      .selectExpr("CAST(o_custkey AS LONG)").collect().map(_.getLong(0)).toSet
    assert(rows.length == (base ++ evKeys).size)
    // spot-check last-writer-wins on one upserted key against the log
    val sample = rows.find(_.getAs[String]("status") == "upserted").get
    val k = sample.getAs[Long]("custkey")
    val last = spark.read.parquet(s"${TestSpark.Sf001}/orders.parquet")
      .where(s"o_custkey = $k")
      .selectExpr("o_orderkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ts",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS v")
      .collect().maxBy(r => (r.getAs[Long]("ts"), r.getAs[Long]("o_orderkey")))
    assert(sample.getAs[Long]("final_bal_c") == last.getAs[Long]("v"))
  }

  test("winsorized mean sits inside the clamp band and damps outliers") {
    val rows = StatQueries.analyticsWinsorizedMean(spark, TestSpark.Sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo_c"), r.getAs[Long]("hi_c"))
      val (wm, rm) = (r.getAs[Double]("winsorized_mean_c"),
        r.getAs[Double]("raw_mean_c"))
      assert(lo <= hi)
      assert(wm >= lo && wm <= hi, "clamped mean must lie in the band")
      // winsorizing both tails can move the mean either way but only
      // within the tail mass: |wm − rm| ≤ 10% of the band width is a
      // loose sanity envelope for 5% tails of a bounded distribution
      assert(math.abs(wm - rm) <= 0.1 * (hi - lo).toDouble + 1.0,
        s"${r.get(0)}: wm=$wm rm=$rm")
    }
  }

  test("Theil index is near-nonnegative and bounded by log2(n)") {
    val rows = StatQueries.analyticsTheil(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t) = (r.getAs[Long]("n"), r.getAs[Long]("theil_log2_1e6"))
      // mathematically T >= 0; the floored integer log2 can dip a few
      // millionths below zero, never more than the per-row mantissa error
      assert(t >= -6000L, s"${r.get(0)}: T=$t")
      val log2n = 64 - java.lang.Long.numberOfLeadingZeros(n)
      assert(t <= (log2n + 1).toLong * 1000000L, s"${r.get(0)}: T=$t n=$n")
    }
  }

  test("Pareto deciles: balanced sizes, monotone shares, full coverage") {
    val rows = StatQueries.analyticsPareto(spark, TestSpark.Sf001).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1, "ntile must balance within 1")
    val shares = rows.map(_.getAs[Long]("cum_share_ppm")).toSeq
    assert(shares == shares.sorted, "cumulative share must be monotone")
    assert(shares.last == 1000000L, "final decile must close at 100%")
    // spend-ranked deciles: the first decile carries the largest slice
    val cents = rows.map(_.getAs[Long]("decile_cents"))
    assert(cents.head == cents.max)
  }

  test("quarantine routes exactly the violating rows with full reasons") {
    val rows = graft.queries.EtlQueries.etlQuarantine(spark, TestSpark.Sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val reasons = r.getAs[String]("reasons").split(",").toSeq
      assert(reasons.nonEmpty && reasons.forall(_.nonEmpty))
      assert(r.getAs[Long]("n_reasons") == reasons.length.toLong)
      assert(reasons.toSet.subsetOf(
        Set("price_above_cap", "urgent_below_floor", "pending_high_value")))
    }
    // multi-rule rows exist on this corpus (price cap + pending overlap)
    assert(rows.exists(_.getAs[Long]("n_reasons") >= 2))
    // row set equals an independent disjunction count over the table
    val expect = spark.read.parquet(s"${TestSpark.Sf001}/orders.parquet")
      .where("o_totalprice > 450000.0 OR (o_orderpriority = '1-URGENT' AND o_totalprice < 50000.0) OR (o_orderstatus = 'P' AND o_totalprice > 400000.0)")
      .count()
    assert(rows.length.toLong == expect)
  }

  test("KS statistic bounded and attained at a real sample value") {
    val r = StatQueries.analyticsKsTest(spark, TestSpark.Sf001).collect().head
    val (n1, n2, ks) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("ks_1e6"))
    assert(n1 > 0 && n2 > 0)
    assert(ks >= 0L && ks <= 1000000L)
    // the argmax balance must belong to one of the two samples
    val at = r.getAs[Long]("at_cents")
    val vals = spark.read.parquet(s"${TestSpark.Sf001}/customer.parquet")
      .where(org.apache.spark.sql.functions.col("c_mktsegment")
        .isin("BUILDING", "AUTOMOBILE"))
      .selectExpr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0)).toSet
    assert(vals.contains(at))
  }

  test("Mann-Whitney matches a driver-side midrank recomputation") {
    val r = StatQueries.analyticsMannWhitney(spark, TestSpark.Sf001)
      .collect().head
    val bal = spark.read.parquet(s"${TestSpark.Sf001}/customer.parquet")
      .where(org.apache.spark.sql.functions.col("c_mktsegment")
        .isin("BUILDING", "AUTOMOBILE"))
      .selectExpr("c_mktsegment", "CAST(round(c_acctbal * 100, 0) AS BIGINT)")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val all = bal.map(_._2).sorted
    // doubled midrank per value: positions i..j (1-based) -> i+j
    val rank2 = all.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2 + 1).min + xs.map(_._2 + 1).max).toLong
    }
    val n1 = bal.count(_._1 == "BUILDING").toLong
    val n2 = bal.count(_._1 == "AUTOMOBILE").toLong
    val r1x2 = bal.filter(_._1 == "BUILDING").map(x => rank2(x._2)).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("u1_2x") == r1x2 - n1 * (n1 + 1))
    assert(r.getAs[Long]("u1_2x") + r.getAs[Long]("u2_2x") == 2 * n1 * n2)
    val auc = r.getAs[Long]("auc_1e6")
    assert(auc >= 0L && auc <= 1000000L)
  }

  test("autocorrelation matches a driver-side exact Pearson per lag") {
    val rows = StatQueries.analyticsAutocorr(spark, TestSpark.Sf001).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L, 7L))
    val series = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
      .groupBy("l_shipdate")
      .agg(org.apache.spark.sql.functions.expr(
        "sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) DIV 100000L")
        .as("rev"))
      .orderBy("l_shipdate").collect().map(_.getAs[Long]("rev"))
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      val xs = series.dropRight(k); val ys = series.drop(k)
      assert(r.getAs[Long]("n_pairs") == xs.length.toLong)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
      val sxx = xs.map(a => a * a).sum.toDouble
      val syy = ys.map(a => a * a).sum.toDouble
      val expect = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val acf = r.getAs[Double]("acf")
      assert(math.abs(acf) <= 1.0)
      assert(acf == expect, s"lag $k: $acf != $expect")
    }
  }
}
