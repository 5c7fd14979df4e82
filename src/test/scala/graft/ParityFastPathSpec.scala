package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ExactAgg
import graft.queries.RefQueries

/** Round-12 parity fast-path pins.
  *
  * 1. The cents-long aggregates must be BIT-identical to the
  *    decimal-sum spellings they shortcut (the 2^53-cents bound holds
  *    comfortably on every gate corpus).
  * 2. q5's pre-join range sort must reproduce, row for row, the order
  *    an explicit post-join ORDER BY produces — the property that makes
  *    the written files a total ORDER BY for the oracle. This is the
  *    guard against any plan change (e.g. losing the broadcast hint to
  *    a sort-merge join) that would silently re-sort the probe side.
  */
class ParityFastPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf001

  test("exactSumCents / exactAvgCents == decimal spellings, bit for bit") {
    val li = RefQueries.table(spark, sf, "lineitem")
    val r = li.groupBy("l_returnflag")
      .agg(
        ExactAgg.exactSum(col("l_extendedprice")).as("s_dec"),
        ExactAgg.exactSumCents(col("l_extendedprice")).as("s_cents"),
        ExactAgg.exactAvg(col("l_quantity")).as("a_dec"),
        ExactAgg.exactAvgCents(col("l_quantity")).as("a_cents"))
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(2)),
        s"sum mismatch on ${row.getString(0)}")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(4)),
        s"avg mismatch on ${row.getString(0)}")
    }
  }

  test("cents == decimal up to the bound; loud failure (not drift) beyond") {
    import spark.implicits._
    // property sweep: random magnitudes spanning cents totals from a
    // few dollars up to JUST under 2^53 cents — bit-equality must hold
    // at every scale where the fast path is allowed to answer
    val rnd = new scala.util.Random(13)
    // top scale: 200 × ~0.5e11 dollars ≈ 1e15 cents, just inside 2^53
    for (scalePow <- Seq(2, 6, 9, 11)) {
      val base = math.pow(10.0, scalePow.toDouble)
      val vals = (1 to 200).map(_ => rnd.nextDouble() * base)
      val df = vals.toDF("v")
      val row = df.agg(
        ExactAgg.exactSum(col("v")).as("dec"),
        ExactAgg.exactSumCents(col("v")).as("cents")).collect().head
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"drift at 1e$scalePow: ${row.getDouble(0)} vs ${row.getDouble(1)}")
    }
    // the WIDE path (quotient/remainder split) must be bit-identical
    // to the decimal spelling at every magnitude, signed values
    // included — no 2^53 ceiling
    for (scalePow <- Seq(2, 6, 11, 13, 15)) {
      val base = math.pow(10.0, scalePow.toDouble)
      val vals = (1 to 200).map(i =>
        (if (i % 3 == 0) -1 else 1) * rnd.nextDouble() * base)
      val df = vals.toDF("v")
      val row = df.agg(
        ExactAgg.exactSum(col("v")).as("dec"),
        ExactAgg.exactSumCentsWide(col("v")).as("wide"),
        ExactAgg.exactAvg(col("v")).as("adec"),
        ExactAgg.exactAvgCentsWide(col("v")).as("awide")).collect().head
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"wide sum drift at 1e$scalePow: ${row.getDouble(0)} vs ${row.getDouble(1)}")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(3)),
        s"wide avg drift at 1e$scalePow")
    }
    // beyond the bound the SINGLE-LONG fast path must FAIL, not
    // silently round: 3 × $4e13 = 1.2e16 cents > 2^53 ≈ 9.0e15 (each
    // row is fine — the GROUP total breaches). exactSum stays exact
    // there, and so must the wide path.
    val whale = Seq(4.0e13, 4.0e13, 4.0e13).toDF("v")
    val wideWhale = whale.agg(
      ExactAgg.exactSum(col("v")).as("dec"),
      ExactAgg.exactSumCentsWide(col("v")).as("wide")).collect().head
    assert(java.lang.Double.doubleToLongBits(wideWhale.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(wideWhale.getDouble(1)),
      "wide path must stay exact past 2^53")
    val ex = intercept[Exception] {
      whale.agg(ExactAgg.exactSumCents(col("v"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("2^53 exactness bound")),
      s"wrong failure: ${ex.getMessage}")
    val dec = whale.agg(ExactAgg.exactSum(col("v"))).collect().head.getDouble(0)
    assert(dec == 1.2e14, s"decimal path must stay exact: $dec")
  }

  test("q5 pre-join range sort == explicit post-join ORDER BY, row for row") {
    val got = RefQueries.q5Join(spark, sf).collect()
    val li = RefQueries.table(spark, sf, "lineitem")
    val p = RefQueries.table(spark, sf, "part")
    val want = li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("p_name"), col("p_brand"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .collect()
    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("q5 plan still broadcasts the dim (order preservation precondition)") {
    val plan = RefQueries.q5Join(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
