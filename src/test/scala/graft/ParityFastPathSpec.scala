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
