package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned range join must be pair-for-pair identical to the naive
  * inequality join for ANY bin width, including boundary points (p == lo
  * is in, p == hi is out) and intervals whose hi sits exactly on a bin
  * boundary (the phantom-bin case). The plan must be an equi-join —
  * binning exists to keep nested-loop joins out of the plan.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def points = {
    import spark.implicits._
    // includes exact boundary values 10.0, 20.0, 40.0 and negatives
    // (floor(p/w) must stay consistent across zero: -0.1 -> bin -1)
    Seq(-25.0, -0.1, 0.0, 5.0, 9.99, 10.0, 15.0, 20.0, 33.3, 40.0, 55.5, 99.9)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      (100L, 0.0, 10.0),  // hi on a bin boundary for w=10 (phantom bin)
      (101L, 10.0, 20.0),
      (102L, 5.0, 45.0),  // wide: spans many bins
      (103L, 39.0, 40.5),
      (104L, 60.0, 70.0), // matches nothing
      (105L, 20.0, 20.0), // empty interval
      (106L, -30.0, 1.0)  // negative interval spanning zero
    ).toDF("iid", "lo", "hi")
  }

  private def bruteForce: Set[(Long, Long)] =
    points.join(intervals, col("lo") <= col("p") && col("p") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned == brute force across bin widths, boundaries exact") {
    val expected = bruteForce
    for (w <- Seq(1.0, 3.0, 10.0, 25.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binWidth $w")
    }
    // sanity on the fixture itself: boundary semantics lo-inclusive
    // hi-exclusive (pid 5 is the point 10.0), and negatives match the
    // zero-spanning interval (pid 1 is -0.1)
    assert(expected.contains((5L, 101L)) && !expected.contains((5L, 100L)),
      "p == lo is in, p == hi is out")
    assert(expected.contains((1L, 106L)), "negative point joins its interval")
  }

  test("plan is an equi-join, not a nested loop") {
    val plan = RangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected a hash equi-join:\n$plan")
  }
}
