package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Latest-wins upsert semantics: update replaces, insert adds, base
  * passes through, and duplicate keys WITHIN one update batch resolve
  * to the greatest tie-break (the at-least-once CDC case).
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("update/insert/passthrough/intra-batch duplicate") {
    import spark.implicits._
    val base = Seq(
      (1L, "a", 0L),
      (2L, "b", 0L),
      (3L, "c", 0L)
    ).toDF("k", "v", "seq")
    val updates = Seq(
      (2L, "b2", 1L), // update
      (4L, "d", 1L),  // insert
      (4L, "d2", 2L)  // duplicate key in the SAME batch: higher seq wins
    ).toDF("k", "v", "seq")

    val got = Upsert.latestWins(base, updates, Seq("k"), "seq")
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 0L),
      (2L, "b2", 1L),
      (3L, "c", 0L),
      (4L, "d2", 2L)))
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "a", 9L)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Upsert.latestWins(base, bad, Seq("k"), "v")
    }
  }
}
