package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-diff classification: added/removed/changed, unchanged rows
  * dropped, and the two null traps — NULL compare values must not read
  * as absence (presence markers, not key-null checks), and NULL→value /
  * value→NULL must classify as changed (null-safe equality).
  */
class TableDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("added/removed/changed/unchanged classification") {
    import spark.implicits._
    val before = Seq((1L, Some(10)), (2L, Some(20)), (3L, Some(30)))
      .toDF("k", "v")
    val after = Seq((1L, Some(10)), (2L, Some(25)), (4L, Some(40)))
      .toDF("k", "v")
    val got = TableDiff.diff(before, after, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String, Option[Int], Option[Int])]
      .collect().toSeq
    assert(got == Seq(
      (2L, "changed", Some(20), Some(25)),
      (3L, "removed", Some(30), None),
      (4L, "added", None, Some(40))))
  }

  test("NULL compare values: present-with-null is not absence; null transitions are changed") {
    import spark.implicits._
    val before = Seq((1L, None: Option[Int]), (2L, Some(2)), (3L, None: Option[Int]))
      .toDF("k", "v")
    val after = Seq((1L, None: Option[Int]), (2L, None: Option[Int]), (3L, Some(3)))
      .toDF("k", "v")
    val got = TableDiff.diff(before, after, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String, Option[Int], Option[Int])]
      .collect().toSeq
    // Key 1: NULL <=> NULL is unchanged, NOT added/removed despite all
    // compare columns being NULL on both sides.
    assert(got == Seq(
      (2L, "changed", Some(2), None),
      (3L, "changed", None, Some(3))))
  }

  test("multi-column keys and compares") {
    import spark.implicits._
    val before = Seq(("a", 1L, 1.0, "x"), ("a", 2L, 2.0, "y"))
      .toDF("g", "k", "m", "s")
    val after = Seq(("a", 1L, 1.0, "x2"), ("a", 2L, 2.0, "y"))
      .toDF("g", "k", "m", "s")
    val got = TableDiff.diff(before, after, Seq("g", "k"), Seq("m", "s"))
      .as[(String, Long, String, Option[Double], Option[Double], Option[String], Option[String])]
      .collect().toSeq
    // Only (a,1) changed (s: x→x2); m equal on both rows.
    assert(got == Seq(("a", 1L, "changed", Some(1.0), Some(1.0), Some("x"), Some("x2"))))
  }
}
