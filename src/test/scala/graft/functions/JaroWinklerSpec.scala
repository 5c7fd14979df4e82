package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native Jaro–Winkler kernel bit-for-bit to DuckDB's
  * jaro_winkler_similarity: the expected doubles below are DuckDB's
  * own outputs (harvested verbatim), covering the transposition path,
  * the Winkler prefix boost, the 0.7 boost gate, the zero-match
  * window collapse ("ab"/"ba"), and the empty-string convention
  * (0.0 even for both-empty — NOT the textbook 1.0).
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Pinned: Seq[(String, String, Double)] = Seq(
    ("blue anvil", "blue ring", 0.8669841269841271),
    ("cold widget", "cold gizmo", 0.8387012987012987),
    ("new rod", "new gear", 0.8678571428571429),
    ("small gizmo", "small widget", 0.8537878787878789),
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("abcdef", "abcdef", 1.0),
    ("a", "b", 0.0),
    ("a", "a", 1.0),
    ("", "x", 0.0),
    ("x", "", 0.0),
    ("", "", 0.0),
    ("ab", "ba", 0.0),
    ("aaaa", "aaab", 0.8833333333333334),
    ("prefix match long", "prefix match least", 0.9202614379084967))

  test("static kernel matches DuckDB bit-for-bit on pinned pairs") {
    Pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(got == want, s"jw('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("expression path (codegen) agrees with the static kernel") {
    import spark.implicits._
    val df = Pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler.jw(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == JaroWinkler.similarity(r.getString(0), r.getString(1)))
    }
    // null propagation: either side null -> null
    val n = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler.jw(col("a"), col("b")))
      .head
    assert(n.isNullAt(0))
  }

  test("symmetry and range on real part names") {
    import spark.implicits._
    val names = spark.read.parquet(s"${TestSpark.Sf0001}/part.parquet")
      .select("p_name").distinct().as[String].collect()
    val pairs = for (a <- names.take(30); b <- names.take(30)) yield (a, b)
    pairs.foreach { case (a, b) =>
      val ab = JaroWinkler.similarity(a, b)
      assert(ab == JaroWinkler.similarity(b, a))
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }
}
