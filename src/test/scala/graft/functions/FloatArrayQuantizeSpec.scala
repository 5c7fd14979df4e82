package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The native quantize kernel must be BIT-IDENTICAL to the built-in
  * `transform(v, x -> round(x*1e4).cast(long))` spelling it replaced
  * (Similarity.quantizeRef) — every similarity/dedup oracle hash gate
  * rides on this rounding, so the spec pins real embeddings, exact
  * half-integer ties, random floats, and the null cases.
  */
class FloatArrayQuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matches the interpreted spelling on the real embeddings table") {
    val emb = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
    val both = emb.select(
      graft.ops.Similarity.quantize(col("embedding")).as("native"),
      graft.ops.Similarity.quantizeRef(col("embedding")).as("ref"))
    assert(both.where(not(col("native") <=> col("ref"))).isEmpty)
  }

  test("matches on exact .5 ties, near-ties, negatives, and random floats") {
    import spark.implicits._
    // 0.03125f·1e4 = 312.5 exactly: the documented real tie. Also the
    // negative tie (half AWAY from zero → -313), subnormal-ish smalls,
    // and 3000 random floats across magnitudes.
    val adversarial = Seq(
      Seq(0.03125f, -0.03125f, 0.00005f, -0.00005f, 0f, -0f),
      Seq(1.00005f, -1.00005f, 0.99995f, 2.5e-5f, 7.5e-5f))
    val random = samples(
      Gen.chooseNum(0, 32).flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(-8f, 8f))), 3000).map(_.toSeq)
    val both = (adversarial ++ random).toDF("v").select(
      graft.ops.Similarity.quantize(col("v")).as("native"),
      graft.ops.Similarity.quantizeRef(col("v")).as("ref"))
    assert(both.where(not(col("native") <=> col("ref"))).isEmpty)
  }

  test("null array -> null; null elements preserved; empty array") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(0.5f), None, Some(-1.25f)))),
      (2L, None),
      (3L, Some(Seq.empty[Option[Float]]))
    ).toDF("id", "v")
    val got = df.select(col("id"),
        graft.ops.Similarity.quantize(col("v")).as("q"))
      .orderBy("id")
      .as[(Long, Option[Seq[Option[Long]]])].collect().toSeq
    assert(got == Seq(
      (1L, Some(Seq(Some(5000L), None, Some(-12500L)))),
      (2L, None),
      (3L, Some(Seq.empty[Option[Long]]))))
  }

  test("stays inside whole-stage codegen") {
    val emb = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
    val plan = emb.select(graft.ops.Similarity.quantize(col("embedding")).as("qv"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("float_array_quantize") && l.trim.startsWith("*(")), plan)
  }

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
}
