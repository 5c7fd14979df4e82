package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): the R1 scrub is total (never throws) and
  * its output never contains the characters it removes. Plain ScalaCheck
  * generators sampled with a fixed seed (deterministic; no scalatestplus
  * bridge needed offline).
  */
class ScrubPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val noisy: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.chooseNum(0, 9999999).map(n => f"()$$$n%,d"),
    Gen.chooseNum(1, 99).map(n => s"($n)-"),
    Gen.alphaNumStr.map(s => s"()$s"),
  )

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("scrub is total and strips $ , and the footnote prefix") {
    import spark.implicits._
    val vals = samples(noisy, 500)
    val out = vals.toDF("v").select(OewsCleaner.scrub(col("v")).as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.length == vals.length)
    out.foreach {
      case Some(s) => assert(!s.contains("$") && !s.contains(","), s"dirty: $s")
      case None => // NULL ok (suppression sentinel)
    }
  }

  test("suppression sentinel always NULLs") {
    import spark.implicits._
    val vals = (0 until 200).map(n => s"($n)-")
    val out = vals.toDF("v").select(OewsCleaner.scrub(col("v"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
