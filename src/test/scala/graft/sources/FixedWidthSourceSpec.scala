package graft.sources

import graft.TestSpark
import graft.sources.FixedWidthSource.Field
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class FixedWidthSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fields = Seq(
    Field("id", 6, LongType, rightAlign = true),
    Field("name", 8, StringType),
    Field("score", 10, DoubleType, rightAlign = true))

  test("write pads by alignment, read slices and casts, blanks are NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fw").toString + "/t"
    val df = Seq(
      (7L, "alpha", Some(1.25)),
      (42L, "beta", None),
      (123456L, "gamma", Some(-3.5))).toDF("id", "name", "score")
    FixedWidthSource.write(df, dir, fields)
    // raw layout: right-aligned numbers, left-aligned text, 24-char lines
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.forall(_.length == 24))
    assert(lines.exists(_.startsWith("     7alpha   "))) // lpad id, rpad name
    val back = FixedWidthSource.read(spark, dir, fields)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "alpha"), (42L, "beta"), (123456L, "gamma")))
    assert(back(0).getDouble(2) == 1.25)
    assert(back(1).isNullAt(2)) // all-blank field reads as NULL
    assert(back(2).getDouble(2) == -3.5)
  }

  test("overflowing value fails the write instead of corrupting columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fw").toString + "/o"
    val df = Seq((1L, "waytoolongname", Some(0.0))).toDF("id", "name", "score")
    val e = intercept[Exception] {
      FixedWidthSource.write(df, dir, fields)
    }
    assert(e.getMessage != null)
  }
}
