package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntegerLog2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kernel: exact powers, boundaries, monotonicity, error bound") {
    // exact powers of two have zero mantissa
    for (e <- 0 to 62)
      assert(IntegerLog2.log2Scaled(1L << e) == e * 1000000L)
    assert(IntegerLog2.log2Scaled(1L) == 0L)
    assert(IntegerLog2.log2Scaled(Long.MaxValue) ==
      62L * 1000000L + IntegerLog2.Table(255))
    // 8-bit-mantissa approximation: within log2(1+1/256) ≈ 5645 µbits
    // of the true log2, and never above it (floors everywhere)
    for (x <- Seq(3L, 7L, 100L, 255L, 257L, 999999L, 123456789012L)) {
      val approx = IntegerLog2.log2Scaled(x)
      val exact = math.log(x.toDouble) / math.log(2.0) * 1e6
      assert(approx <= exact + 1 && exact - approx < 5700.0,
        s"x=$x approx=$approx exact=$exact")
    }
    // non-decreasing on a dense range (table + shift consistency)
    var prev = 0L
    for (x <- 1L to 5000L) {
      val v = IntegerLog2.log2Scaled(x)
      assert(v >= prev); prev = v
    }
  }

  test("expression: null domain, codegen equals interpreted") {
    import spark.implicits._
    val df = Seq(-5L, 0L, 1L, 2L, 3L, 255L, 256L, 257L, 1L << 40)
      .toDF("x")
      .withColumn("y", IntegerLog2.log2s(col("x")))
    val rows = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.filter(_._1 <= 0).forall(_._2.isEmpty),
      "x <= 0 must be NULL")
    rows.filter(_._1 > 0).foreach { case (x, y) =>
      assert(y.contains(IntegerLog2.log2Scaled(x)))
    }
  }

  test("mantissaSql embeds exactly the kernel's table") {
    val parsed = IntegerLog2.mantissaSql
      .stripPrefix("[").stripSuffix("]").split(",").map(_.toLong)
    assert(parsed.toSeq == IntegerLog2.Table.toSeq)
    assert(IntegerLog2.Table.length == 256 && IntegerLog2.Table(0) == 0L)
  }
}
