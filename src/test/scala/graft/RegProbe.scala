package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TEMPORARY probe — deleted before commit. */
class RegProbe extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dump regression sums at sf0.001") {
    val li = queries.RefQueries.table(spark, "/root/testdata/sf0.001", "lineitem")
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    val rows = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(x).cast(DoubleType).as("sx"),
      sum(y).cast(DoubleType).as("sy"),
      sum(x * x).cast(DoubleType).as("sxx"),
      sum(x * y).cast(DoubleType).as("sxy"),
      sum(y * y).cast(DoubleType).as("syy"))
      .orderBy("l_returnflag").collect()
    for (r <- rows) {
      val bits = (2 to 6).map(i =>
        java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(r.getDouble(i))))
      println(s"SPARK ${r.getString(0)} n=${r.getLong(1)} $bits")
    }
    // also the full query's r2 bits
    val out = queries.StatQueries.analyticsRegression(spark, "/root/testdata/sf0.001")
      .collect()
    for (r <- out)
      println(s"SPARK r2 ${r.getString(0)} = ${r.getDouble(4)} bits=" +
        java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(r.getDouble(4))))
  }
}
