package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corners the source_avro_roundtrip gate doesn't reach: the full
  * scalar type palette, NULLs through the (null|T) union, empty
  * partitions, overwrite semantics, and the unsupported-type refusal.
  */
class AvroSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-avro-spec-" +
      s"${ProcessHandle.current().pid()}/$name"

  private val FullSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("raw", BinaryType)))

  test("all scalar types + NULLs survive the round trip bit-exact") {
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -1, Double.MinPositiveValue, Float.MaxValue, false, "", Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), FullSchema)
    val d = dir("full")
    AvroSource.write(df, d)
    val back = AvroSource.read(spark, d, FullSchema)
      .orderBy("k").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getInt(1) == 7 &&
      back(0).getDouble(2) == 1.5 && back(0).getFloat(3) == 2.5f &&
      back(0).getBoolean(4) && back(0).getString(5) == "alpha" &&
      back(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert((1 to 6).forall(back(1).isNullAt))
    assert(back(2).getDouble(2) == Double.MinPositiveValue &&
      back(2).getFloat(3) == Float.MaxValue &&
      back(2).getString(5) == "" &&
      back(2).getAs[Array[Byte]](6).isEmpty)
  }

  test("empty partitions write no file; read parallelism = file count") {
    val schema = StructType(Seq(StructField("k", LongType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L)), 8), schema)
    val d = dir("sparse")
    AvroSource.write(df, d)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d).resolve("/"), new org.apache.hadoop.conf.Configuration())
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(_.getPath.getName.endsWith(".avro"))
    assert(files.length == 2, "only the 2 non-empty partitions materialize")
    val back = AvroSource.read(spark, d, schema)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("write is overwrite: a second write fully replaces the first") {
    val schema = StructType(Seq(StructField("k", LongType, nullable = false)))
    val d = dir("overwrite")
    AvroSource.write(spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 100L).map(Row(_)), 4), schema), d)
    AvroSource.write(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(42L)), 1), schema), d)
    assert(AvroSource.read(spark, d, schema).collect().map(_.getLong(0))
      .toSeq == Seq(42L))
  }

  test("array columns round-trip, including NULL elements and empty/NULL arrays") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = true)),
      StructField("w", ArrayType(StringType, containsNull = false))))
    val rows = Seq(
      Row(1L, Seq(1.5f, -2.25f, Float.MinPositiveValue), Seq("a", "b")),
      Row(2L, Seq(null, 3.5f), Seq.empty[String]),
      Row(3L, null, Seq("z")))
    val d = dir("arrays")
    AvroSource.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), d)
    val back = AvroSource.read(spark, d, schema).orderBy("k").collect()
    assert(back(0).getSeq[Float](1) == Seq(1.5f, -2.25f, Float.MinPositiveValue))
    assert(back(0).getSeq[String](2) == Seq("a", "b"))
    assert(back(1).getSeq[Any](1) == Seq(null, 3.5f))
    assert(back(1).getSeq[String](2).isEmpty)
    assert(back(2).isNullAt(1) && back(2).getSeq[String](2) == Seq("z"))
  }

  test("unsupported column types are refused at schema mapping") {
    intercept[IllegalArgumentException] {
      AvroSource.toAvroSchema(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
  }
}
