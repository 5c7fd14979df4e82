package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the core
  * `org.apache.avro` library (the jars Spark itself ships for its
  * shuffle/serializer internals) — the `spark-avro` connector module is
  * not on this classpath, so the format support is implemented here:
  * StructType → record-schema mapping, one container file per
  * partition on write, file-granularity parallel decode on read.
  *
  * Scale shape: the WRITE is a `mapPartitions` pass — every partition
  * streams its rows through one DataFileWriter straight to the
  * destination filesystem (Hadoop FileSystem API, so `file:`, HDFS or
  * any object-store connector behind it), no driver materialization.
  * The READ parallelizes over the container FILES (driver state is one
  * O(files) listing, the same planning cost every file-based scan
  * pays) and streams each through DataFileStream — decode work is
  * distributed at file granularity. A finer-than-file split would seek
  * to Avro sync markers (what hadoop's AvroInputFormat does); at the
  * one-file-per-upstream-partition layout this writer produces, file
  * granularity IS partition granularity, which is the parallelism the
  * data had on write.
  *
  * Type coverage: the scalar lake types — long, int, double, float,
  * boolean, string, binary — plus nested ARRAYs of them (e.g. the
  * embedding `list<float>` columns an ML lake carries); nullability at
  * any level via Avro's (null | T) union, the standard encoding.
  */
object AvroSource {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem)
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava)
        else e)
    case other => throw new IllegalArgumentException(
      s"AvroSource: unsupported type $other")
  }

  /** Spark row value → Avro datum (recursive for arrays). */
  private def toAvro(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: scala.collection.Seq[_] =>
      val out = new java.util.ArrayList[Any](s.length)
      s.foreach(x => out.add(toAvro(x)))
      out
    case other => other
  }

  /** Avro datum → Spark row value (recursive for arrays). */
  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case c: java.util.Collection[_] =>
      c.asScala.iterator.map(fromAvro).toSeq
    case other => other
  }

  /** Spark StructType → Avro record schema. Nullable fields become the
    * canonical (null | T) union with a null default.
    */
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.foldLeft(
      SchemaBuilder.record(name).namespace("graft").fields()) { (b, f) =>
      val t = avroType(f.dataType)
      if (f.nullable)
        b.name(f.name).`type`(Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), t).asJava)).withDefault(null)
      else b.name(f.name).`type`(t).noDefault()
    }
    fields.endRecord()
  }

  /** Write `df` as Avro container files, one per partition, under
    * `dir` (cleared first — overwrite semantics like the other
    * roundtrip staging writers). Empty partitions produce no file.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val schemaJson = toAvroSchema(schema).toString
    val n = schema.fields.length
    // clear destination driver-side (same overwrite contract as
    // DataFrameWriter.mode(overwrite))
    val fs = FileSystem.get(new java.net.URI(dir).resolve("/"), new Configuration())
    val root = new Path(dir)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val avroSchema = new Schema.Parser().parse(schemaJson)
        val conf = new Configuration()
        val out = FileSystem.get(new java.net.URI(dir).resolve("/"), conf)
          .create(new Path(dir, f"part-$idx%05d.avro"), true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        var written = 0L
        try {
          writer.create(avroSchema, out)
          rows.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < n) {
              rec.put(i, toAvro(row.get(i)))
              i += 1
            }
            writer.append(rec)
            written += 1
          }
        } finally writer.close() // closes the stream too
        Iterator.single(written)
      }
    }.count() // action: materialize the write
    ()
  }

  /** Read Avro container files under `dir` into a DataFrame with the
    * DECLARED schema (schema-on-declare, consistent with the CSV/JSONL
    * readers — the embedded writer schema is trusted for decode, the
    * declared one for types). Parallelism = one task per file.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(dir).resolve("/"), new Configuration())
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    val n = schema.fields.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { file =>
        val conf = new Configuration()
        val in = FileSystem.get(new java.net.URI(file).resolve("/"), conf)
          .open(new Path(file))
        val stream = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) stream.close()
            h
          }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq((0 until n).map { i =>
              fromAvro(rec.get(schema.fields(i).name))
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
