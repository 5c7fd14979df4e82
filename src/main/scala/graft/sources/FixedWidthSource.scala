package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Fixed-width (mainframe/COBOL-layout) text source — the one classic
  * batch landing format Spark ships no reader for. Schema-on-read is a
  * column layout (name, width, type): each line is sliced by absolute
  * offsets, trimmed, and cast. Everything is built-in Catalyst
  * (`substring`/`trim`/`cast` — all codegen'd), so a fixed-width scan
  * gets whole-stage codegen and column pruning exactly like a CSV scan,
  * and the underlying text source keeps line-level splittability: a
  * 100 TB fixed-width dump parallelizes by HDFS block, no record
  * boundary scan needed (records ARE lines).
  *
  * Write side pads with `lpad` (numbers, right-aligned) or `rpad`
  * (strings) and overflow-CHECKS rather than silently truncating — a
  * value wider than its field would corrupt every later column on the
  * line, the classic fixed-width failure.
  */
object FixedWidthSource {

  /** One column of the layout: `width` chars, parsed by trimming spaces
    * then casting to `dataType`; all-blank fields become NULL.
    */
  final case class Field(name: String, width: Int, dataType: DataType,
      rightAlign: Boolean = false)

  /** Slice one line column-wise. `start` is 1-based (SQL substring). */
  private def slice(line: Column, start: Int, f: Field): Column = {
    val raw = trim(substring(line, start, f.width))
    val v = when(raw === "", lit(null).cast(StringType)).otherwise(raw)
    v.cast(f.dataType).as(f.name)
  }

  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    val starts = fields.scanLeft(1)((acc, f) => acc + f.width)
    spark.read.text(path).select(
      fields.zip(starts).map { case (f, s) => slice(col("value"), s, f) }: _*)
  }

  /** Render `df`'s columns as one fixed-width line per row. Numbers are
    * right-aligned when the field says so; a rendered value wider than
    * its field raises (per-row, executor-side) instead of truncating.
    */
  def write(df: DataFrame, path: String, fields: Seq[Field]): Unit = {
    val rendered = fields.map { f =>
      val s = col(f.name).cast(StringType)
      val checked = when(length(s) > f.width,
        raise_error(concat(lit(s"fixed-width overflow in ${f.name}: "), s)))
        .otherwise(s)
      val padded =
        if (f.rightAlign) lpad(coalesce(checked, lit("")), f.width, " ")
        else rpad(coalesce(checked, lit("")), f.width, " ")
      padded
    }
    df.select(concat(rendered: _*).as("value"))
      .write.mode("overwrite").text(path)
  }
}
