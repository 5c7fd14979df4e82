package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: scaled INTEGER base-2 logarithm —
  * log2_1e6(x) = e·10⁶ + TAB[j] for x ≥ 1, where e = ⌊log2 x⌋ (the
  * bit length minus one) and TAB is a 256-entry mantissa table
  * (⌊log2(1 + j/256)·10⁶⌋ for the top 8 fraction bits j). x ≤ 0 → NULL
  * (out of domain).
  *
  * Purpose: make LOG-DOMAIN quality scores gateable. `ln`/`log2` as
  * doubles are correctly rounded nowhere in SQL standards — Spark's
  * java.lang.Math.log and DuckDB's libm may differ in the last ulp, so
  * any perplexity/entropy built on them can flip a hash gate. This
  * kernel is pure integer arithmetic (bit length + table lookup), and
  * the DuckDB twin embeds the SAME table constants via [[mantissaSql]]
  * — one source array, bit-identical by construction. Max error is
  * log2(1 + 1/256) ≈ 0.0056 bits (~0.4 %), irrelevant for ranking and
  * filtering, which is what log-domain scores are for.
  *
  * The table itself is computed once with StrictMath (the
  * platform-independent fdlibm spelling), so the constants are stable
  * across JVMs; the oracle never recomputes them.
  */
case class IntegerLog2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "log2_1e6"

  override protected def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Long]
    if (v <= 0L) null else IntegerLog2.log2Scaled(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c <= 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.IntegerLog2.log2Scaled($c); }
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): IntegerLog2 =
    copy(child = newChild)
}

object IntegerLog2 {

  val Scale = 1000000L

  /** ⌊log2(1 + j/256)·10⁶⌋ for j in 0..255 — shared verbatim with the
    * SQL twin through [[mantissaSql]].
    */
  val Table: Array[Long] = Array.tabulate(256) { j =>
    math.floor(
      StrictMath.log(1.0 + j / 256.0) / StrictMath.log(2.0) * 1e6).toLong
  }

  /** Static kernel: callers guarantee x ≥ 1. */
  def log2Scaled(x: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val j =
      if (e >= 8) ((x >>> (e - 8)) - 256L).toInt
      else ((x << (8 - e)) - 256L).toInt
    e * Scale + Table(j)
  }

  /** Column API. */
  def log2s(x: Column): Column = Bridge.column(IntegerLog2(Bridge.expression(x)))

  /** The mantissa table as a DuckDB list literal — splice into oracle
    * SQL so both engines index one shared constant array.
    */
  def mantissaSql: String = Table.mkString("[", ",", "]")

  /** The full scaled-log2 of a POSITIVE bigint SQL expression `x`
    * (spell it as a plain column reference — it is inlined three
    * times). Shift = exact power-of-two division on positives, `//`
    * truncation = floor there, so the mantissa index matches the
    * kernel's bit shifts exactly.
    */
  def log2Sql(x: String): String =
    s"(CAST(length(bin($x)) - 1 AS BIGINT) * 1000000 + ($mantissaSql)[" +
      s"CAST(CASE WHEN length(bin($x)) - 1 >= 8 " +
      s"THEN $x // (1::BIGINT << (length(bin($x)) - 9)) " +
      s"ELSE $x * (1::BIGINT << (9 - length(bin($x)))) END - 255 AS INTEGER)])"
}
