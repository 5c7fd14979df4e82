package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: `array<float>` → ×10⁴-quantized
  * `array<long>` — the embedding-quantize map that fronts EVERY
  * similarity/dedup operator over the quantized integer plane
  * (Similarity.quantize). The built-in spelling,
  * `transform(v, x -> round(x*1e4).cast(long))`, runs on the
  * interpreted higher-order-function path: lambda dispatch + a
  * BigDecimal round per ELEMENT per row, outside whole-stage codegen.
  * On a corpus scan that map is the first thing 100 TB of embeddings
  * flow through, so it gets the same native-kernel treatment as the
  * dot product (LongArrayDot).
  *
  * Rounding contract: HALF AWAY FROM ZERO on the binary double value
  * of `x · 10⁴` (float widens exactly; one correctly-rounded product).
  * This is bit-identical to both reference spellings —
  *   - Spark `round` = BigDecimal.valueOf(v).setScale(0, HALF_UP),
  *     i.e. decimal HALF_UP on v's SHORTEST decimal representation;
  *   - DuckDB `round(double)` = binary half-away-from-zero —
  * because every half-integer boundary x.5 with |x| < 2⁵² is exactly
  * representable: a double v and its shortest decimal can never sit on
  * opposite sides of (or exactly on, for only one of them) such a
  * boundary, so the three definitions decide every input identically
  * in this domain (|v| ≤ ~10⁹ here). The half-case is REAL data, not
  * theory — 0.03125f·10⁴ = 312.5 exactly (scaladoc on
  * Similarity.quantize) — so an implementation using Math.rint
  * (half-to-even) or `floor(v+0.5)` (the +0.5 addition itself rounds,
  * misclassifying near-ties like v = x.5−ulp) would silently diverge.
  * Here frac = |v| − floor(|v|) is EXACT (the difference of a double
  * and its floor below 2⁵³ is representable), so `frac ≥ 0.5` is an
  * exact tie test. Contract: finite inputs (embeddings); NaN/±Inf are
  * out of contract (NaN → 0, ±Inf → ±Long.MAX on the kernel path).
  *
  * Null semantics match the transform spelling: null array → null,
  * null element → null element (round/cast propagate null per slot).
  */
case class FloatArrayQuantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = elemNullable)
  override def prettyName: String = "float_array_quantize"

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (elemNullable) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!xs.isNullAt(i)) {
          val d = if (elemIsFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
          out(i) = FloatArrayQuantize.roundHalfAway(d * 10000.0)
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val d = if (elemIsFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
        out(i) = FloatArrayQuantize.roundHalfAway(d * 10000.0)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val av = ctx.freshName("av")
      val fl = ctx.freshName("fl")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      val getter = if (elemIsFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val base = if (elemNullable) "Object" else "long"
      val store =
        if (elemNullable) s"$out[$i] = (Object) ($d < 0 ? -$r : $r);"
        else s"$out[$i] = $d < 0 ? -$r : $r;"
      val nullSkip = if (elemNullable) s"if ($v.isNullAt($i)) continue;" else ""
      s"""
         |int $n = $v.numElements();
         |$base[] $out = new $base[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullSkip
         |  double $d = ($getter) * 10000.0;
         |  double $av = java.lang.Math.abs($d);
         |  double $fl = java.lang.Math.floor($av);
         |  long $r = (long) $fl + (($av - $fl >= 0.5) ? 1L : 0L);
         |  $store
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatArrayQuantize =
    copy(child = newChild)
}

object FloatArrayQuantize {

  /** Exact half-away-from-zero for |v| < 2⁵³ (see class doc for why
    * the frac compare is exact and the +0.5 spelling is not).
    */
  def roundHalfAway(d: Double): Long = {
    val av = math.abs(d)
    val fl = math.floor(av)
    val r = fl.toLong + (if (av - fl >= 0.5) 1L else 0L)
    if (d < 0) -r else r
  }

  /** Column API: quantize a float/double-array embedding column. */
  def quantize(v: Column): Column =
    Bridge.column(FloatArrayQuantize(Bridge.expression(v)))
}
