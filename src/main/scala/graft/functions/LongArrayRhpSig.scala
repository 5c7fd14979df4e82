package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: random-hyperplane LSH signature of a
  * quantized vector — `bits` sign bits of Σ_d x_d·sign(i,d), where
  * sign(i,d) = ±1 from the fixed LCG mix
  * `((i·1315423911 + d·2654435761) % 1000003) % 2` (engine-neutral —
  * the same arithmetic the DuckDB oracle restates).
  *
  * Replaces `bits` interpreted `aggregate(zip_with(...))` folds per row
  * (Similarity.rhpSignature, kept as the reference spelling and
  * spec-pinned equal): the signature is computed over the CORPUS side
  * of the ANN index, so at 100 TB this is the difference between a
  * codegen'd narrow map and per-element lambda dispatch × bits.
  *
  * Semantics match the fold spelling: null input → null; null element →
  * null (a null poisons the zip_with sum, making every bit's vote null
  * → whole signature null); empty input → signature of all-zero sums =
  * all bits set (s ≥ 0 for s = 0), exactly like the fold.
  */
case class LongArrayRhpSig(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_rhp_sig"
  override def nullable: Boolean = true // null element ⇒ null signature

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var sig = 0L
    var i = 0
    while (i < bits) {
      var s = 0L
      var d = 0
      while (d < n) {
        if (xs.isNullAt(d)) return null
        val sign =
          if (((i * 1315423911L + d * 2654435761L) % 1000003L) % 2 == 0) 1L else -1L
        s += xs.getLong(d) * sign
        d += 1
      }
      if (s >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val sign = ctx.freshName("sign")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits && !${ev.isNull}; $i++) {
         |  long $s = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($v.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    long $sign =
         |      ((($i * 1315423911L + $d * 2654435761L) % 1000003L) % 2 == 0) ? 1L : -1L;
         |    $s += $v.getLong($d) * $sign;
         |  }
         |  if (!${ev.isNull} && $s >= 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongArrayRhpSig =
    copy(child = newChild)
}

object LongArrayRhpSig {
  /** Column API: RHP-LSH signature of a quantized embedding column. */
  def rhpSig(v: Column, bits: Int): Column =
    Bridge.column(LongArrayRhpSig(Bridge.expression(v), bits))
}
