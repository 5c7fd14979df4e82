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
  * Semantics match the fold spelling EXACTLY, degenerate inputs
  * included: null input → null; an empty array or any null ELEMENT →
  * signature 0 (in the fold, a null element — or the `sequence(0,-1)`
  * padding an empty array produces — nulls every bit's sum, and
  * `when(s >= 0, bit).otherwise(0)` then contributes 0 for every bit).
  * Round-2 review caught the first version setting all bits on empty
  * input (s = 0 ≥ 0) — a real divergence from the fold and the DuckDB
  * twin, which both yield 0.
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

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return 0L
    var sig = 0L
    var i = 0
    while (i < bits) {
      var s = 0L
      var d = 0
      while (d < n) {
        if (xs.isNullAt(d)) return 0L
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
      val degenerate = ctx.freshName("degenerate")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |boolean $degenerate = ($n == 0);
         |for (int $i = 0; $i < $bits && !$degenerate; $i++) {
         |  long $s = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($v.isNullAt($d)) { $degenerate = true; break; }
         |    long $sign =
         |      ((($i * 1315423911L + $d * 2654435761L) % 1000003L) % 2 == 0) ? 1L : -1L;
         |    $s += $v.getLong($d) * $sign;
         |  }
         |  if (!$degenerate && $s >= 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $degenerate ? 0L : $sig;
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
