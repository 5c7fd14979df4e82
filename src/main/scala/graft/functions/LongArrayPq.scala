package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for the PQ/ADC fine quantizer
  * (Similarity.pqTopKCosine). The interpreted HOF spellings
  * (`codesOf`/`tableOf`'s transform+aggregate folds) pay per-element
  * lambda dispatch and re-enter a struct per codebook entry — the
  * per-row-lambda-where-a-kernel-fits anti-pattern this repo's own
  * standard names (LongArrayBestCell is the precedent). These two
  * expressions are the scan-side hot path as tight primitive loops
  * inside whole-stage codegen; SimilaritySpec pins them bit-equal to
  * the interpreted spellings, which remain as the cross-check.
  *
  * `pq_encode(vec, codebook)` — codebook is an m×ks×sub constant
  * literal. Per block b: code_b = argmin_c Σ_d (vec[b·sub+d] − cb[b][c][d])²
  * over exact longs; strict `<` keeps the LOWEST code on ties (the
  * array_min-over-struct tie-break of the interpreted fold). Vector
  * elements beyond vec's length — ragged corpora — and NULL elements
  * read as 0, mirroring `coalesce(try_element_at(v, i), 0)`.
  *
  * `pq_adc(codes, table)` — table is the query's m×ks inner-product
  * table; approx_dot = Σ_b table[b][codes[b]]. Pure table lookups,
  * no O(dim) work — the reason a PQ scan over a 100 TB corpus is ~32×
  * cheaper than exact scoring. Codes are trusted in-range by
  * construction (encode emits 0..ks−1); a NULL codes element yields
  * NULL like the interpreted element_at chain would.
  */
case class LongArrayPqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(ArrayType(LongType, _), _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<array<bigint>>>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val book = cb.asInstanceOf[ArrayData]
    val vlen = vec.numElements()
    val m = book.numElements()
    val codes = new Array[Int](m)
    var b = 0
    while (b < m) {
      val entries = book.getArray(b)
      val ks = entries.numElements()
      val sub = if (ks > 0) entries.getArray(0).numElements() else 0
      var bestDist = Long.MaxValue
      var bestCode = 0
      var c = 0
      while (c < ks) {
        val cvec = entries.getArray(c)
        var dist = 0L
        var d = 0
        while (d < sub) {
          val i = b * sub + d
          val x =
            if (i < vlen && !vec.isNullAt(i)) vec.getLong(i) else 0L
          val diff = x - cvec.getLong(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; bestCode = c }
        c += 1
      }
      codes(b) = bestCode
      b += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val vlen = ctx.freshName("vlen")
      val m = ctx.freshName("m")
      val codes = ctx.freshName("codes")
      val b = ctx.freshName("b")
      val entries = ctx.freshName("entries")
      val ks = ctx.freshName("ks")
      val sub = ctx.freshName("sub")
      val bestDist = ctx.freshName("bestDist")
      val bestCode = ctx.freshName("bestCode")
      val c = ctx.freshName("c")
      val cvec = ctx.freshName("cvec")
      val dist = ctx.freshName("dist")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $vlen = $v.numElements();
         |int $m = $cb.numElements();
         |int[] $codes = new int[$m];
         |for (int $b = 0; $b < $m; $b++) {
         |  $ad $entries = $cb.getArray($b);
         |  int $ks = $entries.numElements();
         |  int $sub = $ks > 0 ? $entries.getArray(0).numElements() : 0;
         |  long $bestDist = Long.MAX_VALUE;
         |  int $bestCode = 0;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    $ad $cvec = $entries.getArray($c);
         |    long $dist = 0L;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      int $i = $b * $sub + $d;
         |      long $x = ($i < $vlen && !$v.isNullAt($i)) ? $v.getLong($i) : 0L;
         |      long $diff = $x - $cvec.getLong($d);
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestDist) { $bestDist = $dist; $bestCode = $c; }
         |  }
         |  $codes[$b] = $bestCode;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayPqEncode =
    copy(left = newLeft, right = newRight)
}

case class LongArrayPqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<bigint>>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  // forced nullable: ev.isNull must be a VARIABLE in the generated code
  // (a NULL codes element yields NULL) — with non-nullable children the
  // default would fold it to a literal and the assignment below would
  // not compile
  override def nullable: Boolean = true

  override def nullSafeEval(cs: Any, tb: Any): Any = {
    val codes = cs.asInstanceOf[ArrayData]
    val table = tb.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), table.numElements())
    var acc = 0L
    var b = 0
    while (b < m) {
      if (codes.isNullAt(b)) return null
      acc += table.getArray(b).getLong(codes.getInt(b))
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, tb) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val sawNull = ctx.freshName("sawNull")
      s"""
         |int $m = java.lang.Math.min($cs.numElements(), $tb.numElements());
         |long $acc = 0L;
         |boolean $sawNull = false;
         |for (int $b = 0; $b < $m; $b++) {
         |  if ($cs.isNullAt($b)) { $sawNull = true; break; }
         |  $acc += $tb.getArray($b).getLong($cs.getInt($b));
         |}
         |${ev.isNull} = $sawNull;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayPqAdc =
    copy(left = newLeft, right = newRight)
}

object LongArrayPq {
  /** Column API: per-block argmin-L2 PQ codes for a quantized vector. */
  def pqEncode(v: Column, codebook: Column): Column =
    Bridge.column(LongArrayPqEncode(
      Bridge.expression(v), Bridge.expression(codebook)))

  /** Column API: ADC approximate dot product from codes + query table. */
  def pqAdc(codes: Column, table: Column): Column =
    Bridge.column(LongArrayPqAdc(
      Bridge.expression(codes), Bridge.expression(table)))
}
