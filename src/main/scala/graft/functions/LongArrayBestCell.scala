package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: nearest-centroid (argmax-cosine) cell
  * assignment for IVF indexing — `best_cell(vec, centroids, centroid_norms)`
  * over a quantized `array<bigint>` vector and a constant-foldable
  * centroid matrix.
  *
  * Replaces the interpreted `aggregate(centroids, struct(-2.0,-1), ...)`
  * argmax fold (the round-1 spelling): higher-order functions run on the
  * interpreted path with per-element lambda dispatch, and the fold
  * re-entered a 2-field struct per centroid. This expression is one
  * tight primitive nested loop inside whole-stage codegen, per row, no
  * shuffle, no explode — the per-row cost is O(nCells·dim) flops either
  * way, but codegen'd flops, which is what a 100 TB corpus assignment
  * pass needs.
  *
  * Semantics are bit-identical to the fold it replaces
  * (Similarity.assignCells, round 1):
  *   - vn = sqrt((double) Σ v_d²) computed once per row;
  *   - score_c = (double)dot_c / (vn * nrm_c) when both norms > 0,
  *     else −2.0 (a NULL-guarded cosine coalesced to the seed — a
  *     zero-norm vector scores −2.0 everywhere, never strictly beats the
  *     −2.0 seed, and keeps cell −1, so zero vectors enter no inverted
  *     list);
  *   - strict `>` comparison ⇒ ties keep the LOWEST centroid index;
  *   - a NULL element anywhere in the vector (NULL dot ⇒ NULL cosine in
  *     the fold) likewise yields −1.
  */
case class LongArrayBestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>, array<double>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_array_best_cell"

  override def nullSafeEval(v: Any, cents: Any, norms: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cs = cents.asInstanceOf[ArrayData]
    val ns = norms.asInstanceOf[ArrayData]
    val d = vec.numElements()
    var sq = 0L
    var j = 0
    while (j < d) {
      if (vec.isNullAt(j)) return -1
      val x = vec.getLong(j)
      sq += x * x
      j += 1
    }
    val vn = math.sqrt(sq.toDouble)
    var best = -2.0
    var bestIdx = -1
    val nc = cs.numElements()
    var c = 0
    while (c < nc) {
      val cv = cs.getArray(c)
      val cn = ns.getDouble(c)
      val m = math.min(d, cv.numElements())
      var dot = 0L
      var k = 0
      while (k < m) {
        dot += vec.getLong(k) * cv.getLong(k)
        k += 1
      }
      val score = if (vn > 0 && cn > 0) dot.toDouble / (vn * cn) else -2.0
      if (score > best) { best = score; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents, norms) => {
      val d = ctx.freshName("d")
      val sq = ctx.freshName("sq")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val vn = ctx.freshName("vn")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val nc = ctx.freshName("nc")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val cn = ctx.freshName("cn")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val k = ctx.freshName("k")
      val score = ctx.freshName("score")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $d = $v.numElements();
         |long $sq = 0L;
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $d; $j++) {
         |  if ($v.isNullAt($j)) { $hasNull = true; break; }
         |  long $x = $v.getLong($j);
         |  $sq += $x * $x;
         |}
         |int $bestIdx = -1;
         |if (!$hasNull) {
         |  double $vn = java.lang.Math.sqrt((double) $sq);
         |  double $best = -2.0;
         |  int $nc = $cents.numElements();
         |  for (int $c = 0; $c < $nc; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $cents.getArray($c);
         |    double $cn = $norms.getDouble($c);
         |    int $m = java.lang.Math.min($d, $cv.numElements());
         |    long $dot = 0L;
         |    for (int $k = 0; $k < $m; $k++) {
         |      $dot += $v.getLong($k) * $cv.getLong($k);
         |    }
         |    double $score = ($vn > 0 && $cn > 0) ? (double) $dot / ($vn * $cn) : -2.0;
         |    if ($score > $best) { $best = $score; $bestIdx = $c; }
         |  }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LongArrayBestCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LongArrayBestCell {
  /** Column API: argmax-cosine centroid index for a quantized vector. */
  def bestCell(v: Column, cents: Column, norms: Column): Column =
    Bridge.column(LongArrayBestCell(
      Bridge.expression(v), Bridge.expression(cents), Bridge.expression(norms)))
}
