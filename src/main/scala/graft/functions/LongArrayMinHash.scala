package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: k-permutation MinHash signature of a
  * base-hash array — `min_i((a_j·x_i + b_j) mod p)` for each of the k
  * affine permutations, in ONE codegen'd nested loop per row.
  *
  * This turns the signature build into a true narrow map: the round-1
  * spelling exploded shingles and ran a HashAggregate with k min
  * buffers — codegen'd, but it paid an exchange keyed by doc_id before
  * banding. Per-row the work is identical (k·|shingles| multiply-mods);
  * what disappears at 100 TB is the signature shuffle itself (the
  * banding join's O(docs·bands) skinny exchange becomes the ONLY
  * shuffle in candidate generation).
  *
  * Permutation constants arrive as plain arrays (driver-computed, see
  * MinHashDedup.perm) and are attached to the generated class as
  * reference objects — not inlined literal trees, which at k=128 would
  * bloat codegen (the round-1 centroid lesson).
  *
  * Semantics match the array-fold spelling (`array_min` over the
  * permuted transform) EXACTLY, degenerate inputs included: null
  * ELEMENTS are SKIPPED (`array_min` ignores null entries — it does not
  * null-poison); a NULL input, an empty array, or all-null elements →
  * an array of k NULL slots (the fold's `array(array_min(...), ...)`
  * is a literal array OF k null results, never a null array — so this
  * expression is NEVER null and `nullable` is false). Production
  * callers filter empty shingle sets before signing; the parity matters
  * so the spellings stay interchangeable. Caller guarantees 0 ≤ x < p
  * and a·x+b < 2^62 (31-bit hashes, p = 2^31−1) so ANSI overflow
  * cannot fire.
  */
case class LongArrayMinHash(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "long_array_minhash"
  override def nullable: Boolean = false

  private def nullSlots: GenericArrayData =
    new GenericArrayData(new Array[Any](a.length))

  private def compute(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    val k = a.length
    val res = new Array[Long](k)
    var j = 0
    while (j < k) { res(j) = Long.MaxValue; j += 1 }
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val x = xs.getLong(i)
        j = 0
        while (j < k) {
          val h = (a(j) * x + b(j)) % p
          if (h < res(j)) res(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(res) else nullSlots
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullSlots else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    val v = childGen.value
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val res = ctx.freshName("res")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val x = ctx.freshName("x")
    val h = ctx.freshName("h")
    val any = ctx.freshName("any")
    val body =
      s"""
         |int $k = $aRef.length;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |boolean $any = false;
         |long[] $res = new long[$k];
         |if (!${childGen.isNull}) {
         |  int $n = $v.numElements();
         |  java.util.Arrays.fill($res, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) continue;
         |    $any = true;
         |    long $x = $v.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = ($aRef[$j] * $x + $bRef[$j]) % ${p}L;
         |      if ($h < $res[$j]) $res[$j] = $h;
         |    }
         |  }
         |}
         |if ($any) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |}
       """.stripMargin
    ev.copy(code = code"${childGen.code}\n$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LongArrayMinHash =
    copy(child = newChild)
}

object LongArrayMinHash {
  /** Column API: minhash signature array from a base-hash array column. */
  def minhash(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    Bridge.column(LongArrayMinHash(Bridge.expression(hashes), a, b, p))
}
