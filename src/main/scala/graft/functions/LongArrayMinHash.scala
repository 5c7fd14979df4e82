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
  * permuted transform) EXACTLY, degenerate inputs included: null input
  * → null; null ELEMENTS are SKIPPED (`array_min` ignores null entries
  * — it does not null-poison); an empty array or all-null elements →
  * an array of k NULL slots (`array_min` of an empty/all-null list is
  * null, per permutation). Production callers filter empty shingle
  * sets before signing; the parity matters so the spellings stay
  * interchangeable. Caller guarantees 0 ≤ x < p and a·x+b < 2^62
  * (31-bit hashes, p = 2^31−1) so ANSI overflow cannot fire.
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

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
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
    if (any) new GenericArrayData(res)
    else new GenericArrayData(new Array[Any](k)) // k null slots, like array_min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val res = ctx.freshName("res")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val any = ctx.freshName("any")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $n = $v.numElements();
         |int $k = $aRef.length;
         |long[] $res = new long[$k];
         |java.util.Arrays.fill($res, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) continue;
         |  $any = true;
         |  long $x = $v.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = ($aRef[$j] * $x + $bRef[$j]) % ${p}L;
         |    if ($h < $res[$j]) $res[$j] = $h;
         |  }
         |}
         |if ($any) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |} else {
         |  Object[] $boxed = new Object[$k];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongArrayMinHash =
    copy(child = newChild)
}

object LongArrayMinHash {
  /** Column API: minhash signature array from a base-hash array column. */
  def minhash(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    Bridge.column(LongArrayMinHash(Bridge.expression(hashes), a, b, p))
}
