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
  * Semantics: null input → null; a null ELEMENT → null signature (the
  * array-fold spelling's `array_min` over a null-poisoned transform is
  * likewise null); empty input → null (callers filter empty shingle
  * sets — `array_min(transform([], ...))` is null per element too).
  * Caller guarantees 0 ≤ x < p and a·x+b < 2^62 (31-bit hashes, p =
  * 2^31−1) so ANSI overflow cannot fire.
  */
case class LongArrayMinHash(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_array_minhash"
  override def nullable: Boolean = true // null/empty input or null element

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val k = a.length
    val res = new Array[Long](k)
    var j = 0
    while (j < k) { res(j) = Long.MaxValue; j += 1 }
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = xs.getLong(i)
      j = 0
      while (j < k) {
        val h = (a(j) * x + b(j)) % p
        if (h < res(j)) res(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(res)
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
      s"""
         |int $n = $v.numElements();
         |int $k = $aRef.length;
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $res = new long[$k];
         |  java.util.Arrays.fill($res, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $x = $v.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = ($aRef[$j] * $x + $bRef[$j]) % ${p}L;
         |      if ($h < $res[$j]) $res[$j] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |  }
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
