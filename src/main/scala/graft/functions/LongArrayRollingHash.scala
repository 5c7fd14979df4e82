package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: all w-element rolling polynomial window
  * hashes of a long array in one codegen'd pass — window s (0-based)
  * gets `fold(h·mult + x mod p)` over elements [s, s+w). The substring
  * dedup operator's hot path: the built-in spelling is an interpreted
  * `aggregate` fold over an interpreted `slice` PER WINDOW (measured
  * 2.9 s at sf0.1); here every window is a tight generated loop over
  * longs already in the array (~20 adds/mults per window — sub-100 ms
  * for the same corpus).
  *
  * Deliberately O(n·w), not the modular-inverse O(n) rolling update:
  * at w=20 the window loop is nanoseconds next to tokenization, and
  * the naive loop reproduces the fold spelling's null semantics
  * EXACTLY — a null element null-poisons exactly the windows that
  * contain it, which an incremental update cannot express without
  * recompute bookkeeping that would dwarf the savings.
  *
  * Degenerate inputs match the query spelling: fewer than w elements
  * (the production query filters these, but the contract shouldn't
  * depend on it) and a NULL input array both yield an EMPTY array —
  * `transform(sequence(1, n-w+1), ...)` over n < w raises in ANSI mode
  * (descending sequence), so the kernel is strictly more defined.
  * Caller guarantees 0 ≤ x < p (true for polyTokenHash output), so
  * h·mult + x stays below 2^62 and ANSI overflow cannot fire.
  */
case class LongArrayRollingHash(child: Expression, w: Int, mult: Long, p: Long)
    extends UnaryExpression {
  require(w >= 1 && mult > 0 && p > 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "long_array_rolling_hash"
  override def nullable: Boolean = false

  private val empty = new GenericArrayData(new Array[Any](0))

  private def compute(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    if (n < w) return empty
    val out = new Array[Any](n - w + 1)
    var s = 0
    while (s < n - w + 1) {
      var h = 0L
      var ok = true
      var j = 0
      while (ok && j < w) {
        if (xs.isNullAt(s + j)) ok = false
        else h = (h * mult + xs.getLong(s + j)) % p
        j += 1
      }
      if (ok) out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) empty else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val s = ctx.freshName("s")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val ok = ctx.freshName("ok")
    val body =
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (${childGen.isNull} || $v.numElements() < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  int $n = $v.numElements();
         |  Object[] $out = new Object[$n - $w + 1];
         |  for (int $s = 0; $s < $n - $w + 1; $s++) {
         |    long $h = 0L;
         |    boolean $ok = true;
         |    for (int $j = 0; $ok && $j < $w; $j++) {
         |      if ($v.isNullAt($s + $j)) { $ok = false; }
         |      else { $h = ($h * ${mult}L + $v.getLong($s + $j)) % ${p}L; }
         |    }
         |    if ($ok) $out[$s] = Long.valueOf($h);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    ev.copy(code = code"${childGen.code}\n$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LongArrayRollingHash =
    copy(child = newChild)
}

object LongArrayRollingHash {
  /** Column API: all w-window rolling hashes of a long-array column. */
  def rollingHash(hashes: Column, w: Int, mult: Long = 131L,
      p: Long = 1000000007L): Column =
    Bridge.column(LongArrayRollingHash(Bridge.expression(hashes), w, mult, p))
}
