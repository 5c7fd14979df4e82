package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: per-token polynomial hashes of a string
  * array — element i of the result is `fold((h·131 + codepoint) mod
  * 1e9+7)` over token i's codepoints. Value-identical to
  * `transform(toks, TextOps.polyTokenHash)` (the interpreted spelling,
  * spec-pinned), which pays a `substring`+`ascii` allocation per
  * CHARACTER per token; this is one generated call per row into a
  * tight codepoint walk — the same walk StringArrayFingerprint uses
  * before its outer fold, exposed WITHOUT the fold so window/shingle
  * operators (substring dedup's rolling hash) can reuse per-token
  * hashes across every window that contains the token.
  *
  * Null semantics match the transform spelling: null array → null;
  * a null TOKEN → a null slot at its position (transform maps
  * per-element, it does not poison siblings).
  */
case class StringArrayTokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "string_array_token_hashes"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    StringArrayTokenHashes.kernel(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.StringArrayTokenHashes.kernel($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): StringArrayTokenHashes =
    copy(child = newChild)
}

object StringArrayTokenHashes {
  private final val M = 1000000007L

  /** Static kernel, called from generated code. */
  def kernel(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 131 + cp) % M
          j += Character.charCount(cp)
        }
        out(i) = java.lang.Long.valueOf(h)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: per-token polynomial hash array of a token array. */
  def tokenHashes(toks: Column): Column =
    Bridge.column(StringArrayTokenHashes(Bridge.expression(toks)))
}
