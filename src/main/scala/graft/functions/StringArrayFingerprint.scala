package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the rolling polynomial document
  * fingerprint — fold `(acc·31 + tokenHash) mod 1e9+7` over tokens,
  * where tokenHash folds `(a·131 + codepoint) mod 1e9+7` over the
  * token's characters. Value-identical to the built-in spelling
  * (TextOps.fingerprint's nested `aggregate`/`transform`/`ascii` — kept
  * as the reference, spec-pinned) and to the DuckDB oracle's nested
  * `list_reduce`.
  *
  * The built-in spelling is two interpreted lambda layers with a
  * `substring`+`ascii` allocation per CHARACTER; this is one generated
  * call into a tight static kernel per row. Codepoint semantics match
  * `ascii(substring(t, i, 1))`: Spark substrings index characters, and
  * `ascii` returns the first codepoint — hence the kernel walks
  * codepoints, not UTF-16 units, so supplementary characters hash
  * identically too.
  *
  * Null semantics match the fold: null array → null; a null token
  * poisons the running fold → null.
  */
case class StringArrayFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "string_array_fingerprint"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    StringArrayFingerprint.kernel(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = graft.functions.StringArrayFingerprint.kernel($v);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StringArrayFingerprint =
    copy(child = newChild)
}

object StringArrayFingerprint {
  private final val M = 1000000007L

  /** Static kernel, called from generated code: one virtual call per row
    * instead of per-element lambda dispatch. Returns java.lang.Long or
    * null (null token ⇒ null fingerprint, like the fold).
    */
  def kernel(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val s = arr.getUTF8String(i).toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = (h * 131 + cp) % M
        j += Character.charCount(cp)
      }
      acc = (acc * 31 + h) % M
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column API: rolling polynomial fingerprint of a token array. */
  def fingerprint(toks: Column): Column =
    Bridge.column(StringArrayFingerprint(Bridge.expression(toks)))
}
