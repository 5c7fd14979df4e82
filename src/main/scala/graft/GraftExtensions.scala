package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** The library's `SparkSessionExtensions` entry point — the idiomatic
  * deployment path for a Spark-native engine: set
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * on ANY session (spark-submit conf, thriftserver, notebook kernel) and
  * the native codegen kernels become permanent SQL functions, no driver
  * code required. `functions.registerAll` stays as the programmatic
  * temp-function variant for sessions built without the conf.
  *
  * Only the parameter-free kernels are SQL-exposed; the
  * constant-carrying expressions (minhash permutations, IVF centroid
  * matrix) take driver-computed model artifacts that have no SQL-literal
  * spelling, so they remain Column-API only by design.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      info("long_array_dot",
        "_FUNC_(a, b) - exact dot product of two array<long> vectors"),
      (es: Seq[Expression]) => LongArrayDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("long_array_and_popcount"),
      info("long_array_and_popcount",
        "_FUNC_(a, b) - popcount of the AND of two packed bitmaps"),
      (es: Seq[Expression]) => LongArrayAndPopcount(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("long_array_rhp_sig"),
      info("long_array_rhp_sig",
        "_FUNC_(v, bits) - random-hyperplane LSH signature of a quantized vector"),
      (es: Seq[Expression]) => LongArrayRhpSig(es(0),
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("string_array_fingerprint"),
      info("string_array_fingerprint",
        "_FUNC_(tokens) - engine-neutral rolling polynomial document fingerprint"),
      (es: Seq[Expression]) => StringArrayFingerprint(es(0))))
    ext.injectFunction((
      FunctionIdentifier("string_array_simhash"),
      info("string_array_simhash",
        "_FUNC_(tokens) - engine-neutral squared-LCG 64-bit simhash signature"),
      (es: Seq[Expression]) => StringArraySimHash(es(0))))
  }
}
