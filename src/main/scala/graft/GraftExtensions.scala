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

  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.sqlKernels.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        (es: Seq[Expression]) => builder(es)))
    }
}
