package graft

import org.apache.spark.sql.SparkSession

/** Native codegen expressions extending Spark for the graft engine —
  * each exists because the built-in spelling runs interpreted
  * (higher-order array lambdas have no codegen) on a hot path:
  *
  *   - [[functions.LongArrayDot]]        quantized dot product
  *   - [[functions.LongArrayAndPopcount]] packed-bitmap |A∩B|
  *   - [[functions.LongArrayBestCell]]   IVF argmax-cosine assignment
  *   - [[functions.LongArrayMinHash]]    k-permutation minhash signature
  *   - [[functions.LongArrayRhpSig]]     random-hyperplane LSH signature
  */
package object functions {

  /** Register the parameter-free expressions as SQL functions so
    * `spark.sql` text can call them (`long_array_dot(a, b)`,
    * `long_array_and_popcount(a, b)`, `long_array_rhp_sig(v, bits)`).
    * The constant-carrying expressions (minhash permutations, IVF
    * centroid matrix) are Column-API only — their constants are
    * driver-computed model artifacts, not SQL literals.
    */
  def registerAll(spark: SparkSession): Unit = {
    LongArrayDot.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_and_popcount",
      exprs => LongArrayAndPopcount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_rhp_sig",
      exprs => LongArrayRhpSig(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "string_array_fingerprint",
      exprs => StringArrayFingerprint(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "string_array_simhash",
      exprs => StringArraySimHash(exprs(0)), "scala_udf")
  }
}
