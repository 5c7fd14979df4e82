package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

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

  /** The SQL-safe kernels as (name, usage, builder) — the SINGLE list
    * both registration paths consume (`registerAll` temp functions and
    * the `GraftExtensions` injectFunction route), so the two can never
    * drift apart. The constant-carrying expressions (minhash
    * permutations, IVF centroid matrix) are Column-API only — their
    * constants are driver-computed model artifacts, not SQL literals.
    */
  val sqlKernels: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("long_array_dot",
      "_FUNC_(a, b) - exact dot product of two array<long> vectors",
      es => LongArrayDot(es(0), es(1))),
    ("long_array_and_popcount",
      "_FUNC_(a, b) - popcount of the AND of two packed bitmaps",
      es => LongArrayAndPopcount(es(0), es(1))),
    ("long_array_rhp_sig",
      "_FUNC_(v, bits) - random-hyperplane LSH signature of a quantized vector",
      es => LongArrayRhpSig(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("string_array_fingerprint",
      "_FUNC_(tokens) - engine-neutral rolling polynomial document fingerprint",
      es => StringArrayFingerprint(es(0))),
    ("string_array_simhash",
      "_FUNC_(tokens) - engine-neutral squared-LCG 64-bit simhash signature",
      es => StringArraySimHash(es(0))),
    ("string_array_token_hashes",
      "_FUNC_(tokens) - per-token polynomial hashes of a string array",
      es => StringArrayTokenHashes(es(0))),
    ("long_array_rolling_hash",
      "_FUNC_(hashes, w) - all w-window rolling polynomial hashes",
      es => LongArrayRollingHash(es(0),
        es(1).eval().asInstanceOf[Number].intValue(), 131L, 1000000007L)),
    ("jaro_winkler",
      "_FUNC_(a, b) - Jaro-Winkler string similarity (DuckDB-bit-compatible)",
      es => JaroWinkler(es(0), es(1))))

  /** Register every SQL-safe kernel as a session temp function. */
  def registerAll(spark: SparkSession): Unit =
    sqlKernels.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
