package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the big (skewed) side, replicate the small
  * side across salts, join on (key, salt). Semantically identical to the
  * plain inner equi-join; the hot key's rows spread over `salts`
  * partitions instead of one straggler task.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting remains the tool when the skewed side feeds an aggregation or
  * when AQE can't split (e.g. a single monster key inside one map
  * output). `salts` trades shuffle volume of the replicated side
  * (×salts) against parallelism on the hot keys.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed on `bigKey`) with `small`,
    * spreading each big-side key over `salts` buckets. `small` is
    * replicated `salts`× via an exploded literal range — fine because the
    * replicated side is the small one.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    // spread via a per-row ordinal, NOT a row-content hash: hashing the
    // row's columns (a) fails analysis on MapType columns (xxhash64
    // rejects maps) and (b) degenerates to ZERO spread when the hot
    // key's rows are duplicates — replayed/denormalized records, the
    // classic skew shape — because identical rows hash to one salt.
    // monotonically_increasing_id is unique per row, so duplicates
    // round-robin across salts; the salt never appears in the output,
    // so join results are unaffected by its values.
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Top-k frequent keys of a column — the usual prelude to deciding
    * whether salting / AQE skew thresholds are needed.
    */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(key))
      .limit(k)
}
