package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew machinery on a planted monster key: 2/3 of the big side carries
  * ONE key. Asserts the three claims the scaladocs make:
  *
  *   1. two-phase salting detects exactly the hot key and stays
  *      result-identical to the plain join;
  *   2. under a shuffled (SMJ) join the monster key occupies ONE reduce
  *      partition unsalted but spreads across the salt count salted —
  *      the straggler-task mechanism, asserted on spark_partition_id;
  *   3. AQE's skew-join handling DOES split that partition for a plain
  *      sort-merge join (plan shows `skew=true`) — so explicit salting
  *      is for the cases AQE does not cover: broadcast-ineligible
  *      first-stage shapes feeding a co-partitioned aggregation, and
  *      engines/stages where AQE is off. The gated q5_salted_join runs
  *      the two-phase operator on a near-uniform corpus precisely to
  *      show it correctly does nothing there.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private val Monster = 7L

  // 40k rows of key 7 + 20k rows spread over keys 0..999
  private def big: DataFrame =
    spark.range(0, 60000).select(
      when(col("id") < 40000, lit(Monster))
        .otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("payload"))

  private def small: DataFrame =
    spark.range(0, 1000).select(
      col("id").as("sk"), concat(lit("d"), col("id")).as("name"))

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hotKeys finds exactly the planted monster key") {
    assert(SkewJoin.hotKeys(big, "k", skewFactor = 4.0) == Seq(Monster))
    // near-uniform corpus → no hot keys → two-phase degenerates to plain
    val li = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
    assert(SkewJoin.hotKeys(li, "l_partkey", skewFactor = 4.0).isEmpty)
  }

  test("hotKeysApprox: monster key survives the narrow pass; approx two-phase ≡ plain") {
    // Misra-Gries one-sided guarantee: any key with frequency > support·N
    // must be in the result — the monster (2/3 of rows) at support 0.01.
    assert(SkewJoin.hotKeysApprox(big, "k", support = 0.01).contains(Monster))
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
    val two = SkewJoin.twoPhaseSaltedInnerJoin(big, small, "k", "sk", salts = 8,
      hotSupport = Some(0.01)).select("k", "payload", "name")
    assert(two.count() == plain.count())
    assert(two.exceptAll(plain).isEmpty && plain.exceptAll(two).isEmpty)
  }

  test("two-phase salted join ≡ plain join on the monster-key corpus") {
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
    val two = SkewJoin.twoPhaseSaltedInnerJoin(big, small, "k", "sk", salts = 8)
      .select("k", "payload", "name")
    assert(two.count() == plain.count())
    assert(two.exceptAll(plain).isEmpty && plain.exceptAll(two).isEmpty)
  }

  test("NULL-heavy skew: null monster key never poisons the hot/cold split") {
    // half the big side carries a NULL key — the classic dirty-data skew
    // shape. The histogram must ignore NULLs (a null literal in an isin
    // list makes x IN (...) and NOT IN (...) both NULL for every
    // non-matching x, silently emptying BOTH branches), key 7 is still
    // detected hot among the non-null keys, and the two-phase result
    // stays identical to the plain inner join (which drops null keys).
    val dirty = spark.range(0, 60000).select(
      when(col("id") < 30000, lit(null).cast("long"))
        .when(col("id") < 50000, lit(Monster))
        .otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("payload"))
    assert(SkewJoin.hotKeys(dirty, "k", skewFactor = 4.0) == Seq(Monster))
    val plain = dirty.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
    val two = SkewJoin.twoPhaseSaltedInnerJoin(dirty, small, "k", "sk", salts = 8)
      .select("k", "payload", "name")
    assert(two.count() == plain.count() && plain.count() > 0)
    assert(two.exceptAll(plain).isEmpty && plain.exceptAll(two).isEmpty)
    // empty big side: no hot keys, no NPE, empty join
    val empty = dirty.where(lit(false))
    assert(SkewJoin.hotKeys(empty, "k").isEmpty)
    assert(SkewJoin.twoPhaseSaltedInnerJoin(empty, small, "k", "sk").count() == 0)
  }

  test("monster key: 1 reduce partition unsalted, ≥ salts/2 salted (SMJ, AQE off)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      def pidSpread(df: DataFrame): Long =
        df.where(col("k") === Monster)
          .select(spark_partition_id().as("pid"))
          .agg(countDistinct(col("pid"))).head.getLong(0)
      val plain = big.join(small, col("k") === col("sk"))
      assert(pidSpread(plain) == 1L,
        "unsalted shuffle must funnel the hot key into one partition")
      val salted = SkewJoin.saltedInnerJoin(big, small, "k", "sk", salts = 8)
      assert(pidSpread(salted) >= 4L,
        "salting must spread the hot key across salt buckets")
    }
  }

  test("deterministic saltBy: result-identical, spreads the hot key, stable") {
    // saltBy over a stable unique column (payload) must (1) keep the
    // join result identical to plain, (2) still spread the monster
    // key's rows across salts even though they share one KEY value —
    // the unique column differs per row — and (3) be deterministic:
    // xxhash64 of the same column values yields the same salt on any
    // recompute, closing the ordinal fallback's retry hazard.
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
    val det = SkewJoin.saltedInnerJoin(big, small, "k", "sk", salts = 8,
      saltBy = Seq(col("payload")))
      .select("k", "payload", "name")
    assert(det.exceptAll(plain).isEmpty && plain.exceptAll(det).isEmpty)
    val twoDet = SkewJoin.twoPhaseSaltedInnerJoin(big, small, "k", "sk",
      salts = 8, saltBy = Seq(col("payload")))
      .select("k", "payload", "name")
    assert(twoDet.exceptAll(plain).isEmpty && plain.exceptAll(twoDet).isEmpty)
    // spread: the hot key's distinct salt values cover most buckets
    val spread = big.select(col("k"),
        pmod(xxhash64(col("payload")), lit(8L)).as("s"))
      .where(col("k") === Monster)
      .agg(countDistinct(col("s"))).head.getLong(0)
    assert(spread >= 6L, s"expected hash salt to spread the hot key, got $spread")
  }

  test("no-saltBy fallback: content hash, retry-deterministic, map-safe") {
    // the fallback salt is a pure function of row CONTENT — the same
    // row salts identically on any recompute or input partitioning, so
    // a partial map-stage retry can never duplicate/drop a join row
    // (the monotonically_increasing_id ordinal it replaced could).
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
    val a = SkewJoin.saltedInnerJoin(big, small, "k", "sk", salts = 8)
      .select("k", "payload", "name")
    assert(a.exceptAll(plain).isEmpty && plain.exceptAll(a).isEmpty)
    // partitioning-invariance: a different input layout yields the
    // exact same multiset (the retry-safety observable)
    val b = SkewJoin.saltedInnerJoin(big.repartition(7), small, "k", "sk",
      salts = 8).select("k", "payload", "name")
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
    // and no ordinal survives anywhere in any salted join plan
    val plan = a.queryExecution.analyzed.toString
    assert(!plan.contains("monotonically_increasing_id"),
      s"ordinal salt must be gone:\n$plan")
    // MapType columns are excluded from the content hash, not a
    // hash-all analysis failure
    val withMap = big.withColumn("m", map(col("payload"), col("payload")))
    val jm = SkewJoin.saltedInnerJoin(withMap, small, "k", "sk", salts = 8)
    assert(jm.count() == plain.count())
    // full duplicates collapse onto one salt — the documented spread
    // trade for determinism; counts stay exact
    val dups = spark.range(0, 1000)
      .select(lit(Monster).as("k"), lit(42L).as("payload"))
    assert(SkewJoin.saltedInnerJoin(dups, small, "k", "sk", salts = 8)
      .count() == 1000L)
  }

  test("AQE splits the skewed SMJ partition (skew=true in the adaptive plan)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      val joined = big.join(small, col("k") === col("sk"))
      // collect() executes THIS QueryExecution (a write would plan its
      // own), so the adaptive plan is final when we stringify it
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE OptimizeSkewedJoin to mark the SMJ skewed:\n$plan")
    }
  }
}
