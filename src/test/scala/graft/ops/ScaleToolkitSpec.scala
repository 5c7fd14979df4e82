package graft.ops

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB mechanisms, demonstrated on real plans at test scale:
  * salting preserves join semantics while spreading hot keys; bucketed
  * tables join with NO shuffle exchange; partitioned writes prune at the
  * source. These specs assert on the PHYSICAL PLAN (explain text), not
  * just results — the plan shape is the scale contract.
  */
class ScaleToolkitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // vals, not defs: a join condition built from a second instance of the
  // same `def` references foreign attribute ids → analysis error
  private lazy val li = spark.read.parquet(s"${TestSpark.Sf001}/lineitem.parquet")
  private lazy val part = spark.read.parquet(s"${TestSpark.Sf001}/part.parquet")

  test("q8 plan: aggregate below broadcast join, top-k never global-sorts") {
    // the scale contract of the agg-pushdown rewrite: the fact side
    // reduces to one row per join key BEFORE the broadcast join (the
    // partial+final HashAggregate pair sits under the join), and the
    // final top-10 is TakeOrderedAndProject — per-partition k-heaps,
    // no global sort at any corpus size
    val df = graft.queries.RefQueries.q8TopK(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // aggregate BELOW the join: the HashAggregate must appear after
    // (deeper than) the join node in the tree rendering
    val joinAt = plan.indexOf("BroadcastHashJoin")
    val aggAt = plan.indexOf("HashAggregate")
    assert(aggAt > joinAt,
      s"expected HashAggregate under the join (agg-below-join), got:\n$plan")
    assert(!plan.contains("Sort "), "top-k must not plan a global Sort")
  }

  test("gate sorts: q5 range-partitions the narrow fact slice below the join") {
    // the round-12 single-exchange contract: q5's ONLY shuffle is the
    // rangepartitioning exchange of the 4-column fact slice BELOW the
    // broadcast join, and the top-level Sort is LOCAL (global=false) —
    // no wide post-join exchange, no second sort
    val q5 = graft.queries.RefQueries.q5Join(spark, TestSpark.Sf001)
    val plan = q5.queryExecution.executedPlan.toString
    val rangeAt = plan.indexOf("rangepartitioning")
    val joinAt = plan.indexOf("BroadcastHashJoin")
    assert(rangeAt >= 0 && joinAt >= 0, plan)
    assert(rangeAt > joinAt, // deeper in the tree = later in the rendering
      s"expected the range exchange BELOW the broadcast join:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"q5 must not add a wide post-join exchange:\n$plan")
    assert(plan.contains("Sort ") && !plan.contains(", true, "),
      s"expected a LOCAL top-level sort (global=false):\n$plan")
    // tinyGateSort: ONE stage — no exchange of any kind, single task
    val je = graft.queries.EtlQueries.etlJsonExtract(spark, TestSpark.Sf001)
    val jePlan = je.queryExecution.executedPlan.toString
    assert(!jePlan.contains("rangepartitioning"), jePlan)
    assert(!jePlan.contains("Exchange"), jePlan)
    assert(jePlan.contains("Coalesce 1"), jePlan)
  }

  test("salted join ≡ plain join (row multiset), hot key spread over salts") {
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_name")
    val salted = SkewJoin.saltedInnerJoin(li, part, "l_partkey", "p_partkey", salts = 8)
      .select("l_orderkey", "l_linenumber", "p_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("key histogram finds the heavy keys") {
    val h = SkewJoin.keyHistogram(li, "l_partkey", 5).collect()
    assert(h.length == 5 && h.head.getLong(1) >= h.last.getLong(1))
  }

  test("bucketed tables sort-merge join with no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet(s"${TestSpark.Sf001}/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    // force SMJ path so the exchange question is meaningful
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed co-located join must not shuffle:\n$plan")
    assert(joined.count() == li.count())
  }

  test("partitionBy write → partition pruning on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = graft.streaming.EventAnalytics.withEventTime(
        spark.read.parquet(s"${TestSpark.Sf001}/events.parquet"))
      .withColumn("event_date", to_date(col("ts_utc")))
    ev.write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .where(col("event_date") === lit("2024-01-02"))
    val scan = pruned.queryExecution.executedPlan.toString
    // a pruned scan reads 1 of ~30 date partitions
    assert(scan.contains("PartitionFilters"), scan)
    val nAll = spark.read.parquet(dir).count()
    val nDay = pruned.count()
    assert(nDay > 0 && nDay < nAll / 10)
  }

  test("BPE encode plan: segmentation and vocab join broadcast, no sort-merge") {
    // the encode contract at 100 TB: the corpus side streams through
    // two BroadcastHashJoins (types + vocab are vocab-bounded); a
    // sort-merge join would shuffle the full exploded token stream
    val df = graft.queries.BpeQueries.textBpeEncode(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side token stream must never sort-merge:\n$plan")
  }

  test("incremental dedup plan: index probe is a hash join, never nested-loop") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
    val prior = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val inc = MinHashDedup.incrementalNearDupPairs(
      batch, MinHashDedup.bandIndex(prior), prior, threshold = 0.7)
    val plan = inc.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"(band, bucket) probes must stay equi-joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("entropy plan: two-level aggregation with map-side combine, no join") {
    val df = graft.queries.TextQueries.textEntropy(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"entropy needs no join:\n$plan")
    // partial+final pairs for both the (doc, token) count and the
    // per-doc rollup: at least 4 HashAggregate nodes
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan)
  }

  test("collocation plan: count-table joins broadcast, top-k never global-sorts") {
    // the PMI join sides are vocabulary-bounded — the bigram stream
    // must flow through BroadcastHashJoins, and the top-100 must be
    // TakeOrderedAndProject, not a full Sort
    val df = graft.queries.TextQueries.textCollocations(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"bigram stream must never sort-merge against the unigram table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("substring-search plan: posting probe is an equi join, never a scan product") {
    val df = graft.queries.TextQueries.textSubstringSearch(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("NestedLoop"),
      s"trigram posting lists must hash-join, never nested-loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("feature-hashing plan: no join, codegen'd kernel, map-side combine") {
    val df = graft.queries.TextQueries.textFeatureHashing(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the hashing trick needs no vocab join:\n$plan")
    assert(plan.contains("string_array_token_hashes"),
      s"must use the codegen kernel, not an interpreted fold:\n$plan")
  }

  test("silhouette plan: centroid join broadcasts, never a vector pair product") {
    val df = graft.queries.SimilarityQueries.simSilhouette(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"the k·d centroid table must broadcast:\n$plan")
  }

  test("attribution plan: type filters reach the scan, match is a hash join") {
    val df = graft.queries.BehaviorQueries
      .analyticsAttribution(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,purchase)"),
      s"the purchase filter must reach the parquet scan:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"the touch match must be an equi-join on user_id, not a loop:\n$plan")
  }

  test("ratio-to-parent plan: fact aggregates once, every dim broadcasts") {
    val df = graft.queries.OlapQueries
      .olapRatioToParent(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    // customer map + nation + region all ride broadcasts; the only
    // shuffles are the fact aggregate and the dimension-sized windows
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"no dimension join may shuffle the fact side:\n$plan")
  }

  test("weighted median plan: no global sort, windows partition by group") {
    val df = graft.queries.StatQueries
      .analyticsWeightedMedian(spark, TestSpark.Sf001)
    val plan = df.queryExecution.executedPlan.toString
    // the cumulative window sorts WITHIN group partitions; the only
    // range partitioning allowed is the final 3-row gate ORDER BY
    val windowAt = plan.indexOf("Window")
    val rangeAt = plan.indexOf("rangepartitioning")
    assert(windowAt >= 0, plan)
    assert(rangeAt < 0 || rangeAt < windowAt,
      s"the group window must not sit on a global range sort:\n$plan")
  }

  test("IVFADC plan: cell join hashes on the probe key, ADC is codegen") {
    val emb = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
    val df = graft.ops.Similarity.ivfPqTopKCosine(
      emb.where(col("vec_id") < 10), emb, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"probing must join on the cell key, never cross the corpus:\n$plan")
    assert(plan.contains("pq_adc"),
      s"ADC must run the native kernel, not an interpreted fold:\n$plan")
  }
}
