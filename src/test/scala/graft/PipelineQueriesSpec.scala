package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{BehaviorQueries, GraphQueries, PipelineQueries}

/** Structural contracts for the pipeline-layout, streak, and degree
  * operators (the oracle gate owns value-level correctness).
  */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sharding partitions the corpus: every doc in exactly one shard") {
    val rows = PipelineQueries.etlShard(spark, TestSpark.Sf001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = spark.read
      .parquet(s"${TestSpark.Sf001}/documents.parquet").count()
    assert(total == corpus)
    assert(rows.forall(_.getAs[Long]("n_docs") > 0), "empty shard")
    // content hashing should spread: no shard above 3x the fair share
    val fair = corpus.toDouble / rows.length
    assert(rows.forall(_.getAs[Long]("n_docs") < 3 * fair),
      "shard skew beyond 3x fair share")
  }

  test("quality bins are quartiles: each holds 15-35% of the corpus") {
    val rows = PipelineQueries.corpusQualityBins(spark, TestSpark.Sf001).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    rows.foreach { r =>
      val share = r.getAs[Long]("n_docs") / total
      assert(share > 0.15 && share < 0.35,
        s"bin ${r.get(0)}: share $share not quartile-like")
    }
  }

  test("streaks: longest run bounded by active days, runs partition them") {
    BehaviorQueries.analyticsStreaks(spark, TestSpark.Sf001).collect().foreach { r =>
      val active = r.getAs[Long]("n_active_days")
      assert(r.getAs[Long]("longest_streak") <= active)
      assert(r.getAs[Long]("n_streaks") >= 1 &&
        r.getAs[Long]("n_streaks") <= active)
    }
  }

  test("centroid classifier: one prediction per vector, non-negative distance") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.simCentroidClassify(spark, TestSpark.Sf001).collect()
    val vectors = spark.read
      .parquet(s"${TestSpark.Sf001}/embeddings.parquet").count()
    assert(rows.length == vectors, "not exactly one prediction per vector")
    assert(rows.forall(_.getAs[Long]("dist2") >= 0))
    // a Rocchio classifier must beat uniform-random guessing on its own
    // training set (10 labels -> 10% chance); being generous 2x below
    // chance would mean the distance ranking is broken outright
    val acc = rows.map(_.getAs[Long]("correct")).sum.toDouble / rows.length
    assert(acc > 0.05, s"accuracy $acc below half of random chance")
  }

  test("active users: WAU bounds DAU and never exceeds the user base") {
    import graft.queries.BehaviorQueries
    val rows = BehaviorQueries.analyticsActiveUsers(spark, TestSpark.Sf001).collect()
    val users = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"),
        s"day ${r.get(0)}: 7-day window smaller than its own day")
      assert(r.getAs[Long]("wau") <= users)
    }
  }

  test("plan contracts: broadcast model/spine, decorrelated subquery") {
    import graft.queries.{JoinQueries, SimilarityQueries}
    // centroid model must broadcast — the corpus side stays a narrow map
    val centroid = SimilarityQueries.simCentroidClassify(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(centroid.contains("BroadcastHashJoin"),
      "centroid model not broadcast — corpus would shuffle against it")
    // WAU range join must broadcast the (tiny) day spine, not the data
    val wau = BehaviorQueries.analyticsActiveUsers(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(wau.contains("BroadcastNestedLoopJoin"),
      "day-spine range join lost its broadcast")
    // the correlated scalar subquery must decorrelate to aggregate+join —
    // a surviving per-row subquery would re-execute per outer row
    val corr = JoinQueries.q14Correlated(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString
    assert(corr.contains("HashAggregate") &&
      (corr.contains("BroadcastHashJoin") || corr.contains("SortMergeJoin")),
      "correlated subquery did not decorrelate to aggregate + join")
  }

  test("audio frame energies are non-negative and framing drops the tail") {
    import graft.queries.StreamQueries
    val rows = StreamQueries.multimodalAudioEnergy(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("energy") >= 0))
    // 8-sample frames over a <=45-sample plane: at most 5 frames per doc
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).values.map(_.length)
    assert(perDoc.max <= 5)
  }

  test("degree distribution accounts for every customer, including degree 0") {
    val rows = GraphQueries.graphDegree(spark, TestSpark.Sf001).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val customers = spark.read
      .parquet(s"${TestSpark.Sf001}/customer.parquet").count()
    assert(total == customers,
      "degree histogram dropped customers (zero-degree left join broken?)")
  }
}
