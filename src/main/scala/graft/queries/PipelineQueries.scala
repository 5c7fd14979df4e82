package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.TextOps

/** Training-data pipeline layout operators: deterministic shard
  * assignment for training-file writes and quality-quantile binning for
  * curriculum construction. Both are the "last mile" of a corpus
  * pipeline — after cleaning/dedup, the data has to land in evenly-sized
  * shards and quality tiers, and both assignments must be reproducible
  * run-over-run (content-derived, never partition- or time-derived).
  *
  * Determinism: shard ids come from the repo's engine-neutral polynomial
  * fingerprint (content hash mod a prime, then mod the shard count —
  * NEVER Spark's partition id, which depends on the cluster layout);
  * bin thresholds are exact interpolated quantiles over integer token
  * counts (every interpolation operand exact in double).
  *
  * Scale: shard assignment is a narrow map + one aggregate keyed by
  * shard (constant key space); binning is two passes (tiny quantile
  * aggregate broadcast back, then one map + aggregate). Nothing here
  * depends on corpus size except the map work itself.
  */
object PipelineQueries {
  import RefQueries.table

  private val NShards = 8

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  /** DuckDB twin of TextOps.fingerprint over a one-string list. */
  private def duckFingerprint(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform([$expr], t ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
       |      (a, c) -> (a * 131 + c) % 1000000007))),
       |  (acc, h) -> (acc * 31 + h) % 1000000007)""".stripMargin

  /** `etl_shard` — content-hash shard assignment + per-shard manifest
    * (doc count, token mass, id range): what a training job reads to
    * plan its input files. The fingerprint is non-negative, so
    * `% NShards` is floor==trunc safe in both engines.
    */
  def etlShard(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("shard",
        pmod(graft.functions.StringArrayFingerprint.fingerprint(array(col("text"))),
          lit(NShards)))
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
      .orderBy("shard")

  val etlShardSql: String =
    s"""WITH s AS MATERIALIZED (
       |  SELECT doc_id,
       |         ${duckFingerprint("text")} % $NShards AS shard,
       |         len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')) AS n_tokens
       |  FROM documents
       |)
       |SELECT shard, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  /** `corpus_quality_bins` — curriculum binning: documents split into
    * four token-count quartile bins (Q1 = shortest), with per-bin doc
    * counts, token mass, and exact mean length. Thresholds are the
    * exact interpolated quartiles of the integer token counts;
    * boundary rule is bin k ⇔ count ≤ q_k (first match), identical in
    * both engines because thresholds and comparisons are the same
    * exact doubles.
    */
  def corpusQualityBins(spark: SparkSession, sfDir: String): DataFrame = {
    val sized = docs(spark, sfDir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val qs = sized.agg(
      percentile(col("n_tokens"), lit(0.25)).as("q1"),
      percentile(col("n_tokens"), lit(0.5)).as("q2"),
      percentile(col("n_tokens"), lit(0.75)).as("q3"))
    sized.crossJoin(broadcast(qs))
      .withColumn("bin",
        when(col("n_tokens").cast(DoubleType) <= col("q1"), 1L)
          .when(col("n_tokens").cast(DoubleType) <= col("q2"), 2L)
          .when(col("n_tokens").cast(DoubleType) <= col("q3"), 3L)
          .otherwise(4L))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (sum("n_tokens").cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_tokens"))
      .orderBy("bin")
  }

  val corpusQualityBinsSql: String =
    """WITH sized AS MATERIALIZED (
      |  SELECT doc_id,
      |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), q AS MATERIALIZED (
      |  SELECT quantile_cont(n_tokens, 0.25) AS q1,
      |         quantile_cont(n_tokens, 0.5) AS q2,
      |         quantile_cont(n_tokens, 0.75) AS q3
      |  FROM sized
      |), binned AS (
      |  SELECT n_tokens,
      |         CASE WHEN CAST(n_tokens AS DOUBLE) <= q.q1 THEN 1
      |              WHEN CAST(n_tokens AS DOUBLE) <= q.q2 THEN 2
      |              WHEN CAST(n_tokens AS DOUBLE) <= q.q3 THEN 3
      |              ELSE 4 END AS bin
      |  FROM sized CROSS JOIN q
      |)
      |SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tokens
      |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  /** `corpus_token_budget` — data selection under a token budget: per
    * source, take documents BEST-QUALITY-FIRST (integer unigram
    * entropy desc via the IntegerLog2 kernel, doc_id tie-break) until
    * the source's token budget fills — the standard pretraining
    * data-selection step ("we can afford N tokens from this domain;
    * take the best"). The 500-token gate budget BINDS at both gated
    * scales (sources carry ~1.4k tokens at sf0.01), so the
    * order-by-quality window and the prefix rule are genuinely
    * exercised, not vacuously selecting everything. A doc is selected iff the tokens accumulated
    * BEFORE it are under budget, so the budget may overshoot by at
    * most one document — the greedy prefix rule both engines state
    * identically as a window inequality.
    *
    * Scale: the entropy score is the text_entropy aggregate shape; the
    * selection is ONE per-source window over (quality desc, doc_id) —
    * no sort of the corpus beyond the source-keyed shuffle, no
    * iteration.
    */
  def corpusTokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.IntegerLog2
    val Budget = 500L
    val perDoc = docs(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * IntegerLog2.log2s(col("c"))).as("clg"))
      .withColumn("ent_num",
        col("n_tokens") * IntegerLog2.log2s(col("n_tokens")) - col("clg"))
      .select(col("doc_id"), col("n_tokens"),
        expr("ent_num DIV n_tokens").as("ent_1e6"))
    val w = Window.partitionBy("source")
      .orderBy(desc("ent_1e6"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .join(docs(spark, sfDir).select(col("doc_id"), col("source")), "doc_id")
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("cum_before") < Budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).as("tok_selected"),
        min(col("ent_1e6")).as("min_ent_1e6"))
      .orderBy("source")
  }

  val corpusTokenBudgetSql: String = {
    import graft.functions.IntegerLog2.log2Sql
    s"""WITH tc AS (
       |  SELECT doc_id, t, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(list_filter(
       |          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
       |        FROM documents)
       |  GROUP BY doc_id, t
       |), perdoc AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         CAST(SUM(c * ${log2Sql("c")}) AS BIGINT) AS clg
       |  FROM tc GROUP BY doc_id
       |), scored AS (
       |  SELECT p.doc_id, d.source, p.n_tokens,
       |         CAST((p.n_tokens * ${log2Sql("p.n_tokens")} - p.clg)
       |              // p.n_tokens AS BIGINT) AS ent_1e6
       |  FROM perdoc p JOIN documents d USING (doc_id)
       |), placed AS (
       |  SELECT source, n_tokens, ent_1e6,
       |         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |                ORDER BY ent_1e6 DESC, doc_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |              AS BIGINT) AS cum_before
       |  FROM scored
       |)
       |SELECT source, COUNT(*) AS n_selected,
       |       CAST(SUM(n_tokens) AS BIGINT) AS tok_selected,
       |       CAST(MIN(ent_1e6) AS BIGINT) AS min_ent_1e6
       |FROM placed WHERE cum_before < 500
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** `corpus_weighted_sample` — weight-proportional Bernoulli thinning,
    * the doc-granular sibling of `corpus_mix_temperature`'s source-level
    * allocation: keep each document with probability equal to its
    * quality weight (here length-derived, capped at 2000 chars — long
    * docs keep, short docs thin out proportionally).
    *
    * The coin is a DETERMINISTIC multiplicative hash of the doc id
    * (Knuth's 2654435761 mod the prime 1000003 — pure BIGINT
    * arithmetic, identical in every engine), NOT `rand(seed)`: rand's
    * stream is keyed to the partition index, so a repartition or a
    * stage retry after shuffle-fetch failure resamples DIFFERENT rows —
    * the same nondeterminism class as the salted-join
    * monotonically_increasing_id hazard. A hash coin keeps the sample
    * referentially transparent: same row ⇒ same verdict, under any
    * partitioning, on any engine, forever — which is what makes
    * training-data mixes reproducible. At 100 TB this is a pure narrow
    * map (zero shuffle, zero state); the gate sort exists only for the
    * hash compare.
    */
  def corpusWeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (least(col("n_chars"), lit(2000L)).cast(DoubleType) / lit(2000.0))
          .as("weight"),
        (((col("doc_id") * lit(2654435761L)) % lit(1000003L))
          .cast(DoubleType) / lit(1000003.0)).as("u"))
      .where(col("u") < col("weight"))
      .transform(RefQueries.gateSort(_, "doc_id"))

  val corpusWeightedSampleSql: String =
    """WITH coin AS (
      |  SELECT doc_id, source, n_chars,
      |         CAST(least(n_chars, 2000) AS DOUBLE) / 2000.0 AS weight,
      |         CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 AS u
      |  FROM documents
      |)
      |SELECT doc_id, source, n_chars, weight, u
      |FROM coin WHERE u < weight
      |ORDER BY doc_id""".stripMargin

  /** `corpus_cap_per_source` — per-source document cap, the
    * "cap documents per domain" curation step (C4/Dolma-style): no
    * single source may contribute more than `Cap` documents, and the
    * survivors are the best of that source — ranked here by length
    * descending (the cheap quality proxy; a production pipeline ranks
    * by the composed quality score) with doc_id as the deterministic
    * tie-break. Balances the mixture against crawl-frequency bias,
    * which the quality filters alone cannot do.
    *
    * Scale: one shuffle on source + a per-partition top-Cap window —
    * rank truncation keeps state O(Cap) per source under AQE; at real
    * scale a hot source is exactly the case the cap exists for.
    */
  def corpusCapPerSource(spark: SparkSession, sfDir: String): DataFrame = {
    val Cap = 10
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
    docs(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= Cap)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))
      .orderBy("source", "rk")
  }

  val corpusCapPerSourceSql: String =
    """SELECT source, CAST(row_number() OVER w AS BIGINT) AS rk,
      |       doc_id, n_chars
      |FROM documents
      |WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id)
      |QUALIFY row_number() OVER w <= 10
      |ORDER BY source, rk""".stripMargin

  /** Shared split rule: doc → {train, val, test} by a Knuth
    * multiplicative hash of doc_id into permille buckets (900/50/50).
    * Hash-based, not row-number-based, so membership is STABLE under
    * corpus growth — a doc keeps its split when new docs arrive, the
    * property that makes eval sets comparable across snapshots (a
    * modulo-on-rank split reshuffles everything on every ingest).
    * Engine-neutral positive-integer arithmetic — no md5 parsing, no
    * engine hash to align.
    */
  private val SplitExpr =
    "CASE WHEN (doc_id * 2654435761) % 2147483647 % 1000 < 900 THEN 'train' " +
      "WHEN (doc_id * 2654435761) % 2147483647 % 1000 < 950 THEN 'val' " +
      "ELSE 'test' END"

  private val SplitExprSpark =
    "CASE WHEN (doc_id * 2654435761L) % 2147483647L % 1000L < 900 THEN 'train' " +
      "WHEN (doc_id * 2654435761L) % 2147483647L % 1000L < 950 THEN 'val' " +
      "ELSE 'test' END"

  /** `corpus_split` — the train/val/test split report, stratified view:
    * per (source, split), document and character counts plus each
    * split's permille share of its source — the sanity table a
    * pipeline owner reads to confirm no source is accidentally
    * concentrated in eval. The split rule itself is [[SplitExpr]]'s
    * stable hash; the report is two dimension-sized aggregates.
    */
  def corpusSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val d = table(spark, sfDir, "documents")
      .withColumn("split", expr(SplitExprSpark))
    val bySrc = d.groupBy("source").agg(count(lit(1)).as("src_docs"))
    d.groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .join(broadcast(bySrc), "source")
      .select(col("source"), col("split"), col("n_docs"), col("n_chars"),
        expr("n_docs * 1000L div src_docs").as("share_pml"))
      .orderBy("source", "split")
  }

  val corpusSplitSql: String =
    s"""WITH d AS MATERIALIZED (
       |  SELECT source, n_chars, $SplitExpr AS split FROM documents
       |), s AS MATERIALIZED (
       |  SELECT source, COUNT(*) AS src_docs FROM d GROUP BY source
       |)
       |SELECT d.source, d.split, COUNT(*) AS n_docs,
       |       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       |       CAST(COUNT(*) * 1000 // MAX(s.src_docs) AS BIGINT) AS share_pml
       |FROM d JOIN s ON s.source = d.source
       |GROUP BY d.source, d.split
       |ORDER BY d.source, d.split""".stripMargin

  /** `corpus_split_leakage` — the eval-contamination audit: MinHash
    * near-duplicate pairs (J ≥ 0.7, the `dedup_minhash_lsh` contract)
    * whose two documents land in DIFFERENT splits under [[SplitExpr]].
    * A train↔test near-dup is a leaked eval answer; this is the check
    * that says "dedup BEFORE you split" with a number attached, next
    * to `text_contamination`'s n-gram-vs-eval-set variant. Output: one
    * row per unordered split pair with the crossing count, plus the
    * within-split rows for context.
    */
  def corpusSplitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = table(spark, sfDir, "documents")
    val split = docs.select(col("doc_id"), expr(SplitExprSpark).as("split"))
    graft.ops.MinHashDedup.nearDupPairs(docs, n = 2, threshold = 0.7)
      .join(split.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(split.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("split_a"),
        greatest(col("s1"), col("s2")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", (col("split_a") =!= col("split_b")).cast("long"))
      .orderBy("split_a", "split_b")
  }

  val corpusSplitLeakageSql: String =
    s"""WITH pr AS MATERIALIZED (
       |  SELECT d1, d2
       |  FROM (${graft.queries.TextQueries.dedupNgramJaccardSqlAt(0.7)}) q
       |), sp AS MATERIALIZED (
       |  SELECT doc_id, $SplitExpr AS split FROM documents
       |)
       |SELECT least(a.split, b.split) AS split_a,
       |       greatest(a.split, b.split) AS split_b,
       |       COUNT(*) AS n_pairs,
       |       CAST(CASE WHEN least(a.split, b.split)
       |                      <> greatest(a.split, b.split)
       |                 THEN 1 ELSE 0 END AS BIGINT) AS leaky
       |FROM pr
       |JOIN sp a ON a.doc_id = pr.d1
       |JOIN sp b ON b.doc_id = pr.d2
       |GROUP BY 1, 2
       |ORDER BY split_a, split_b""".stripMargin
}
