package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{MinHashDedup, SimHashDedup, Similarity}

/** Oracle-gated queries for similarity search and sketch-based dedup over
  * the `embeddings` / `documents` tables.
  *
  * - `sim_topk_bruteforce` has a full DuckDB twin thanks to quantized
  *   integer scoring (see Similarity scaladoc).
  * - `dedup_minhash_lsh` is gated against the EXACT Jaccard oracle: the
  *   sketch must reproduce the exact algorithm's output (banding chosen
  *   so recall ≈ 1 above the threshold band; verification removes false
  *   positives).
  * - `sim_ann_lsh` / `dedup_simhash` use engine-specific hashing →
  *   rows-only driver check + recall specs in ScalaTest.
  */
object SimilarityQueries {
  import RefQueries.table

  def simTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = table(spark, sfDir, "embeddings")
    Similarity.topKCosine(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("q_id"), desc("cos_sim"), col("n_id"))
  }

  val simTopKSql: String =
    """WITH q AS (
      |  SELECT vec_id AS q_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings WHERE vec_id < 10
      |), c AS (
      |  SELECT vec_id AS n_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS cv
      |  FROM embeddings
      |), scored AS (
      |  SELECT q_id, n_id,
      |         CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS BIGINT) AS dot_q,
      |         list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[]))
      |           / (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))
      |              * sqrt(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])))) AS cos_sim
      |  FROM c CROSS JOIN q
      |  WHERE q_id <> n_id
      |)
      |SELECT q_id, n_id, dot_q, cos_sim FROM scored
      |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) <= 5
      |ORDER BY q_id, cos_sim DESC, n_id""".stripMargin

  def simAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = table(spark, sfDir, "embeddings")
    Similarity.annTopKCosine(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("q_id"), desc("cos_sim"), col("n_id"))
  }

  def simAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = table(spark, sfDir, "embeddings")
    Similarity.ivfTopKCosine(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("q_id"), desc("cos_sim"), col("n_id"))
  }

  /** Gated at threshold 0.7: with r=4 rows × b=32 bands, a true-Jaccard-j
    * pair survives banding with p = 1-(1-j⁴)³² — ≈0.9998 at j=0.7 but
    * only ≈0.87 at j=0.5, so 0.5 would gate the sketch in the band where
    * it is ALLOWED to miss. At 0.7 the exact-output oracle is a sound
    * contract (verification already removes all false positives).
    */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    MinHashDedup.nearDupPairs(table(spark, sfDir, "documents"),
        n = 2, threshold = 0.7)
      .orderBy("d1", "d2")

  /** Must equal the exact inverted-index algorithm's output at 0.7. */
  val dedupMinhashSql: String = TextQueries.dedupNgramJaccardSqlAt(0.7)

  def dedupEmbeddingCosine(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosineNearDupPairs(table(spark, sfDir, "embeddings"), 0.4)
      .orderBy("d1", "d2")

  val dedupEmbeddingCosineSql: String =
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings
      |)
      |SELECT a.vec_id AS d1, b.vec_id AS d2,
      |       list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
      |         / (sqrt(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[])))
      |            * sqrt(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])))) AS cos_sim
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
      |        / (sqrt(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[])))
      |           * sqrt(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])))) >= 0.4
      |ORDER BY d1, d2""".stripMargin

  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    // maxHamming=6 covers every planted near-dup (observed max 6);
    // bands=8 → 8-bit chunks → 256 buckets/band, vs 16 buckets/band at
    // bands=16 which made candidate generation quadratic
    SimHashDedup.nearDupPairs(table(spark, sfDir, "documents"),
        maxHamming = 6, bands = 8)
      .orderBy("d1", "d2")
}
