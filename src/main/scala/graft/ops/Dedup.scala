package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup is a hash aggregate on the content key — one shuffle,
  * map-side combined, AQE-skew-safe. N-gram Jaccard is the exact
  * pairwise baseline: inverted-index self-join on distinct shingles, so
  * only docs sharing ≥1 shingle ever meet (never the naive n² cross
  * join). Its scale hazard is hot shingles (a shingle shared by B docs
  * contributes B² pair rows), so `maxShingleBucket` can drop
  * super-common shingles from candidate generation — the standard
  * indexing trick; at 100 TB you'd set it and/or move to MinHash LSH
  * (see MinHashDedup) which replaces the full inverted index with
  * banded signatures.
  */
object Dedup {

  /** Exact dedup: group by the content column, keep the smallest id.
    * Output: one row per distinct content with the survivor id and copy
    * count.
    */
  def exact(docs: DataFrame, keyCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Word-n-gram shingle arrays (distinct), lowercased whitespace tokens.
    * Docs with fewer than n tokens get an empty shingle set.
    */
  def shingles(docs: DataFrame, n: Int = 2): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    ).otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), array_distinct(grams).as("shingle_set"))
  }

  /** Exact pairwise n-gram Jaccard ≥ threshold via inverted-index
    * self-join. Output: (d1, d2, intersect_size, n1, n2, jaccard) with
    * d1 < d2. Jaccard = |A∩B| / (|A|+|B|-|A∩B|), exact integer-derived
    * double.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 2,
      threshold: Double = 0.5,
      maxShingleBucket: Option[Int] = None): DataFrame = {
    val sh = shingles(docs, n).cache()
    val sizes = sh.select(col("doc_id"), size(col("shingle_set")).as("n_sh"))
    val exploded = sh.select(col("doc_id"), explode(col("shingle_set")).as("g"))
    val candidates = maxShingleBucket match {
      case Some(cap) =>
        // drop super-common shingles from candidate generation (hot-key
        // guard; documented approximation)
        val hot = exploded.groupBy("g").count().where(col("count") > cap).select("g")
        exploded.join(hot, Seq("g"), "left_anti")
      case None => exploded
    }
    val a = candidates.as("a")
    val b = candidates.as("b")
    val pairs = a.join(b,
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("intersect_size"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_sh", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_sh", "n2"), "d2")
      .withColumn("jaccard",
        col("intersect_size").cast("double") /
          (col("n1") + col("n2") - col("intersect_size")))
      .where(col("jaccard") >= threshold)
      .select("d1", "d2", "intersect_size", "n1", "n2", "jaccard")
  }
}
