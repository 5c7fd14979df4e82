package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall gates for the approximate operators, measured against their
  * exact baselines on the sf0.01 tables (fixed data + deterministic
  * hashing ⇒ these are exact assertions, not flaky statistics).
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
  private def docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")

  test("quantized cosine top-k is sane: scores in [-1,1], k rows per query") {
    val out = Similarity.topKCosine(emb.where(col("vec_id") < 10), emb, 5)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("IVF ANN recall ≥ 0.8 vs brute force at nProbe=6/32") {
    val exact = Similarity.topKCosine(emb.where(col("vec_id") < 10), emb, 5)
      .select("q_id", "n_id")
    val ann = Similarity.ivfTopKCosine(emb.where(col("vec_id") < 10), emb, 5)
      .select("q_id", "n_id")
    val hits = ann.join(exact, Seq("q_id", "n_id")).count()
    assert(hits >= 40, s"IVF recall $hits/50 < 0.8")
  }

  test("minhash LSH output equals exact jaccard output (recall 1 here)") {
    val exact = Dedup.ngramJaccardPairs(docs, 2, 0.5).select("d1", "d2")
    val mh = MinHashDedup.nearDupPairs(docs, 2, 0.5).select("d1", "d2")
    assert(exact.exceptAll(mh).isEmpty && mh.exceptAll(exact).isEmpty)
  }

  test("simhash candidate pairs cover all planted near-dups") {
    val planted = Dedup.ngramJaccardPairs(docs, 2, 0.5).select("d1", "d2")
    val sh = SimHashDedup.nearDupPairs(docs, maxHamming = 6, bands = 8)
      .select("d1", "d2")
    assert(planted.exceptAll(sh).isEmpty,
      "a jaccard≥0.5 pair is missing from simhash hamming≤6 pairs")
  }
}
