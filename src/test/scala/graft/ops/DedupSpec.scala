package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny"), // < 2 tokens → empty shingle set
  ).toDF("doc_id", "text")

  test("exact dedup groups identical text, keeps min id") {
    val out = Dedup.exact(docs).orderBy("keep_doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.contains((1L, 2L))) // docs 1+4 merged, survivor 1
    assert(out.length == 4)
  }

  test("bigram jaccard finds the near-dup pair and the exact pair only") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.5)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // doc1⋈doc2: 8 bigrams each, 7 shared → 7/9 ≈ 0.778
    // doc1⋈doc4: identical → 1.0 ; doc2⋈doc4 same as 1⋈2
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j12 = pairs.find(p => p._1 == 1 && p._2 == 2).get._3
    assert(math.abs(j12 - 7.0 / 9.0) < 1e-12)
    assert(pairs.find(p => p._1 == 1 && p._2 == 4).get._3 == 1.0)
  }

  test("hot-shingle cap prunes candidate generation but keeps distinct pairs") {
    val capped = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.9,
      maxShingleBucket = Some(10))
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)))
  }

  test("cap prunes candidates but surviving pairs report EXACT jaccard") {
    // cap=2 drops the 3-doc bigrams (shared by 1,2,4) from candidate
    // generation; the pair (1,4) still qualifies via rarer shingles and
    // must report jaccard 1.0 — counting only uncapped join rows would
    // understate it
    val capped = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.9,
      maxShingleBucket = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    capped.foreach { case (d1, d2, j) =>
      assert(j == 1.0, s"pair ($d1,$d2) reported $j, expected exact 1.0")
    }
  }

  test("sf0.01 documents: 25 planted near-dup pairs at jaccard ≥ 0.5") {
    val d = spark.read.parquet(s"${graft.TestSpark.Sf001}/documents.parquet")
    assert(Dedup.ngramJaccardPairs(d, 2, 0.5).count() == 25L)
  }

  test("prefix-filtered variant is lossless: identical output to full index") {
    val d = spark.read.parquet(s"${graft.TestSpark.Sf001}/documents.parquet")
    val full = Dedup.ngramJaccardPairs(d, 2, 0.5)
    val pref = Dedup.ngramJaccardPairs(d, 2, 0.5,
      strategy = Dedup.JaccardStrategy.PrefixFilter)
    assert(full.exceptAll(pref).isEmpty && pref.exceptAll(full).isEmpty)
  }

  test("bitmap strategy is exact: identical output to full index") {
    val d = spark.read.parquet(s"${graft.TestSpark.Sf001}/documents.parquet")
    val full = Dedup.ngramJaccardPairs(d, 2, 0.5)
    val bm = Dedup.ngramJaccardPairs(d, 2, 0.5,
      strategy = Dedup.JaccardStrategy.Bitmap)
    assert(full.exceptAll(bm).isEmpty && bm.exceptAll(full).isEmpty)
    // and on the tiny literal corpus, including the empty-shingle doc
    val bmTiny = Dedup.ngramJaccardPairs(docs, 2, 0.5,
      strategy = Dedup.JaccardStrategy.Bitmap)
    val fullTiny = Dedup.ngramJaccardPairs(docs, 2, 0.5)
    assert(fullTiny.exceptAll(bmTiny).isEmpty && bmTiny.exceptAll(fullTiny).isEmpty)
    // the contract holds at threshold 0 too: bitmap must not add the
    // disjoint jaccard-0 pairs the inverted index can never generate
    val bm0 = Dedup.ngramJaccardPairs(docs, 2, 0.0,
      strategy = Dedup.JaccardStrategy.Bitmap)
    val full0 = Dedup.ngramJaccardPairs(docs, 2, 0.0)
    assert(full0.exceptAll(bm0).isEmpty && bm0.exceptAll(full0).isEmpty)
  }
}
