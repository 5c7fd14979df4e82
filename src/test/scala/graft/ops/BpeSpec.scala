package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable BPE pins: the corpus "aaab aaab b" has a fully
  * derivable merge sequence, exercising greedy non-overlap (the (a,a)
  * round on "aaa"), count-desc/pair-asc tie-breaking, merge-rule
  * exhaustion, and the encode join.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq((1L, "aaab aaab b")).toDF("doc_id", "text")
  }

  test("merge sequence is the hand-derived one, greedy non-overlapping") {
    // types: aaab x2, b x1.
    // round 1: pairs (a,a) 2x2=4, (a,b) 1x2=2 -> merge (a,a); greedy on
    //   [a,a,a,b] takes position 1 only (position 2 overlaps) -> [aa,a,b]
    // round 2: (aa,a) 2, (a,b) 2 -> tie, pa asc: "a" < "aa" -> (a,b)
    //   -> [aa, ab]
    // round 3: (aa,ab) 2 -> [aaab]
    // round 4+: no adjacent pairs anywhere -> no rule, loop no-ops
    val (merges, types) = Bpe.learn(corpus, rounds = 6)
    val got = merges.orderBy("round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 2L), (3L, "aa", "ab", 2L)))
    val segs = types.orderBy("word").collect()
      .map(r => (r.getString(0), r.getSeq[String](2)))
    assert(segs.toSeq == Seq(("aaab", Seq("aaab")), ("b", Seq("b"))))
  }

  test("vocab ids are lexicographic-dense; encode reproduces the doc") {
    val (_, types) = Bpe.learn(corpus, rounds = 6)
    val v = Bpe.vocab(types).orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq == Seq(("aaab", 1L), ("b", 2L)))
    // "aaab aaab b" -> ids [1, 1, 2] in document order
    val enc = Bpe.encode(corpus, types, Bpe.vocab(types))
      .orderBy("pos", "sp")
      .collect().map(_.getAs[Long]("id"))
    assert(enc.toSeq == Seq(1L, 1L, 2L))
  }

  test("partial training (2 rounds) leaves partially merged segmentations") {
    val (merges, types) = Bpe.learn(corpus, rounds = 2)
    assert(merges.count() == 2)
    val aaab = types.where(col("word") === "aaab")
      .head().getSeq[String](2)
    assert(aaab == Seq("aa", "ab"))
  }

  test("fertility: at least one subword per word, totals consistent") {
    val rows = graft.queries.BpeQueries
      .textBpeFertility(TestSpark.spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, f) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"),
        r.getAs[Long]("fertility_ppm"))
      assert(s >= w, "every word yields at least one subword")
      assert(f == s * 1000000L / w)
      assert(f >= 1000000L)
    }
  }

  test("kmeans training: full coverage, nonnegative integer inertia") {
    val emb = TestSpark.spark.read
      .parquet(s"${TestSpark.Sf001}/embeddings.parquet")
    val rows = graft.ops.Similarity.kmeansTrain(emb, nCells = 8, iters = 2)
      .collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("cell") >= 0 && r.getAs[Long]("cell") < 8)
      assert(r.getAs[Long]("n_points") > 0)
      assert(r.getAs[Long]("inertia") >= 0L)
    }
    // every vector lands in exactly one cell (none are zero-norm here)
    assert(rows.map(_.getAs[Long]("n_points")).sum == emb.count())
    // more rounds cannot increase final inertia on this corpus: the
    // training loop must actually improve over the seed assignment
    val seed = graft.ops.Similarity.kmeansTrain(emb, nCells = 8, iters = 0)
      .collect().map(_.getAs[Long]("inertia")).sum
    val trained = rows.map(_.getAs[Long]("inertia")).sum
    assert(trained <= seed, s"training worsened inertia: $trained > $seed")
  }
}
