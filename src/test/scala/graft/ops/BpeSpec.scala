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
}
