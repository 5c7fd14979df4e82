package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Viterbi DP against a driver-side brute-force enumeration of
  * every segmentation (the oracle's strategy, re-derived independently
  * in Scala) on the real sf0.001 types, plus a hand-derived case.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def typesOf(df: org.apache.spark.sql.DataFrame) =
    Bpe.wordTypes(df).select("word", "wcnt")

  private def scoresOf(types: org.apache.spark.sql.DataFrame): Map[String, Long] =
    UnigramLm.vocabScores(UnigramLm.pieceCounts(types))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Brute force: lexicographic (max cost, min pieces) over ALL
    * segmentations with pieces ≤ MaxPiece from the vocab.
    */
  private def brute(word: String, sc: Map[String, Long]): (Long, Long) = {
    def go(i: Int): Seq[(Long, Long)] =
      if (i == word.length) Seq((0L, 0L))
      else (1 to UnigramLm.MaxPiece).flatMap { k =>
        if (i + k > word.length) Nil
        else sc.get(word.substring(i, i + k)).toSeq.flatMap(s =>
          go(i + k).map { case (c, n) => (c + s, n + 1) })
      }
    go(0).maxBy { case (c, n) => (c, -n) }
  }

  test("DP optimum equals brute-force enumeration on the sf0.001 types") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select("doc_id", "text")
    val types = typesOf(docs)
    val sc = scoresOf(types)
    val got = UnigramLm.segmentTypes(types, sc).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (w, (c, n)) =>
      val (bc, bn) = brute(w, sc)
      assert((c, n) == (bc, bn), s"word=$w dp=($c,$n) brute=($bc,$bn)")
    }
  }

  test("hand case: whole-word piece beats two halves; singletons segment") {
    import spark.implicits._
    import graft.functions.IntegerLog2.log2Scaled
    val docs = Seq((1L, "abab abab abab abab abab x")).toDF("doc_id", "text")
    val types = typesOf(docs)
    val sc = scoresOf(types)
    // counts: a/b/ab = 10 each; ba/aba/bab/abab = 5; x = 1; total 51
    val tot = log2Scaled(51)
    val got = UnigramLm.segmentTypes(types, sc).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // "abab" as ONE piece: cost log2(5/51) beats ab+ab = 2·log2(10/51)
    assert(got("abab") == (log2Scaled(5) - tot, 1L))
    assert(got("x") == (log2Scaled(1) - tot, 1L))
  }
}
