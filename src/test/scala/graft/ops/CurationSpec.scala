package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Stage semantics of the composed curation pipeline on a planted
  * corpus: quality filters, exact-dedup survivor choice, near-dup
  * removal rule (larger id of any qualifying pair drops, chains drop
  * entirely behind the first element).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away " * 3 // 39 tokens, en

  test("each stage's rule on a planted corpus") {
    val docs = Seq(
      (1L, base + "one"),                       // survivor
      (2L, base + "one"),                       // exact dup of 1 → dropped
      (3L, base + "two"),                       // near-dup of 1 → dropped (larger id)
      (4L, "short text"),                       // < 30 tokens → dropped
      (5L, ("der hund und die katze ist gut " * 6).trim), // de → dropped
      (6L, "completely different words entirely here now that nobody else uses " +
        "in this corpus of the and to is in a of documents padding padding " +
        "more words to cross the thirty token minimum easily done now yes"), // distinct en survivor
    ).toDF("doc_id", "text")
    val out = Curation.curate(docs).orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 6L), s"got $out")
  }

  test("curation at sf0.01 keeps the oracle-verified 364 documents") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
    assert(Curation.curate(docs).count() == 364L)
  }
}
