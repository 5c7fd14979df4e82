package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextQueries

/** Round-17 operator pins: exact cross-document repeated-span
  * detection (`dedup_repeated_spans`) — fixture semantics and the
  * phase-equivalence property the two-phase production spelling's
  * exactness rests on.
  */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 15 shared tokens embedded at DIFFERENT offsets in two docs, plus a
  // doc that repeats a span only WITHIN itself, plus an exactly-15-token
  // doc, plus a too-short doc
  private val shared =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar"
  private val fixture = docsOf(
    1L -> s"intro words here $shared trailing tail",
    2L -> s"$shared completely different ending tokens now",
    3L -> (s"selfrepeat $shared" + s" and again $shared"), // also cross-doc
    4L -> ("solo unique tokens one two three four five six seven eight " +
      "nine ten eleven twelve"), // 15 tokens, no partner
    5L -> "too short")

  test("repeated spans: shared 15-token span found with exact counts") {
    val out = TextQueries.repeatedSpans(fixture, spanLen = 15)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.contains(shared), "the embedded shared span must surface")
    // docs 1, 2, 3 contain it; doc 3 twice -> 4 occurrences total
    assert(out(shared) == ((3L, 4L, 1L)),
      s"expected (n_docs=3, n_occ=4, first=1), got ${out(shared)}")
    // every reported span must be genuinely cross-document
    assert(out.values.forall(_._1 >= 2))
  }

  test("a span repeated only WITHIN one document is not cross-doc") {
    val selfOnly = docsOf(
      7L -> (s"$shared filler filler $shared"),
      8L -> ("nothing in common with anything else at all here now " +
        "one two three four five"))
    assert(TextQueries.repeatedSpans(selfOnly, spanLen = 15)
      .collect().isEmpty,
      "within-doc repetition alone must not report (n_docs >= 2 filter)")
  }

  test("exactly-spanLen docs window once; shorter docs window zero times") {
    val out = TextQueries.repeatedSpans(docsOf(
      10L -> shared, // exactly 15 tokens
      11L -> shared, // identical -> one shared window
      12L -> "short doc"), spanLen = 15).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L &&
      out.head.getLong(2) == 2L)
  }

  test("dup-span fraction: per-doc rollup counts shared windows exactly") {
    val out = TextQueries.dupSpanFraction(fixture, spanLen = 15)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L),
      "one row per document, including sub-window-length docs")
    // doc 1: 'intro words here' + 15 shared + 'trailing tail' = 20 toks
    // -> 6 windows; only the pure shared window is cross-doc
    assert(out(1L) == ((6L, 1L, 166666L)), s"doc1: ${out(1L)}")
    // doc 4 has exactly one window, unshared; doc 5 has none
    assert(out(4L) == ((1L, 0L, 0L)))
    assert(out(5L) == ((0L, 0L, 0L)))
    // doc 2: 15 shared + 5 own = 20 toks -> 6 windows, 1 shared
    assert(out(2L)._1 == 6L && out(2L)._2 == 1L)
  }

  test("two-phase (hash prefilter) equals the direct single-phase " +
      "spelling on a real corpus slice") {
    // THE exactness property: phase 1 prunes a superset, phase 2 groups
    // on the real string — so the twin's direct restatement must be
    // row-identical, hash collisions or not
    val corpus = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
    val two = TextQueries.repeatedSpans(corpus, spanLen = 15)
      .collect().map(_.toString).sorted.toSeq
    val one = TextQueries.repeatedSpansDirect(corpus, spanLen = 15)
      .collect().map(_.toString).sorted.toSeq
    assert(two == one, "hash-prefiltered and direct spellings diverged")
    assert(two.nonEmpty, "sf0.001 must surface repeated spans — an " +
      "empty gate would be vacuous")
  }
}
