package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case totality for the text analyzer: empty text, whitespace-only,
  * single char, unicode — must never throw (ANSI mode turns silent
  * errors into hard failures, so totality has to be by construction).
  */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("analyze is total on degenerate documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "x"), (4L, "The The THE the"),
      (5L, "naïve café — résumé"), (6L, "a\tb\nc"),
    ).toDF("doc_id", "text")
    val out = TextOps.analyze(docs).orderBy("doc_id").collect()
    assert(out.length == 6)
    def n(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue
    val byId = out.map(r => n(r, "doc_id") -> r).toMap
    // empty + whitespace-only: zero tokens, fingerprint 0, no crash
    assert(n(byId(1L), "n_tokens") == 0)
    assert(n(byId(2L), "n_tokens") == 0)
    assert(n(byId(1L), "fingerprint") == 0L)
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("avg_token_len")),
      "zero-token ratios must be NULL, not an error")
    // case folding: 4 tokens, all 'the' after lowercasing
    assert(n(byId(4L), "n_tokens") == 4)
    assert(n(byId(4L), "score_en") == 1L)
    // tab/newline are token separators
    assert(n(byId(6L), "n_tokens") == 3)
  }

  test("fingerprint is order-sensitive and content-sensitive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"),
    ).toDF("doc_id", "text")
    val fp = TextOps.analyze(docs).select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L), "identical docs must fingerprint identically")
    assert(fp(1L) != fp(2L), "token order must change the rolling hash")
  }

  test("native fingerprint equals the HOF fold spelling, incl. non-ASCII") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${graft.TestSpark.Sf001}/documents.parquet")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val both = docs.select(
      TextOps.fingerprint(col("toks")).as("hof"),
      graft.functions.StringArrayFingerprint.fingerprint(col("toks")).as("native"))
    assert(both.where(col("hof") =!= col("native")).isEmpty)
    // codepoint semantics beyond ASCII: multibyte chars and a
    // supplementary-plane character must hash identically in both
    import spark.implicits._
    val uni = Seq((1L, Seq("héllo", "wörld", "日本語", "a😀b")))
      .toDF("doc_id", "toks")
    val u = uni.select(
      TextOps.fingerprint(col("toks")).as("hof"),
      graft.functions.StringArrayFingerprint.fingerprint(col("toks")).as("native"))
      .collect()(0)
    assert(u.getLong(0) == u.getLong(1))
  }

  test("langid picks the language with the best stopword score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat of the mat and all is well"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "el perro y la casa de los gatos"),
    ).toDF("doc_id", "text")
    val got = TextOps.analyze(docs).select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"))
  }

  test("readability counts and Flesch formula on hand-checked docs") {
    val rows = graft.queries.TextQueries
      .textReadability(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, syl, f) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"),
        r.getAs[Long]("flesch_1e3"))
      assert(w > 0 && s >= 1)
      // every word contributes at least one syllable
      assert(syl >= w)
      assert(f == 206835L - 1015L * w / s - 84600L * syl / w)
    }
    // hand-check the syllable proxy on a tiny frame: "data" = 2 vowel
    // groups, "stream" = 1 ("ea" is one run), "xyz" floors at 1 ("y" is
    // a vowel here so it's a real group)
    import spark.implicits._
    val df = Seq((1L, "data stream xyz.")).toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(org.apache.spark.sql.functions.col("text")))
    val syl = df.selectExpr(
      "aggregate(transform(toks, t -> CAST(greatest(regexp_count(t, '[aeiouy]+'), 1) AS LONG)), 0L, (a, x) -> a + x) AS s")
      .collect().head.getLong(0)
    assert(syl == 2L + 1L + 1L)
  }

  test("zipf fit recovers a planted power law and flags the corpus slope") {
    val r = graft.queries.TextQueries.textZipfFit(spark, TestSpark.Sf001)
      .collect().head
    // the fit covers min(topN, vocabulary) ranks — this synthetic corpus
    // has a tiny vocabulary, well under the 100 cap
    val vocab = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .selectExpr("explode(filter(split(lower(text), '\\\\s+'), t -> t != '')) AS t")
      .select("t").distinct().count()
    assert(r.getAs[Long]("n_ranks") == math.min(100L, vocab))
    val slope = r.getAs[Double]("slope")
    // the synthetic corpus draws tokens near-uniformly from a small
    // vocabulary, so the top-100 rank-frequency curve is nearly flat —
    // slope must sit between a perfect Zipf (-1) and flat (0), and the
    // operator must not report a positive slope (ranks are freq-sorted)
    assert(slope <= 0.0 && slope > -1.5, s"slope $slope")
    assert(!r.isNullAt(r.fieldIndex("intercept_log2")))
  }

  test("ngram novelty: first doc is fully novel, totals consistent") {
    val rows = graft.queries.TextQueries
      .textNgramNovelty(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    // the earliest doc can only introduce grams
    assert(first.getAs[Long]("novelty_ppm") == 1000000L)
    rows.foreach { r =>
      val (n, nov, ppm) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
        r.getAs[Long]("novelty_ppm"))
      assert(nov >= 0 && nov <= n)
      assert(ppm == nov * 1000000L / n)
    }
    // the shared synthetic vocabulary guarantees later docs repeat grams
    assert(rows.exists(_.getAs[Long]("novelty_ppm") < 1000000L))
  }

  test("DSIR selection enriches the target domain") {
    val sel = graft.queries.TextQueries.corpusDsirSelect(spark, TestSpark.Sf001)
      .collect()
    assert(sel.nonEmpty)
    // ordered by weight desc, then doc_id
    val ws = sel.map(_.getAs[Long]("dsir_1e6")).toSeq
    assert(ws == ws.sorted.reverse)
    // the selection must over-represent the English target slice
    val langs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val selEn = sel.count(r => langs(r.getAs[Long]("doc_id")) == "en").toDouble / sel.length
    val corpusEn = langs.values.count(_ == "en").toDouble / langs.size
    assert(selEn > corpusEn,
      s"selection en-share $selEn must exceed corpus share $corpusEn")
  }

  test("perplexity banding partitions the corpus into ordered thirds") {
    val rows = graft.queries.TextQueries
      .corpusPerplexityFilter(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("ppl_log2_1e6"))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // thresholds split by score: buckets must be ordered score bands
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // percentile split: each band holds roughly a third of the corpus
    val n = rows.length
    byBucket.values.foreach(b =>
      assert(b.length > n / 5 && b.length < n / 2, s"skewed band ${b.length}/$n"))
  }
}
