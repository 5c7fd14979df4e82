package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.TextOps

/** Full-text retrieval over the `documents` corpus: BM25 ranking,
  * conjunctive boolean search, and corpus n-gram statistics — the query
  * side of a training-data pipeline (building retrieval sets, mining
  * common n-grams for tokenizer/contamination work).
  *
  * Determinism: scores are fixed sequences of IEEE-754 ops over exact
  * integer sufficient statistics (tf, df, dl, N — see StatQueries's
  * doctrine). The BM25 idf uses the RATIO spelling (N−df+0.5)/(df+0.5)
  * rather than its ln(): two engines' libm logs are not guaranteed to
  * round identically, the ratio is — and for a fixed query it is a
  * monotone re-weighting, documented on the operator. Per-document
  * scores sum over the (two) query terms only: a two-operand fp add is
  * commutative, so aggregation order cannot flip bits.
  *
  * Scale: tf/df/dl are one tokenize+explode pass and two hash
  * aggregates; the per-term df and corpus constants (N, avgdl) are a
  * broadcast-sized side input; ranking is TakeOrderedAndProject. The
  * same plan runs on a 1000-executor corpus — the only wide exchange is
  * the (doc, term) aggregate, which map-side combines.
  */
object RetrievalQueries {
  import RefQueries.table

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  /** DuckDB tokenizer CTE — mirrors TextOps.tokens (single source of
    * truth for constants; TextQueries.DuckToks is the same shape).
    */
  private val DuckToks =
    """WITH d AS MATERIALIZED (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS toks
      |  FROM documents
      |)""".stripMargin

  // ---- BM25 ranking ---------------------------------------------------

  /** `text_bm25` — BM25 (k1=1.2, b=0.75) top-20 documents for the fixed
    * two-term query {spark, hash}, ratio-idf spelling (see object doc).
    * Robertson & Sparck Jones probabilistic relevance framework.
    */
  def textBm25(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = Seq("spark", "hash")
    val d = docs(spark, sfDir).withColumn("toks", TextOps.tokens(col("text")))
    val dl = d.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    // corpus constants: one tiny aggregate, joined as a broadcast —
    // a pipeline would compute them once and pass them in
    val consts = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1)).cast(DoubleType))
        .as("avgdl"))
    val tf = d.select(col("doc_id"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(consts))
      .withColumn("idf",
        ((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5d)) /
          (col("df").cast(DoubleType) + lit(0.5d)))
      .withColumn("tfnorm",
        (col("tf").cast(DoubleType) * lit(2.2d)) /
          (col("tf").cast(DoubleType) +
            lit(1.2d) * (lit(0.25d) + lit(0.75d) *
              (col("dl").cast(DoubleType) / col("avgdl")))))
      .groupBy("doc_id")
      .agg(sum(col("idf") * col("tfnorm")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select("doc_id", "n_terms_hit", "score")
  }

  val textBm25Sql: String = DuckToks +
    """
      |, dl AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
      |c AS MATERIALIZED (SELECT COUNT(*) AS n_docs,
      |             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      |      FROM dl),
      |t AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok FROM d),
      |tf AS MATERIALIZED (SELECT doc_id, tok, COUNT(*) AS tf FROM t
      |       WHERE tok IN ('spark', 'hash') GROUP BY doc_id, tok),
      |df AS MATERIALIZED (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT tf.doc_id,
      |         ((CAST(c.n_docs - df.df AS DOUBLE) + 0.5) /
      |          (CAST(df.df AS DOUBLE) + 0.5)) *
      |         ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |          (CAST(tf.tf AS DOUBLE) +
      |           1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / c.avgdl)))) AS term_score
      |  FROM tf JOIN df ON tf.tok = df.tok
      |          JOIN dl ON tf.doc_id = dl.doc_id
      |          CROSS JOIN c
      |)
      |SELECT doc_id, COUNT(*) AS n_terms_hit, SUM(term_score) AS score
      |FROM scored GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---- conjunctive boolean search ------------------------------------

  /** `text_search_boolean` — documents containing ALL of
    * {spark, merge, window}: the postings-intersection spelling
    * (filter to query terms → per-doc distinct-term count = |query|),
    * which is how an inverted index answers AND queries. Integer-only
    * output.
    */
  def textSearchBoolean(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = Seq("spark", "merge", "window")
    docs(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_terms"),
        count(lit(1)).as("tf_total"))
      .where(col("n_terms") === terms.length)
      .select("doc_id", "tf_total")
      .transform(RefQueries.gateSort(_, "doc_id"))
  }

  val textSearchBooleanSql: String = DuckToks +
    """
      |, t AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok FROM d)
      |SELECT doc_id, COUNT(*) AS tf_total
      |FROM t WHERE tok IN ('spark', 'merge', 'window')
      |GROUP BY doc_id
      |HAVING COUNT(DISTINCT tok) = 3
      |ORDER BY doc_id""".stripMargin

  // ---- corpus n-gram statistics --------------------------------------

  /** `text_ngrams` — corpus-wide token trigram counts, top-30. The
    * tokenizer/contamination primitive: one narrow map builds the
    * per-doc trigram list (indexing a MATERIALIZED toks column — not
    * re-tokenizing per element), one exploded hash aggregate counts.
    */
  def textNgrams(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(explode(
        transform(sequence(lit(1), size(col("toks")) - 2), i =>
          concat_ws(" ",
            element_at(col("toks"), i),
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2)))).as("trigram"))
      .groupBy("trigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(30)

  val textNgramsSql: String = DuckToks +
    """
      |, g AS (
      |  SELECT unnest(list_transform(range(1, len(toks) - 1), i ->
      |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS trigram
      |  FROM d WHERE len(toks) >= 3
      |)
      |SELECT trigram, COUNT(*) AS n FROM g GROUP BY trigram
      |ORDER BY n DESC, trigram LIMIT 30""".stripMargin

  // ---- positional phrase search --------------------------------------

  /** `text_phrase_search` — exact phrase query ("slow hash batch") the
    * way a POSITIONAL inverted index answers it: posexplode to
    * (doc, pos, term) postings, keep only the phrase's terms (the
    * pushed-down index lookup — nothing corpus-sized survives it), and
    * align each term's candidate start (pos − term offset) with a k−1
    * way equi-join on (doc, start). A row surviving all joins IS a full
    * phrase occurrence, so no per-doc re-scan and no regex over raw
    * text. At 100 TB the postings list is the pre-built table bucketed
    * by term — the query touches |postings(t₁)|+…+|postings(t_k)| rows,
    * never the corpus; the adjacency joins are co-partitioned by
    * doc_id after the term filter. `text_search_boolean` is the
    * positionless AND sibling.
    */
  def textPhraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val phrase = Seq("slow", "hash", "batch")
    val postings = docs(spark, sfDir)
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase: _*))
    phrase.zipWithIndex.map { case (t, i) =>
      postings.where(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min("start").cast("long").as("first_pos"))
      .transform(RefQueries.gateSort(_, "doc_id"))
  }

  val textPhraseSearchSql: String = DuckToks +
    """
      |, t AS MATERIALIZED (
      |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
      |  FROM d
      |), m AS (
      |  SELECT a.doc_id, a.pos AS start
      |  FROM t a
      |  JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      |  WHERE a.tok = 'slow' AND b.tok = 'hash' AND c.tok = 'batch'
      |)
      |SELECT doc_id, COUNT(*) AS n_matches, CAST(MIN(start) AS BIGINT) AS first_pos
      |FROM m GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
}
