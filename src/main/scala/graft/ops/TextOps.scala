package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, and content fingerprinting.
  *
  * Built from built-in expressions — no UDFs — so every operator is a
  * narrow, shuffle-free map that scales linearly with input splits.
  * Honest codegen accounting: split/regexp_count/array_intersect are
  * codegen'd; the higher-order lambdas (tokens' filter, the
  * sum_token_len fold) run on Spark's interpreted HOF path but are
  * linear per row; the fingerprint — the one genuinely hot nested fold —
  * runs through the native codegen'd StringArrayFingerprint kernel.
  * Determinism: token counts and ratios are integer-derived; the
  * fingerprint is modular integer arithmetic — bit-identical on any
  * executor count or row order.
  */
object TextOps {

  /** Whitespace tokenizer: lowercase, split on runs of whitespace, drop
    * empty tokens (split keeps a trailing empty for trailing whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** BPE-ish token count: letter runs, single digits, single punctuation
    * marks — the classic pre-tokenizer shape.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"))

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Tiny per-language stopword marker sets for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed: the operator
    * contract is a deterministic score per language + argmax.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "les", "et", "est", "un"),
  )

  def stopwordScore(toks: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(words.map(lit): _*)))

  /** Rolling polynomial fingerprint of a token array (document-level
    * content hash): fold (acc*31 + tokenHash) mod 1e9+7, where tokenHash
    * folds (a*131 + charCode) mod 1e9+7 over the token's characters.
    * Pure integer expressions — reproducible across engines, which is why
    * we don't just call Spark's murmur `hash`/`xxhash64` here (those are
    * engine-specific; see MinHashDedup for where they ARE appropriate).
    * This HOF spelling is the REFERENCE; `analyze` runs the codegen'd
    * `functions.StringArrayFingerprint` (spec-pinned value-identical) —
    * the nested interpreted folds cost a substring+ascii allocation per
    * character.
    */
  /** Engine-neutral per-token polynomial hash — THE single HOF
    * definition (SimHashDedup and the fingerprint both fold it; the
    * codegen kernels StringArrayFingerprint/StringArraySimHash are
    * spec-pinned value-identical to it). Constants 131 / 1e9+7 here are
    * the source of truth for every oracle twin.
    */
  val polyTokenHash: Column => Column = t =>
    aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(substring(t, i, lit(1)))),
      lit(0L),
      (a, c) => (a * 131 + c) % 1000000007L)

  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 31 + polyTokenHash(t)) % 1000000007L)

  /** Per-document analysis frame: token counts, ratios, quality score,
    * language prediction, fingerprint. Input needs `doc_id`, `text`.
    */
  def analyze(docs: DataFrame): DataFrame = {
    val withToks = docs.withColumn("toks", tokens(col("text")))
    val scores = StopwordSets.map { case (lang, words) =>
      s"score_$lang" -> stopwordScore(col("toks"), words)
    }
    val scored = scores.foldLeft(withToks) { case (df, (name, c)) =>
      df.withColumn(name, c)
    }
    // deterministic argmax: first language (in StopwordSets order) whose
    // score equals the maximum
    val maxScore = greatest(scores.map(s => col(s._1)): _*)
    val predicted = StopwordSets.map(_._1).foldRight(lit("und"): Column) {
      case (lang, rest) => when(col(s"score_$lang") === maxScore, lang).otherwise(rest)
    }
    // ratios NULL out on zero denominators (empty/whitespace-only docs):
    // ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO on a bare `/`
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den)
    scored
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_tokens_bpe", bpeishCount(col("text")))
      .withColumn("sum_token_len",
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)))
      .withColumn("avg_token_len", ratio(col("sum_token_len"), col("n_tokens")))
      .withColumn("n_punct", punctCount(col("text")))
      .withColumn("punct_ratio", ratio(col("n_punct"), col("n_chars")))
      .withColumn("stopword_ratio", ratio(col("score_en"), col("n_tokens")))
      .withColumn("predicted_lang", predicted)
      .withColumn("fingerprint",
        graft.functions.StringArrayFingerprint.fingerprint(col("toks")))
  }
}
