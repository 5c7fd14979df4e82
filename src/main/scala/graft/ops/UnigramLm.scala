package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo 2018 — the SentencePiece
  * model family): given a piece vocabulary scored by corpus frequency,
  * segment every word into the maximum-likelihood piece sequence by
  * Viterbi DP. The BPE operator (ops.Bpe) learns merge RULES; this is
  * the other mainstream tokenizer shape — a probabilistic model over a
  * fixed vocabulary, where segmentation is chosen at inference time by
  * total piece log-probability rather than replayed merges.
  *
  * Scope: vocabulary = all substrings up to [[MaxPiece]] chars with
  * weighted corpus count ≥ [[MinCount]] (single chars always kept so
  * every word is segmentable); score(p) = log2(cnt_p) − log2(Σ cnt) in
  * the IntegerLog2 1e6 fixed-point domain — the EM-pruning training
  * loop of the full algorithm is out of scope, but the inference DP
  * (the part every pipeline runs per token) is exact.
  *
  * Determinism: the DP state is the lexicographic pair
  * (max total score, then min piece count) — both components are
  * integers and the pair optimum is UNIQUE even when the optimal
  * segmentation isn't, so the gate needs no arbitrary tie-break. The
  * oracle reaches the same optimum by exhaustively enumerating all
  * segmentations with a recursive CTE (≤ 2^(L−1) paths over the tiny
  * word-types table — test-scale-true), while the Spark side runs the
  * O(L·MaxPiece) DP — scale-true.
  *
  * Scale: piece counting and scoring are hash aggregates over the
  * TYPES table (the same frequency-compressed surface BPE trains on).
  * The DP itself is one narrow fold per word with the vocabulary as a
  * broadcast map literal — vocab size is bounded IN CODE by
  * [[MaxVocab]]: multi-char pieces rank (count desc, piece) through a
  * TakeOrdered top-K (single-char pieces always kept — the
  * segmentability floor), so the caller's collect is a bounded model
  * artifact by construction, not by a comment about the corpus (the
  * MinCount filter alone stops bounding once type diversity grows
  * with the data). The cap is 100k — far above any gate vocabulary,
  * so gate hashes are the uncapped answer; the oracle applies the
  * identical LIMIT. Nothing shuffles.
  */
object UnigramLm {

  val MaxPiece = 4
  val MinCount = 5
  val MaxVocab = 100000

  /** Weighted substring counts over the types table — every start
    * position, lengths 1..MaxPiece, each occurrence contributing the
    * word's corpus count (overlaps counted, mirroring the oracle).
    */
  def pieceCounts(types: DataFrame): DataFrame =
    types.select(col("wcnt"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), st =>
        transform(
          sequence(lit(1), least(lit(MaxPiece), length(col("word")) - st + 1)),
          ln => col("word").substr(st, ln))))).as("piece"))
      .groupBy("piece").agg(sum("wcnt").as("pcnt"))

  /** MinCount-filtered, [[MaxVocab]]-capped vocabulary with 1e6-scaled
    * log2 scores (single-char pieces always kept — the segmentability
    * floor; multi-char pieces take the deterministic (count desc,
    * piece) top-K via TakeOrdered, the distributed top-k plan).
    */
  def vocabScores(pieces: DataFrame): DataFrame = {
    import graft.functions.IntegerLog2
    val kept = pieces.where(length(col("piece")) === 1)
      .unionByName(pieces
        .where(length(col("piece")) > 1 && col("pcnt") >= MinCount)
        .orderBy(desc("pcnt"), col("piece")).limit(MaxVocab))
    kept
      .crossJoin(broadcast(kept.agg(sum(col("pcnt")).as("t"))))
      .select(col("piece"),
        (IntegerLog2.log2s(col("pcnt")) - IntegerLog2.log2s(col("t")))
          .as("sc"))
  }

  /** Viterbi DP over every types row: returns (word, wcnt, cost_1e6,
    * n_pieces) — the unique lexicographic optimum (max score, then min
    * pieces). `scores` is the collected vocabulary (bounded; see
    * object scaladoc).
    *
    * DP fold: acc(i+1) = best state for the prefix of length i, as a
    * struct (c = cost, mn = −pieces) so `greatest` picks exactly the
    * lexicographic order the oracle's struct max uses. Out-of-range /
    * out-of-vocab candidates take a −2⁶² sentinel that can never win
    * (the single-char candidate is always valid).
    */
  def segmentTypes(types: DataFrame, scores: Map[String, Long]): DataFrame = {
    val vm = typedLit(scores)
    val sentinel = struct(lit(Long.MinValue / 2).as("c"), lit(0L).as("mn"))
    val len = length(col("word"))
    val best = aggregate(
      sequence(lit(1), len),
      array(struct(lit(0L).as("c"), lit(0L).as("mn"))),
      (acc, j) => {
        val cands = (1 to MaxPiece).map { k =>
          // piece = word chars (j-k, j]; prev = best state at j-k.
          // Indices clamp to stay in-domain when j < k; the when()
          // marks those candidates invalid before they can win.
          val piece = col("word").substr(greatest(j - k + 1, lit(1)), lit(k))
          val sc = element_at(vm, piece)
          val prev = element_at(acc, greatest(j - k + 1, lit(1)))
          when(j >= k && sc.isNotNull,
            struct((prev.getField("c") + sc).as("c"),
              (prev.getField("mn") - 1).as("mn")))
            .otherwise(sentinel)
        }
        concat(acc, array(greatest(cands: _*)))
      },
      acc => element_at(acc, len + 1))
    types.select(col("word"), col("wcnt"),
      best.getField("c").as("cost_1e6"),
      (-best.getField("mn")).as("n_pieces"))
  }
}
