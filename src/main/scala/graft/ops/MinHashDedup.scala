package graft.ops

import graft.ops.Persist.PersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection — the scale path for n-gram
  * Jaccard (Dedup.ngramJaccardPairs is the exact baseline; Broder's
  * MinHash is the classic sketch, Leskovec et al. MMDS ch.3 the banding
  * analysis).
  *
  * Per doc: k minhashes over the shingle set via affine permutations
  * h_i(x) = (a_i·x + b_i) mod p of a 64-bit base hash (xxhash64 — Spark's
  * codegen'd native hash; engine-specific, which is fine here because the
  * oracle for this operator is the exact-Jaccard output it must
  * reproduce, not a re-implementation of the hashes). Signatures are
  * banded; docs sharing any band bucket become candidates; candidates are
  * verified with EXACT set Jaccard. With r rows/band and b bands a pair
  * of true Jaccard j is caught with p = 1-(1-j^r)^b (r=4, b=32 ⇒
  * j=0.8 → p≈1-1e-10), and verification removes all false positives, so
  * on corpora whose near-dups sit above ~0.7 the output equals the exact
  * algorithm's — at a fraction of the join cost.
  *
  * Scale: signature build is a narrow map (k·|shingles| work, no
  * shuffle); the only shuffle is the band-bucket join, O(docs·b) rows
  * keyed by (band, bucket-hash), versus the full inverted index's
  * O(docs·|shingles|) with hot-shingle quadratic blowup.
  */
object MinHashDedup {

  // Mersenne prime 2^31-1: with 31-bit base hashes, a·x + b < 2^62 + 2^31
  // — no long overflow under ANSI arithmetic.
  private val P = 2147483647L

  /** Deterministic affine permutation constants (splitmix-style mixing of
    * the permutation index; no RNG state).
    */
  private def perm(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Math.floorMod(mix(2L * i), P - 1) + 1 // a ∈ [1, P-1]
    val b = Math.floorMod(mix(2L * i + 1), P)     // b ∈ [0, P-1]
    (a, b)
  }

  /** Base hashes: xxhash64 reduced MOD P so values land uniformly in
    * [0, P) and a·x + b never overflows a long. (A 31-bit mask would
    * include the value P itself, which is ≡ 0 mod P — a hash colliding
    * with 0 under every permutation, a small but real non-uniformity.)
    * Hash ONCE per shingle; the k permutations fold over the result
    * (`signatureFromHashes`) instead of re-hashing k times.
    */
  def baseHashes(shingleSet: Column): Column =
    transform(shingleSet, s => pmod(xxhash64(s), lit(P)))

  def signatureFromHashes(base: Column, k: Int): Column = {
    val mins = (0 until k).map { i =>
      val (a, b) = perm(i)
      array_min(transform(base, x => pmod(x * a + b, lit(P))))
    }
    array(mins: _*)
  }

  /** k-long minhash signature of a string-array column. */
  def signature(shingleSet: Column, k: Int): Column =
    signatureFromHashes(baseHashes(shingleSet), k)

  /** The permutation constants as arrays (for the native expression and
    * for specs pinning the spellings together).
    */
  def permConstants(k: Int): (Array[Long], Array[Long]) = {
    val ps = (0 until k).map(perm)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  /** Native-expression spelling: one codegen'd k×|shingles| loop per
    * row — a true narrow map, no explode, no aggregate, no shuffle.
    * Identical values to `signature` / `aggMinCols` (spec-pinned).
    */
  def signatureNative(shingleSet: Column, k: Int): Column = {
    val (a, b) = permConstants(k)
    graft.functions.LongArrayMinHash.minhash(baseHashes(shingleSet), a, b, P)
  }

  /** The k per-permutation `min` aggregate columns over a 31-bit base
    * hash column `h` — the codegen'd explode+aggregate spelling of
    * `signature` (SimilaritySpec pins the two spellings equal so the
    * permutation constants can never drift between them).
    */
  def aggMinCols(k: Int): Seq[Column] = (0 until k).map { i =>
    val (a, b) = perm(i)
    min(pmod(col("h") * a + b, lit(P))).as(s"m$i")
  }

  /** Candidate pairs + exact-Jaccard verification.
    * Output: (d1, d2, intersect_size, n1, n2, jaccard) for verified
    * jaccard ≥ threshold — same shape as Dedup.ngramJaccardPairs.
    *
    * The default threshold (0.7) sits INSIDE the banding scheme's
    * guaranteed-recall region for r=4/b=32 (survival ≈ 0.9998 at
    * j=0.7), where the exact-output contract the scaladoc above makes
    * actually holds; at 0.5 survival drops to ≈ 0.87 and pairs go
    * silently missing — callers lowering the threshold should widen the
    * banding to match (round-2 review finding: the old 0.5 default
    * contradicted the documented contract).
    *
    * Signatures are built with the native `LongArrayMinHash` expression
    * — a genuinely shuffle-free narrow map (round 1 exploded shingles
    * into a HashAggregate with k min buffers: codegen'd, but it paid a
    * doc_id exchange before banding; the per-row k·|shingles| loop is
    * the same, the shuffle is gone — the band-bucket join is now
    * candidate generation's ONLY shuffle). The interpreted array-fold
    * and explode-agg spellings remain as cross-checks, spec-pinned to
    * produce identical signatures.
    */
  def nearDupPairs(docs: DataFrame, n: Int = 2, threshold: Double = 0.7,
      k: Int = 128, bands: Int = 32): DataFrame = {
    val sh = Dedup.shingles(docs, n)
      .where(size(col("shingle_set")) > 0)
      .persistIntermediate
    // verify candidates with exact set Jaccard (shingle sets re-joined)
    bandCandidates(sh, k, bands)
      .join(sh.select(col("doc_id").as("d1"), col("shingle_set").as("s1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shingle_set").as("s2")), "d2")
      .withColumn("intersect_size", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("n1", size(col("s1")))
      .withColumn("n2", size(col("s2")))
      .withColumn("jaccard",
        col("intersect_size").cast("double") /
          (col("n1") + col("n2") - col("intersect_size")))
      .where(col("jaccard") >= threshold)
      .select("d1", "d2", "intersect_size", "n1", "n2", "jaccard")
  }

  /** Shared LSH candidate generation: band each doc's k-slot signature
    * into `bands` buckets (xxhash64 over each band's r = k/bands slots);
    * docs sharing any (band, bucket) key become an unordered candidate
    * pair. The band-bucket join is the ONLY shuffle — O(docs·bands)
    * rows — never all-pairs.
    */
  private def bandCandidates(sh: DataFrame, k: Int, bands: Int): DataFrame = {
    // hot-persisted: BOTH join sides scan the band rows — unpersisted,
    // the k×|shingles| signature kernel ran TWICE per doc (the
    // incremental path at [[incrementalNearDupPairs]] already persisted
    // its batch bands; this one-shot path didn't — r20 probe:
    // dedup_minhash_lsh 3.11 → 2.18 s at sf0.1/16 cpus). The frame is
    // three longs per (doc, band) — skinny either mechanism; columnar
    // cache measured best.
    val bandRows = bandRowsFromShingles(sh, k, bands).persistHotIntermediate
    val a = bandRows.as("a")
    val b = bandRows.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
  }

  /** (doc_id, band, bucket) rows from a shingle frame — the banded
    * signature derivation shared by the one-shot join and the
    * persistable [[bandIndex]].
    */
  private def bandRowsFromShingles(sh: DataFrame, k: Int,
      bands: Int): DataFrame = {
    require(k % bands == 0)
    val r = k / bands
    val sig = sh.select(col("doc_id"),
      signatureNative(col("shingle_set"), k).as("sig"))
    sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        val slice = (0 until r).map(j => element_at(col("sig"), b * r + j + 1))
        struct(lit(b).as("band"), xxhash64(slice: _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** The PERSISTABLE LSH index of a corpus: one (doc_id, band, bucket)
    * row per band per doc — O(docs·bands) rows, the exact join-side
    * shape candidate generation consumes. Write this to parquet
    * (partition by band for co-located probes) and the next batch
    * dedups against the corpus WITHOUT re-shingling or re-hashing it —
    * the production incremental-ingest contract
    * ([[incrementalNearDupPairs]]). The permutation constants are
    * deterministic (`perm`), so an index built today and a signature
    * built next month bucket identically at the same (k, bands).
    */
  def bandIndex(docs: DataFrame, n: Int = 2, k: Int = 128,
      bands: Int = 32): DataFrame =
    bandRowsFromShingles(
      Dedup.shingles(docs, n).where(size(col("shingle_set")) > 0), k, bands)

  /** Incremental near-dup detection of `newDocs` against a PRIOR
    * corpus represented by its persisted [[bandIndex]] — the common
    * production shape: per ingest batch, only the batch is shingled,
    * minhashed and banded (k·|shingles| work on batch rows ONLY), then
    * one (band, bucket) equi-join probes the index for cross-corpus
    * candidates plus a self-join for batch-internal ones. Emits every
    * pair (d1 < d2) with exact Jaccard ≥ threshold where AT LEAST ONE
    * side is a batch doc — exactly the new pairs a full-corpus rerun
    * would add, at batch-sized instead of corpus-sized hashing cost.
    *
    * `priorDocs` supplies the TEXT of prior docs for the exact-Jaccard
    * verification step, but only candidates' partners are touched: the
    * candidate ids semi-join `priorDocs` first, so re-shingling is
    * O(matched docs), not O(corpus). (A production index could instead
    * store each doc's shingle set or signature alongside its band rows
    * and skip the text fetch entirely; the verify-against-text shape
    * keeps the zero-false-positive contract of [[nearDupPairs]].)
    */
  def incrementalNearDupPairs(newDocs: DataFrame, index: DataFrame,
      priorDocs: DataFrame, n: Int = 2, threshold: Double = 0.7,
      k: Int = 128, bands: Int = 32): DataFrame = {
    val newSh = Dedup.shingles(newDocs, n)
      .where(size(col("shingle_set")) > 0)
      .persistIntermediate
    val newBands = bandRowsFromShingles(newSh, k, bands).persistIntermediate
    val a = newBands.as("a")
    // ONE probe join: the batch bands against (index ∪ batch bands) —
    // covers batch×prior in either id orientation AND batch×batch
    // (within-batch pairs emit in both orders; the least/greatest
    // normalization + dedupe collapses them). One join + one shuffle
    // where the two-join spelling (cross, within, union) paid three.
    val rhs = index.select("doc_id", "band", "bucket")
      .unionByName(newBands.select("doc_id", "band", "bucket"))
    val cands = a.join(rhs.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .dropDuplicates("d1", "d2")
    // exact-Jaccard verification: shingle only the prior docs that
    // actually appear in a candidate pair (semi-join), plus the batch
    val candIds = cands
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
    val priorSh = Dedup.shingles(
      priorDocs.join(candIds, Seq("doc_id"), "left_semi"), n)
    val allSh = newSh.select("doc_id", "shingle_set")
      .union(priorSh.select("doc_id", "shingle_set"))
      .dropDuplicates("doc_id")
    cands
      .join(allSh.select(col("doc_id").as("d1"), col("shingle_set").as("s1")), "d1")
      .join(allSh.select(col("doc_id").as("d2"), col("shingle_set").as("s2")), "d2")
      .withColumn("intersect_size", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("n1", size(col("s1")))
      .withColumn("n2", size(col("s2")))
      .withColumn("jaccard",
        col("intersect_size").cast("double") /
          (col("n1") + col("n2") - col("intersect_size")))
      .where(col("jaccard") >= threshold)
      .select("d1", "d2", "intersect_size", "n1", "n2", "jaccard")
  }

  /** MinHash CONTAINMENT dedup — the scale analogue of
    * Dedup.containmentPairs (the sketch sibling the exact operator's
    * scaladoc promises): catch C(A,B) = |A∩B|/|A| ≥ threshold without
    * ever forming all pairs.
    *
    * Asymmetry is the design driver. A small document wholly embedded
    * in a large one has HIGH containment but LOW Jaccard
    * (J = |A∩B|/|A∪B| ≈ |A|/|B|), so the Jaccard-tuned banding above
    * (r=4) would never collide the pair. Containment and Jaccard are
    * linked through the sizes — for C(A,B) ≥ t and size ratio
    * |B|/|A| ≤ R:  J ≥ t/(1 + R − t)  — so `bands` tunes the survival
    * knee to the corpus's size-ratio bound:
    *   - b=32 (r=4, the default): knee at J≈0.6 — right when sizes are
    *     near-equal (this corpus: ratio ≤ 1.1 ⇒ J floor 0.61 at
    *     t=0.8, survival ≈ 1−1e-16 for its actual J ≥ 0.9 pairs), and
    *     candidate volume stays tiny because weak pairs need J⁴ to
    *     collide;
    *   - b=64 (r=2): knee at J≈0.25 — catches ratio ≲ 4 embedded docs
    *     (survival 0.98 at the R=3/J=0.25 boundary, ≥ 1−1.5e-5 for
    *     J ≥ 0.4), at the cost of colliding weakly-similar pairs with
    *     probability 1−(1−J²)⁶⁴ (≈ 0.06 at J=0.03) — affordable only
    *     when the corpus doesn't pack thousands of same-vocabulary
    *     docs (measured here: 10.8 s vs 3 s at sf0.1, which is why the
    *     GATE runs b=32 and the wide config is spec-gated).
    * A signature-based containment-estimate prefilter is deliberately
    * NOT used to cut wide-banding candidates: Ĉ = Ĵ(n1+n2)/((1+Ĵ)n1)
    * amplifies Ĵ's sampling error by the size ratio (σ(Ĉ) ≈ 0.2 for a
    * ratio-5 pair at k=128), so any safe margin admits all the noise
    * it would prune. LSH-Ensemble-style size-stratified banding is the
    * principled upgrade when |B|/|A| is unbounded.
    * Candidates verify with EXACT set containment, so false positives
    * never ship — like nearDupPairs, the output at the gated threshold
    * equals the exact operator's.
    *
    * Output: one ORDERED row per (d1 ⊂-ish d2) direction over the
    * threshold — same shape and semantics as Dedup.containmentPairs.
    */
  def containmentPairs(docs: DataFrame, n: Int = 2, threshold: Double = 0.8,
      k: Int = 128, bands: Int = 32): DataFrame = {
    val sh = Dedup.shingles(docs, n)
      .where(size(col("shingle_set")) > 0)
      .persistIntermediate
    val unordered = bandCandidates(sh, k, bands)
      .join(sh.select(col("doc_id").as("d1"), col("shingle_set").as("s1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shingle_set").as("s2")), "d2")
      .withColumn("intersect_size",
        size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .select("d1", "d2", "intersect_size", "n1", "n2")
    // each unordered candidate fans out to its two directed rows, then
    // the exact-containment filter keeps whichever direction clears t
    val both = unordered.unionByName(unordered.select(
      col("d2").as("d1"), col("d1").as("d2"),
      col("intersect_size"), col("n2").as("n1"), col("n1").as("n2")))
    val contain = col("intersect_size").cast("double") / col("n1")
    both.where(contain >= threshold)
      .select(col("d1"), col("d2"), col("intersect_size"),
        col("n1"), col("n2"), contain.as("containment"))
  }
}
