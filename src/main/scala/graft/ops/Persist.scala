package graft.ops

import org.apache.spark.sql.Dataset

/** Intermediate-result persistence policy — the ONE place the engine
  * decides how a reused per-query frame is pinned.
  *
  * The doctrine (settled rounds 14/15): per-query reused frames persist
  * via LAZY `localCheckpoint(false)`. The blocks belong to the
  * checkpointed RDD, so the ContextCleaner frees them when the plan's
  * frames are garbage-collected — long-lived sessions accumulate
  * nothing and owe no `clearCache()`. What that buys in hygiene it
  * costs in TWO documented ways:
  *
  *   1. '''Fault tolerance''': a locally-checkpointed RDD has truncated
  *      lineage stored on the executors that computed it. An executor
  *      loss — or a dynamic-allocation decommission, which Spark's own
  *      docs call out as unsafe with localCheckpoint — fails the query
  *      instead of recomputing the lost partitions. On a static-executor
  *      cluster (and in `local[n]`, where executor loss is process
  *      death) this risk is zero-to-moot; under
  *      `spark.dynamicAllocation.enabled` it is real.
  *   2. '''Re-scan speed''': checkpoint blocks hold row-format
  *      partitions, while `cache()` stores codegen-friendly columnar
  *      batches — measured on `graph_copurchase` (round 16, isolated
  *      5-run medians at matched calibration): 2.7–3.0 s cached vs
  *      3.4–3.7 s locally checkpointed at sf0.1, a ~20 % tax on that
  *      re-scan-heavy self-join.
  *
  * [[intermediate]] makes the trade config-gated instead of hard-coded:
  * `spark.graft.persist.intermediate` picks the mechanism, and the
  * default `auto` resolves by environment — reliable `checkpoint()`
  * when dynamic allocation is on and a checkpoint dir is set, `cache()`
  * when dynamic allocation is on without one (lineage stays intact, so
  * decommissioned blocks recompute; the caller owns `clearCache`), and
  * the doctrine's `localCheckpoint(false)` everywhere else — which
  * keeps every existing single-JVM deployment (gate, bench, tests)
  * byte-identical in behavior.
  *
  * SCOPE: reuse-purpose persistence only. The EAGER
  * `localCheckpoint(true)` calls inside iterative operators
  * (ConnectedComponents, SCC, MST, label propagation …) are
  * lineage-TRUNCATION, not reuse — `cache()` is not a valid substitute
  * there (a cached plan still nests every prior round's lineage, and
  * the plan blow-up returns), so truncation has its own helper,
  * [[truncate]], with its own smaller mode space (local | reliable —
  * no cache leg, because caching does not truncate). Its `auto`
  * upgrades to reliable `checkpoint()` exactly when dynamic allocation
  * is on AND `spark.checkpoint.dir` points at durable storage — the
  * conf-only contract PORTING.md promises (r17: before [[truncate]],
  * the in-loop sites called `localCheckpoint` unconditionally and the
  * promised conf was never read, so dynamic-allocation deployments
  * following the doc still failed on decommission). Everywhere else —
  * every static-executor deployment, the gate, the bench, the tests —
  * it resolves to the doctrine's `localCheckpoint(eager)`,
  * byte-identical to the pre-r17 spelling.
  */
object Persist {

  /** Conf key selecting the [[intermediate]] mechanism:
    * `auto` (default) | `local` | `cache` | `reliable` | `none`.
    */
  val ModeKey = "spark.graft.persist.intermediate"

  /** Persist a frame that the returned plan will scan more than once.
    * Lazy in every mode: materialization happens on the plan's first
    * execution, never here.
    */
  def intermediate[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val mode = spark.conf.get(ModeKey, "auto")
    val resolved = mode match {
      case "auto" =>
        // dynamicAllocation.enabled is a core (launch-time) conf —
        // readable here, but never mutable through RuntimeConfig, which
        // is why the resolution rule is the separate pure
        // [[autoResolve]] (spec-pinned without a dynamic cluster)
        autoResolve(
          dyn = spark.conf
            .get("spark.dynamicAllocation.enabled", "false").toBoolean,
          hasCheckpointDir =
            spark.sparkContext.getCheckpointDir.isDefined)
      case m => m
    }
    resolved match {
      case "local" => ds.localCheckpoint(eager = false)
      case "cache" => ds.cache()
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            s"$ModeKey=reliable needs spark.checkpoint.dir (durable " +
              "storage) — set it, or use cache/local")
        // Spark's standard checkpoint costs apply and are the
        // deliberate price of loss-safety here: the checkpoint-write
        // job recomputes the upstream once beyond the first action
        // (the classic persist-before-checkpoint advice — a caller
        // that wants to amortize it pre-caches and clears explicitly),
        // and the written files are owned by spark.checkpoint.dir
        // retention (set spark.cleaner.referenceTracking
        // .cleanCheckpoints, or purge the dir) — release() cannot and
        // does not delete them.
        ds.checkpoint(eager = false)
      case "none" => ds
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey=$other — expected auto|local|cache|reliable|none")
    }
  }

  /** Persist a HOT RE-SCAN frame — one whose stored blocks the same
    * plan scans two or more times (both sides of a self-join, a
    * verify pass over candidate pairs re-reading the indexed frame).
    * Same contract and ModeKey as [[intermediate]] — an EXPLICIT
    * (non-`auto`) mode wins for both helpers, so a deployment can
    * still force the whole engine onto one mechanism — but `auto` on
    * STATIC executors resolves `cache()` instead of the doctrine's
    * `localCheckpoint(false)`: cache stores codegen-friendly COLUMNAR
    * batches while local-checkpoint blocks hold row-format partitions
    * (the 20% copurchase tax measured in r16, scaladoc above), and on
    * the re-scan-heavy operators the gap is larger still — r20
    * isolated 5-run medians at sf0.1/16 cpus: dedup_ngram_jaccard
    * 3.79 → 1.82 s, dedup_containment 3.09 → 1.99 s, graph_copurchase
    * 3.27 → 1.95 s. The price is exactly the hygiene the doctrine
    * bought: a cache entry belongs to the CacheManager and is freed
    * by [[release]]/`clearCache`, not by the ContextCleaner when the
    * frame is GC'd, so a long-lived session that never clears the
    * cache accumulates one entry per operator invocation (the r13
    * leak class; Bench and Verify clear per query, and the existing
    * direct `.cache()` sites in GraphQueries carry the same
    * ownership). Because the same r20 A/B measured the minhash-band
    * frames 15–30% SLOWER under cache (dedup_containment_minhash
    * 2.45 → 3.22 s, dedup_cross_source 2.65 → 3.31 s), hot is a
    * PER-SITE, measurement-backed choice — never a blanket one; sites
    * stay on [[intermediate]] unless the cache spelling measured
    * faster there. Dynamic-allocation resolution is unchanged
    * (reliable with a checkpoint dir, else cache).
    */
  def intermediateHot[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.get(ModeKey, "auto") match {
      case "auto" =>
        val resolved = hotAutoResolve(
          dyn = spark.conf
            .get("spark.dynamicAllocation.enabled", "false").toBoolean,
          hasCheckpointDir =
            spark.sparkContext.getCheckpointDir.isDefined)
        resolved match {
          case "cache" => ds.cache()
          case "local" => ds.localCheckpoint(eager = false)
          case "reliable" => ds.checkpoint(eager = false)
        }
      case _ => intermediate(ds) // explicit mode: one rule for all sites
    }
  }

  /** The [[intermediateHot]] `auto` rule, as data: static executors →
    * columnar `cache()` (re-scan speed; caller/session owns cleanup);
    * dynamic allocation → exactly [[autoResolve]]'s legs.
    */
  private[ops] def hotAutoResolve(dyn: Boolean,
      hasCheckpointDir: Boolean): String =
    if (!dyn) "cache" else autoResolve(dyn, hasCheckpointDir)

  /** The `auto` rule, as data: static executors → the doctrine's
    * localCheckpoint; dynamic allocation → reliable checkpoint when
    * durable storage is configured, else lineage-preserving cache()
    * (decommissioned blocks recompute; the caller owns `clearCache`).
    *
    * The cache() leg re-accepts the obligation the doctrine was built
    * to remove: most reuse sites' frames outlive the operator call (the
    * returned plan references them), so the engine cannot release them
    * itself, and a long-lived dynamic-allocation session that never
    * clears the cache accumulates one entry per query invocation
    * (exactly the r13 leak class). That is the documented trade against
    * failing queries on decommission — a deployment that wants neither
    * sets `spark.checkpoint.dir` (→ reliable) or accepts recompute with
    * mode=none.
    */
  private[ops] def autoResolve(dyn: Boolean,
      hasCheckpointDir: Boolean): String =
    if (!dyn) "local"
    else if (hasCheckpointDir) "reliable"
    else "cache"

  /** Free the storage behind a frame returned by [[intermediate]],
    * whatever mechanism the knob picked. `Dataset.unpersist` alone is
    * NOT enough: it goes through the CacheManager and never releases
    * checkpoint blocks (they belong to the underlying `LogicalRDD`'s
    * RDD), while the Bridge checkpoint-block path never sees a
    * CacheManager entry — so a caller that pairs its persist with an
    * explicit free must release through this helper or leak under the
    * other mode. Covers `local` (block-manager RDD blocks), `cache`
    * (CacheManager entry), and is a safe no-op for `none`/`reliable`
    * (reliable-checkpoint files are owned by `spark.checkpoint.dir`
    * retention, not the block manager). Caller contract is inherited
    * from both mechanisms: the frame must never be evaluated again.
    */
  def release[T](ds: Dataset[T]): Unit = {
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(ds)
    ds.unpersist(blocking = false)
    ()
  }

  /** Conf key selecting the [[truncate]] mechanism:
    * `auto` (default) | `local` | `reliable`.
    */
  val TruncateModeKey = "spark.graft.persist.truncate"

  /** Truncate a frame's lineage — the iterative operators' in-loop
    * mechanism (each round's plan must not nest every prior round's).
    * `eager = true` materializes now (the loop-body contract: the
    * round's rows exist before the next round plans over them);
    * `eager = false` is the lazy variant for loop-internal frames whose
    * first action materializes them.
    *
    * Mode space is deliberately smaller than [[intermediate]]'s:
    * `cache()` is NOT a valid truncation (a cached plan still nests the
    * full lineage and the per-round plan blow-up returns), so the only
    * legs are the doctrine's `localCheckpoint(eager)` and reliable
    * `checkpoint(eager)`. `auto` resolves reliable exactly when dynamic
    * allocation is enabled AND `spark.checkpoint.dir` is set (see
    * [[truncateAutoResolve]]) — which makes PORTING.md's "point
    * spark.checkpoint.dir at durable storage for loss-safe iteration"
    * a true conf-only contract. On dynamic allocation WITHOUT a
    * checkpoint dir the resolution stays local and the loss-on-
    * decommission risk stands — documented, since no loss-safe
    * truncation exists without durable storage.
    *
    * THE RELIABLE LEG'S TWO OPERATIONAL COSTS (r17 review):
    *
    *   1. '''Retention''': loops write one checkpoint per round and
    *      [[release]]/Bridge cleanup are deliberate no-ops for
    *      reliable files — a reliable-truncation deployment MUST set
    *      `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the
    *      ContextCleaner then deletes each round's files once its
    *      frame is GC'd) or own `spark.checkpoint.dir` retention,
    *      exactly as [[intermediate]]'s reliable leg documents.
    *      Without either, a long iterative session fills the dir
    *      linearly in total rounds.
    *   2. '''Double compute''': `Dataset.checkpoint` does not persist
    *      before the checkpoint-write job, so a bare eager checkpoint
    *      computes each round's plan twice. The eager leg below
    *      mitigates with the standard persist-before-checkpoint
    *      sandwich (persist → checkpoint → unpersist); the LAZY leg
    *      cannot (the write happens at some later action, after which
    *      this method has long returned) and pays the documented
    *      one-extra-compute, the same price [[intermediate]]'s
    *      reliable leg accepts.
    */
  def truncate[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    val resolved = spark.conf.get(TruncateModeKey, "auto") match {
      case "auto" => truncateAutoResolve(
        dyn = spark.conf
          .get("spark.dynamicAllocation.enabled", "false").toBoolean,
        hasCheckpointDir = spark.sparkContext.getCheckpointDir.isDefined)
      case m => m
    }
    resolved match {
      case "local" => ds.localCheckpoint(eager)
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            s"$TruncateModeKey=reliable needs spark.checkpoint.dir " +
              "(durable storage) — set it, or use local")
        if (eager) {
          // persist-before-checkpoint: the materializing job fills the
          // cache, the checkpoint-write job reads it back instead of
          // recomputing the round's whole plan (scaladoc cost 2)
          ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val out = ds.checkpoint(eager = true)
          ds.unpersist(blocking = false)
          out
        } else ds.checkpoint(eager = false)
      case other =>
        throw new IllegalArgumentException(
          s"$TruncateModeKey=$other — expected auto|local|reliable")
    }
  }

  /** The [[truncate]] `auto` rule, as data: reliable checkpoint only
    * when BOTH dynamic allocation is on (executor decommission makes
    * localCheckpoint blocks unrecoverable) and a checkpoint dir exists
    * (there is nowhere durable to write otherwise).
    */
  private[ops] def truncateAutoResolve(dyn: Boolean,
      hasCheckpointDir: Boolean): String =
    if (dyn && hasCheckpointDir) "reliable" else "local"

  /** `frame.persistIntermediate` chaining syntax for [[intermediate]]. */
  implicit final class PersistOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistIntermediate: Dataset[T] = intermediate(ds)

    /** `frame.persistHotIntermediate` syntax for [[intermediateHot]]. */
    def persistHotIntermediate: Dataset[T] = intermediateHot(ds)

    /** `frame.truncateLineage(eager)` syntax for [[truncate]]; the
      * no-arg default mirrors `Dataset.localCheckpoint()`'s eagerness.
      */
    def truncateLineage(eager: Boolean = true): Dataset[T] =
      truncate(ds, eager)
  }
}
