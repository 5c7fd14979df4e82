package graft

import org.apache.spark.sql.SparkSession

/** Dev-only isolated-query timing main (not part of the library):
  * median-of-3 per named gate query against sf0.1, cache cleared
  * between runs — the bench's per-query methodology without the sweep.
  */
object ScratchTail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_clusters_star", "dedup_containment",
        "corpus_quality_ensemble", "dedup_sketch_eval", "dedup_clusters",
        "dedup_incremental_index", "dedup_ngram_jaccard",
        "dedup_containment_minhash", "graph_copurchase",
        "corpus_split_leakage", "corpus_curate", "dedup_minhash_lsh",
        "corpus_pipeline_manifest", "dedup_cross_source",
        "corpus_perplexity_filter", "sim_dbscan_bucketed_agreement")
    for (n <- names) {
      val q = SparkEntry.queries(n)
      val ts = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[tail] $n%-34s ${ts(1)}%.2f s  (min ${ts.head}%.2f)")
    }
  }
}
