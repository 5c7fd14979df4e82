package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-timing scratch main (not part of the library). */
object Scratch {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = queries.RefQueries.table(spark, sf, "documents")
    noop(docs) // warm
    for (_ <- 1 to 2) {
      time("scan only") { noop(docs.select("doc_id", "text")) }
      time("tokenize") {
        noop(docs.select(col("doc_id"), ops.TextOps.tokens(col("text")).as("t")))
      }
      time("tokenize+size") {
        noop(docs.select(col("doc_id"), size(ops.TextOps.tokens(col("text"))).as("n")))
      }
      time("full shingles") {
        noop(ops.Dedup.shingles(docs, 2))
      }
      spark.catalog.clearCache(); System.gc()
    }
  }
}
