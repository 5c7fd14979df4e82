package graft.streaming

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True Structured Streaming execution: the SAME hourly aggregation that
  * the driver gate checks in batch, run through readStream → window agg →
  * memory sink, must produce identical results. Watermark + append mode
  * is exercised separately with two micro-batches so late state actually
  * closes.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // readStream needs a directory containing only the events file
  private def eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events")
    Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      Paths.get(s"${TestSpark.Sf001}/events.parquet"))
    dir.toString
  }

  test("streaming hourly agg (complete mode) == batch hourly agg") {
    val stream = EventAnalytics.readEventsStream(spark, eventsDir)
    val q = EventAnalytics.hourlyByType(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("hourly_out")
    val want = EventAnalytics.hourlyByType(
      spark.read.parquet(s"${TestSpark.Sf001}/events.parquet"))
    assert(got.count() == 3385L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming result differs from batch result")
  }

  // the file stream source lists flat files only — stage each micro-batch
  // as a single parquet FILE in the watched dir (not a .parquet directory)
  private def stageBatch(df: org.apache.spark.sql.DataFrame, watched: String,
      name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, Paths.get(s"$watched/$name"))
  }

  test("flatMapGroupsWithState sessionization matches batch sessionize") {
    import org.apache.spark.sql.functions._
    val stream = EventAnalytics.readEventsStream(spark, eventsDir)
    val q = EventAnalytics.sessionizeStream(spark, stream, gapMinutes = 240)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()

    // one micro-batch → every session except each user's final open one
    // is emitted; compare boundaries to the batch computation
    val batch = EventAnalytics.sessionize(
        spark.read.parquet(s"${TestSpark.Sf001}/events.parquet"), 240)
      .withColumn("last_seq",
        max("session_seq").over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .where(col("session_seq") < col("last_seq"))
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"), col("n_events"))
    val got = spark.table("sessions_out")
      .select(col("user_id"), col("session_seq"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stateful streaming sessions differ from batch sessions")
  }

  test("watermark + append mode emits closed windows across micro-batches") {
    val dir = Files.createTempDirectory("graft-events-2")
    val all = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet")
      .orderBy("ts").cache()
    val n = all.count()
    // batch 1: first half (early event time), batch 2: second half
    stageBatch(all.limit((n / 2).toInt), dir.toString, "b1.parquet")

    val stream = EventAnalytics.readEventsStream(spark, dir.toString)
    val q = EventAnalytics.hourlyByTypeStream(stream, "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_append")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("hourly_append").count()
      // second micro-batch advances the watermark past batch-1 windows
      stageBatch(all.exceptAll(all.limit((n / 2).toInt)), dir.toString, "b2.parquet")
      q.processAllAvailable()
      val afterB2 = spark.table("hourly_append").count()
      val want = EventAnalytics.hourlyByType(all)
      // batch 1 emits only windows older than watermark (max(b1) - 2h);
      // the last ≥2 hours of batch-1 windows must still be open
      val b1Windows = EventAnalytics.hourlyByType(all.limit((n / 2).toInt)).count()
      assert(afterB1 > 0L && afterB1 < b1Windows,
        s"expected partial emission after batch 1, got $afterB1 of $b1Windows")
      assert(afterB2 > afterB1, "advancing event time must close more windows")
      // emitted rows must agree with the batch computation
      assert(spark.table("hourly_append").exceptAll(want).isEmpty,
        "append-mode rows must be a subset of the batch result")
    } finally q.stop()
  }
}
