package graft.streaming

import graft.TestSpark
import graft.queries.{RefQueries, StreamQueries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MemoryStream event in the gated table's own spelling: `ts` is the
  * nano-long the testdata parquet surfaces under `nanosAsLong`, so the
  * streaming frames exercise the same [[EventAnalytics.withEventTime]]
  * arm the driver-gated batch queries run through.
  */
final case class MsEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

/** True micro-batch parity against the DRIVER-GATED batch frames.
  *
  * StreamingSpec drives the same transforms through the file-stream
  * source; this spec removes the file system from the loop entirely:
  * MemoryStream gives exact, driver-controlled micro-batch boundaries
  * (one `addData` + `processAllAvailable` per batch), so the
  * batch-boundary behavior of stateful operators is pinned
  * deterministically — and the comparison target is the LITERAL gated
  * frame (`StreamQueries.streamWindowAgg` / `streamSessionize` over
  * the gate's sf0.01 events), not a re-derivation, so batch/stream
  * parity of the gate surface itself can never silently drift.
  */
class MemoryStreamParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The gate's event corpus, in stream order, split into three
    * micro-batches. Chunks are GLOBALLY time-ordered, which keeps each
    * user's events time-ordered ACROSS batches (the stateful fold
    * sorts within a batch only — cross-batch disorder is the
    * watermark-buffer variant's job, exercised in StreamingSpec).
    */
  private lazy val chunks: Seq[Seq[MsEvent]] = {
    import spark.implicits._
    val evs = RefQueries.table(spark, TestSpark.Sf001, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[MsEvent].collect().toSeq
      .sortBy(e => (e.ts, e.event_id))
    evs.grouped((evs.length + 2) / 3).toSeq
  }

  test("MemoryStream micro-batches: hourlyByType == the gated batch frame") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[MsEvent]
    val q = EventAnalytics.hourlyByType(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("ms_hourly")
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(q.lastProgress.batchId >= 2,
        "three addData rounds must run as separate micro-batches")
    } finally q.stop()

    val got = spark.table("ms_hourly")
    val want = StreamQueries.streamWindowAgg(spark, TestSpark.Sf001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "MemoryStream complete-mode result differs from the gated batch frame")
  }

  test("MemoryStream micro-batches: sessionizeStream == the gated batch frame") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[MsEvent]
    val q = EventAnalytics.sessionizeStream(spark, input.toDF(), gapMinutes = 240)
      .writeStream.outputMode("append")
      .format("memory").queryName("ms_sessions")
      .start()
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      chunks.foreach { c =>
        input.addData(c)
        q.processAllAvailable()
        perBatch += spark.table("ms_sessions").count()
      }
    } finally q.stop()

    // sessions must close in MORE THAN ONE micro-batch (emission is
    // incremental, not an end-of-stream flush)
    assert(perBatch.head > 0L && perBatch.last > perBatch.head,
      s"expected incremental emission across batches, got $perBatch")

    // at least one emitted session STRADDLES the first batch boundary —
    // the open-session state demonstrably carried across micro-batches
    val b1EndUs = chunks.head.last.ts / 1000L
    val straddling = spark.table("ms_sessions")
      .where(col("start_us") <= b1EndUs && col("end_us") > b1EndUs)
      .count()
    assert(straddling > 0L,
      "no emitted session spans the batch-1 boundary — state did not carry")

    // the emitted set == the gated batch frame minus each user's final
    // (never-closed) session. sum_value is compared via n_events and
    // boundaries only: the stream folds doubles in arrival order while
    // the gated frame sums through the exact decimal path — boundary
    // and count equality is the semantic contract (same events in the
    // same sessions); StreamingSpec's timeout variant covers the rest.
    val gated = StreamQueries.streamSessionize(spark, TestSpark.Sf001)
    val wantClosed = gated
      .withColumn("last_seq",
        max("session_seq").over(Window.partitionBy("user_id")))
      .where(col("session_seq") < col("last_seq"))
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"), col("n_events"))
    val got = spark.table("ms_sessions")
      .select(col("user_id"), col("session_seq"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
    assert(got.exceptAll(wantClosed).isEmpty && wantClosed.exceptAll(got).isEmpty,
      "MemoryStream sessionization differs from the gated batch frame")
  }
}
