package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed batch-wise with `mapPartitions` (the Scala
  * analog of a vectorized Python UDF: one iterator per partition, heavy
  * per-batch setup done once).
  *
  * The actual image/audio DECODE IS A STUB (`decodeStub`) — imaging
  * libraries are absent in this environment, so it computes a
  * deterministic fake (mean byte value + first-8-byte "frame samples").
  * Everything around it — binary schema, partition-wise batch iteration,
  * typed encoders, digesting, feature schema — is the real production
  * shape: swap `decodeStub` for a JNI/ImageIO decoder and nothing else
  * changes.
  *
  * Scale: a narrow map over binary blobs; at 100 TB the only knobs that
  * matter are input split size (`maxPartitionBytes` so a partition of
  * blobs fits in memory) and keeping the decode per-partition (library
  * init amortized), both honored here.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int, digest: String,
      mean_byte: Double, frame_samples: Seq[Int], thumb: Seq[Double])

  /** Deterministic fake decoder — replace with a real decoder off-stub.
    * Real signature preserved: bytes in, features out.
    */
  def decodeStub(content: Array[Byte]): (Double, Seq[Int]) = {
    val mean =
      if (content.isEmpty) 0.0
      else content.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / content.length
    val frames = content.take(8).map(b => (b & 0xff): Int).toSeq
    (mean, frames)
  }

  /** Resize analog: downsample the byte stream into `buckets` mean
    * values (the 1-D shape of an image resize / audio resample — this
    * one is REAL logic, not a stub: it's exactly what you'd do to a
    * PCM buffer or a decoded plane).
    */
  def resampleBytes(content: Array[Byte], buckets: Int): Seq[Double] = {
    if (content.isEmpty) return Seq.fill(buckets)(0.0)
    (0 until buckets).map { b =>
      val lo = (b.toLong * content.length / buckets).toInt
      val hi = math.max(((b + 1).toLong * content.length / buckets).toInt, lo + 1)
      val span = content.slice(lo, math.min(hi, content.length))
      if (span.isEmpty) 0.0
      else span.foldLeft(0L)((a, x) => a + (x & 0xff)).toDouble / span.length
    }
  }

  private def sha256Hex(md: MessageDigest, bytes: Array[Byte]): String =
    md.digest(bytes).map(b => f"$b%02x").mkString // digest() resets md

  /** Pack a text table into media records (binary column + metadata) —
    * stands in for reading real image/audio blobs.
    */
  def packFromText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/utf-8").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Batch feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition setup happens here once (decoder init in real
      // life; concretely: ONE MessageDigest per partition — a per-row
      // getInstance would do a JCA provider lookup on every record)
      val md = MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        val (mean, frames) = decodeStub(rec.content)
        MediaFeatures(rec.doc_id, rec.media_type, rec.content.length,
          sha256Hex(md, rec.content), mean, frames,
          resampleBytes(rec.content, buckets = 4))
      }
    }
  }
}
