package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed batch-wise with `mapPartitions` (the Scala
  * analog of a vectorized Python UDF: one iterator per partition, heavy
  * per-batch setup done once).
  *
  * Decode dispatches on `media_type`: PPM images and RIFF/WAVE PCM
  * audio get REAL byte-arithmetic decoders, and PNG/JPEG/BMP/GIF get a
  * REAL raster decode through the JDK's javax.imageio (see MediaCodecs)
  * — luminance plane / requantized samples feed the same feature math.
  * Only types that need a codec outside the JDK (MP3, H.264) fall to
  * `decodeStub`, a clearly-marked deterministic fake; malformed input
  * of any decodable type also falls back rather than throwing (a decode
  * error must never kill a 100 TB scan). Everything around the decoders
  * — binary schema, partition-wise batch iteration, typed encoders,
  * digesting, feature schema — is the production shape: a JNI codec is
  * one more dispatch arm.
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

  /** Same bucket arithmetic over an already-decoded value plane
    * (luminance pixels, requantized samples).
    */
  def resampleValues(values: Array[Int], buckets: Int): Seq[Double] = {
    if (values.isEmpty) return Seq.fill(buckets)(0.0)
    (0 until buckets).map { b =>
      val lo = (b.toLong * values.length / buckets).toInt
      val hi = math.max(((b + 1).toLong * values.length / buckets).toInt, lo + 1)
      val span = values.slice(lo, math.min(hi, values.length))
      if (span.isEmpty) 0.0
      else span.foldLeft(0L)((a, x) => a + x).toDouble / span.length
    }
  }

  /** REAL 2-D image resize: box-filter (area-average) downsample of a
    * row-major value plane to outW×outH. Each output pixel is the
    * integer-floor mean of its source block [ox·w/outW, (ox+1)·w/outW) ×
    * [oy·h/outH, (oy+1)·h/outH); the `max(…, +1)` guard keeps blocks
    * non-empty when the output is larger than the input along an axis
    * (degenerating to nearest-neighbor there), the same arithmetic as
    * the 1-D resample above so the SQL oracle can restate it. Pure
    * integer math — no float accumulation, bit-stable across engines.
    */
  def resizePlane(plane: Array[Int], w: Int, h: Int, outW: Int, outH: Int): Array[Int] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0 && plane.length >= w * h,
      s"bad resize geometry: ${plane.length} as ${w}x$h -> ${outW}x$outH")
    val out = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = (oy.toLong * h / outH).toInt
      val y1 = math.max(((oy + 1).toLong * h / outH).toInt, y0 + 1)
      var ox = 0
      while (ox < outW) {
        val x0 = (ox.toLong * w / outW).toInt
        val x1 = math.max(((ox + 1).toLong * w / outW).toInt, x0 + 1)
        var s = 0L
        var c = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += plane(y * w + x); c += 1; x += 1 }
          y += 1
        }
        out(oy * outW + ox) = (s / c).toInt
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Fractional-rate LINEAR resampling of a 1-D sample plane to exactly
    * `m` samples — the audio sibling of resizePlane's box filter, for
    * rate conversions where the ratio isn't integer (44.1k→16k style).
    * Endpoint-anchored: output i sits at source position i·(n−1)/(m−1),
    * so out(0)=plane(0) and out(m−1)=plane(n−1). All arithmetic is
    * non-negative integer — the two neighbor weights (m−1−frac, frac)
    * sum to m−1, so the weighted sum divides by m−1 with a plain floor
    * and no signed-division truncation seam cross-engine (the trap the
    * `s[i+1]−s[i]` delta spelling would hit).
    */
  def resampleLinear(plane: Array[Int], m: Int): Array[Int] = {
    val n = plane.length
    require(n >= 2 && m >= 2, s"resampleLinear needs n>=2, m>=2; got n=$n m=$m")
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      val num = i.toLong * (n - 1)
      val idx = (num / (m - 1)).toInt
      val frac = num % (m - 1)
      val a = plane(idx)
      // frac == 0 zeroes the second weight, so the clamp only guards
      // the array read at the exact endpoint, never changes the value
      val b = plane(math.min(idx + 1, n - 1))
      out(i) = ((a * (m - 1 - frac) + b * frac) / (m - 1)).toInt
      i += 1
    }
    out
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

  /** media_type → decoded value plane; None means "no real decoder or
    * malformed input" and selects the stub path.
    */
  private def decodePlane(raster: MediaCodecs.RasterDecoder,
      mediaType: String, content: Array[Byte]): Option[Array[Int]] =
    mediaType match {
      case "image/ppm" => MediaCodecs.decodePpmLuma(content)
      case "audio/wav" => MediaCodecs.decodeWavBytes(content)
      case "image/png" | "image/jpeg" | "image/bmp" | "image/gif" =>
        raster.decodeLuma(content)
      case _ => None
    }

  /** Batch feature extraction over the binary column. n_bytes/digest
    * always describe the raw CONTAINER bytes; mean/frames/thumb come
    * from the decoded plane when a real decoder matched (PPM luminance,
    * WAV requantized PCM), else from the stub over raw bytes.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    // Decode is CPU-bound; a small gated input arrives as ONE parquet
    // split and would otherwise decode on one core. Fan narrow inputs
    // out to core count; inputs already wider than that (the 100 TB
    // case — thousands of splits) pass through untouched, no shuffle.
    val par = spark.sparkContext.defaultParallelism
    val balanced =
      if (media.rdd.getNumPartitions < par) media.repartition(par) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      // per-partition setup happens here once: ONE MessageDigest (a
      // per-row getInstance would do a JCA provider lookup on every
      // record) and ONE RasterDecoder (per-row ImageIO.read pays a
      // registry scan + a temp-FILE-backed stream cache per image —
      // see RasterDecoder's scaladoc; this halved the gated PNG query)
      val md = MessageDigest.getInstance("SHA-256")
      val raster = new MediaCodecs.RasterDecoder
      it.map { rec =>
        val (mean, frames, thumb) = decodePlane(raster, rec.media_type, rec.content) match {
          case Some(vals) =>
            val m =
              if (vals.isEmpty) 0.0
              else vals.foldLeft(0L)((a, x) => a + x).toDouble / vals.length
            (m, vals.take(8).toSeq, resampleValues(vals, buckets = 4))
          case None =>
            val (m, f) = decodeStub(rec.content)
            (m, f, resampleBytes(rec.content, buckets = 4))
        }
        MediaFeatures(rec.doc_id, rec.media_type, rec.content.length,
          sha256Hex(md, rec.content), mean, frames, thumb)
      }
    }
  }
}
