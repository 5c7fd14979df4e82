package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary pack + mapPartitions feature extraction round-trips") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, ""), (3L, "zz")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.packFromText(docs))
      .collect().sortBy(_.doc_id)

    assert(feats.map(_.n_bytes).toSeq == Seq(3, 0, 2))
    // 'a'=97 'b'=98 'c'=99 → mean 98; frame samples are the raw bytes
    assert(feats(0).mean_byte == 98.0)
    assert(feats(0).frame_samples == Seq(97, 98, 99))
    assert(feats(1).mean_byte == 0.0 && feats(1).frame_samples.isEmpty)
    // resize analog: 4-bucket byte resample; empty content → zeros
    assert(feats(0).thumb.length == 4)
    assert(feats(1).thumb == Seq(0.0, 0.0, 0.0, 0.0))
    // "abc" (97,98,99) over 4 buckets → bucket means 97,97.5?,98,99 stay
    // in [97,99] and are ordered
    assert(feats(0).thumb.forall(v => v >= 97.0 && v <= 99.0))
    // digest matches the well-known sha256("abc")
    assert(feats(0).digest ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(feats.forall(_.media_type == "text/utf-8"))
  }

  test("features on sf0.001 documents: 500 rows, deterministic digests") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val a = Multimodal.extractFeatures(spark, Multimodal.packFromText(docs))
      .toDF().orderBy("doc_id").collect()
    val b = Multimodal.extractFeatures(spark, Multimodal.packFromText(docs))
      .toDF().orderBy("doc_id").collect()
    assert(a.length == 500 && a.sameElements(b))
  }
}
