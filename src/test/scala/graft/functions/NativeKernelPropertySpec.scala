package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels against independent reference
  * computations on ADVERSARIAL generated inputs (empty arrays, length
  * mismatches, extreme values) — the corpus-based specs only cover the
  * shapes the testdata happens to contain. Same deterministic
  * fixed-seed sampling pattern as ScrubPropertySpec.
  */
class NativeKernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // quantized-embedding-scale values: |x| ≤ 1e5 keeps 64-dim dots < 2^53
  private val vecGen: Gen[Seq[Long]] =
    Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L)).map(_.toSeq))

  test("dot product equals the scalar reference on arbitrary pairs") {
    val pairs = samples(Gen.zip(vecGen, vecGen), 300)
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), LongArrayDot.dotQ(col("a"), col("b")).as("d"))
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(r.getLong(2) == want, s"dot($a, $b)")
    }
  }

  test("bitmap AND+popcount equals set intersection on arbitrary bit sets") {
    val setGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.toSet))
    def pack(s: Set[Int]): Seq[Long] =
      (0 until 4).map(w => s.filter(i => i / 64 == w)
        .foldLeft(0L)((acc, i) => acc | (1L << (i % 64))))
    val pairs = samples(Gen.zip(setGen, setGen), 300)
    val df = pairs.map { case (x, y) => (pack(x), pack(y), x.intersect(y).size.toLong) }
      .toDF("a", "b", "want")
      .select(LongArrayAndPopcount.popcountAnd(col("a"), col("b")).as("got"), col("want"))
    assert(df.where(col("got") =!= col("want")).isEmpty)
  }

  test("minhash kernel equals a scalar reference on arbitrary hash arrays") {
    val P = 2147483647L
    val (a, b) = graft.ops.MinHashDedup.permConstants(8)
    val hashesGen = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, P - 1)).map(_.toSeq))
    val inputs = samples(hashesGen, 300)
    val df = inputs.toDF("h")
      .select(col("h"), LongArrayMinHash.minhash(col("h"), a, b, P).as("sig"))
    df.collect().foreach { r =>
      val hs = r.getSeq[Long](0)
      val want = (0 until 8).map(j => hs.map(x => (a(j) * x + b(j)) % P).min)
      assert(r.getSeq[Long](1) == want)
    }
  }

  test("rhp signature kernel equals a scalar reference on arbitrary vectors") {
    val inputs = samples(vecGen, 300)
    val df = inputs.toDF("v")
      .select(col("v"), LongArrayRhpSig.rhpSig(col("v"), 16).as("sig"))
    df.collect().foreach { r =>
      val v = r.getSeq[Long](0)
      // empty vector → 0, matching the fold's null-padded sums (every
      // bit's vote is null → contributes 0)
      var want = 0L
      if (v.nonEmpty) {
        for (i <- 0 until 16) {
          val s = v.zipWithIndex.map { case (x, d) =>
            val sign = if (((i * 1315423911L + d * 2654435761L) % 1000003L) % 2 == 0) 1L else -1L
            x * sign
          }.sum
          if (s >= 0) want |= 1L << i
        }
      }
      assert(r.getLong(1) == want, s"sig($v)")
    }
  }

  test("fingerprint kernel equals a scalar reference on arbitrary token arrays") {
    val M = 1000000007L
    val tokGen = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumStr, Gen.const("日本語"),
        Gen.const("a😀b"), Gen.const(""))).map(_.toSeq))
    val inputs = samples(tokGen, 300)
    val df = inputs.toDF("toks")
      .select(col("toks"), StringArrayFingerprint.fingerprint(col("toks")).as("fp"))
    df.collect().foreach { r =>
      val toks = r.getSeq[String](0)
      val want = toks.foldLeft(0L) { (acc, t) =>
        var h = 0L
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          h = (h * 131 + cp) % M
          j += Character.charCount(cp)
        }
        (acc * 31 + h) % M
      }
      assert(r.getLong(1) == want, s"fp($toks)")
    }
  }

  test("token-hashes kernel equals the interpreted transform spelling") {
    val tokGen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('€', '中', 'ß', ' ')))
        .map(_.mkString))
    val arrGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, tokGen))
    val inputs = samples(arrGen, 300)
    val df = inputs.map(Tuple1(_)).toDF("toks")
      .select(
        StringArrayTokenHashes.tokenHashes(col("toks")).as("got"),
        transform(col("toks"), graft.ops.TextOps.polyTokenHash).as("want"))
    assert(df.where(not(col("got") <=> col("want"))).isEmpty)
  }

  test("rolling-hash kernel equals the fold-over-slice reference, nulls included") {
    val P = 1000000007L
    val w = 5
    // hash-range values with occasional nulls to exercise window poisoning
    val elemGen: Gen[Option[Long]] = Gen.frequency(
      9 -> Gen.chooseNum(0L, P - 1).map(Some(_)), 1 -> Gen.const(None))
    val arrGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, elemGen))
    val inputs = samples(arrGen, 300)
    val df = inputs.map(a => Tuple1(a)).toDF("h")
      .select(col("h"),
        LongArrayRollingHash.rollingHash(col("h"), w, 131L, P).as("wh"))
    df.collect().zip(inputs).foreach { case (r, in) =>
      val want: Seq[Any] =
        if (in.length < w) Seq.empty
        else in.sliding(w).map { win =>
          if (win.exists(_.isEmpty)) null
          else win.flatten.foldLeft(0L)((acc, x) => (acc * 131 + x) % P)
        }.toSeq
      val got = r.getSeq[Any](1)
      assert(got == want, s"rollingHash($in)")
    }
  }
}
