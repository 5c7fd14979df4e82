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

  test("real PPM decode: luminance plane drives the features") {
    import spark.implicits._
    // 2×2 P6 with a comment in the header; pixels R,G,B,white →
    // integer luminance (r+g+b)/3 = 85,85,85,255
    val header = "P6 # tiny\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](255,0,0, 0,255,0, 0,0,255, 255,255,255).map(_.toByte)
    val ppm = header ++ raster
    assert(MediaCodecs.decodePpmLuma(ppm).get.toSeq == Seq(85, 85, 85, 255))
    val media = Seq((1L, "image/ppm", ppm)).toDF("doc_id", "media_type", "content")
    val f = Multimodal.extractFeatures(spark, media).collect()(0)
    assert(f.mean_byte == (85 * 3 + 255) / 4.0) // 127.5 — plane mean, not byte mean
    assert(f.frame_samples == Seq(85, 85, 85, 255))
    assert(f.thumb == Seq(85.0, 85.0, 85.0, 255.0)) // 4 buckets over 4 pixels
    assert(f.n_bytes == ppm.length) // container size, not plane size
  }

  test("real WAV decode: 16-bit PCM requantized to the byte plane") {
    import spark.implicits._
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val samples = Seq(0, 16384, -32768, 32512)
    val data = samples.flatMap(le16).toArray
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(4 + 24 + 8 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
    // (s >> 8) + 128: 0→128, 16384→192, −32768→0, 32512→255
    assert(MediaCodecs.decodeWavBytes(wav).get.toSeq == Seq(128, 192, 0, 255))
    val media = Seq((1L, "audio/wav", wav)).toDF("doc_id", "media_type", "content")
    val f = Multimodal.extractFeatures(spark, media).collect()(0)
    assert(f.mean_byte == (128 + 192 + 0 + 255) / 4.0)
    assert(f.frame_samples == Seq(128, 192, 0, 255))
  }

  test("IMA ADPCM: encode->decode tracks the source within one step") {
    // a real compressed codec is LOSSY but convergent: after the first
    // few adaptation steps the reconstruction tracks the source within
    // the current quantizer step. Encode a byte-derived 16-bit ramp +
    // noise-ish pattern, decode through the WAV fmt-0x11 arm, and
    // bound the requantized (8-bit) error.
    // smooth-ish waveform: a delta codec tracks bounded slopes; step
    // discontinuities (e.g. byte wraparound) legitimately take the
    // adaptive step several samples to chase and are NOT in this bound
    val src8 = (0 until 200).map(i =>
      128 + (80 * math.sin(i / 6.0)).toInt).toArray
    val samples = src8.map(b => (b - 128) << 8)
    val wav = MediaCodecs.encodeImaAdpcmWav(samples)
    val decoded = MediaCodecs.decodeWavBytes(wav).get
    assert(decoded.length == samples.length)
    // sample 0 is stored verbatim in the block header
    assert(decoded(0) == src8(0))
    // requantized 8-bit error small once the step has adapted
    val errs = decoded.zip(src8).map { case (d, s) => math.abs(d - s) }
    assert(errs.drop(10).max <= 8, s"tail errors too large: ${errs.drop(10).max}")
    // exact golden prefix pins the tables + nibble order (low first):
    // hand-traced through the IMA recurrence from pred=s0, idx=0
    val first4 = decoded.take(4).toSeq
    val expected = {
      // independently re-run the recurrence in the spec's own words
      var pred = samples(0); var idx = 0
      val out = scala.collection.mutable.ArrayBuffer(pred)
      for (i <- 1 until 4) {
        val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
          25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73)(idx)
        var diff = samples(i) - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) nib |= 1
        var dq = step >> 3
        if ((nib & 4) != 0) dq += step
        if ((nib & 2) != 0) dq += step >> 1
        if ((nib & 1) != 0) dq += step >> 2
        pred = if ((nib & 8) != 0) pred - dq else pred + dq
        idx = math.max(0, math.min(88, idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)))
        out += pred
      }
      out.map(s => (s >> 8) + 128).toSeq
    }
    assert(first4 == expected)
    // container arithmetic: 44-byte RIFF/fmt(20)/data headers + 4-byte
    // block header + one byte per two nibbles (+word pad)
    val dataBytes = (samples.length - 1 + 1) / 2
    assert(wav.length == 48 + 4 + dataBytes + (dataBytes & 1))
  }

  test("real PNG decode: stored-block gray container round-trips the plane") {
    import spark.implicits._
    val row = "Hello, png plane!".getBytes("UTF-8")
    val png = MediaCodecs.encodeGrayPng(row)
    // closed-form container size the oracle relies on
    assert(png.length == row.length + 69)
    // javax.imageio decodes the REAL container back to the exact samples
    assert(MediaCodecs.decodeImageLuma(png).get.toSeq == row.map(_ & 0xff).toSeq)
    val media = Seq((1L, "image/png", png)).toDF("doc_id", "media_type", "content")
    val f = Multimodal.extractFeatures(spark, media).collect()(0)
    assert(f.mean_byte == row.map(_ & 0xff).sum.toDouble / row.length)
    assert(f.frame_samples == row.take(8).map(_ & 0xff).toSeq)
    assert(f.n_bytes == png.length)
  }

  test("real GIF encode: from-scratch LZW round-trips through imageio") {
    // deterministic pseudo-random bytes, enough distinct pairs to push
    // the code width through 9 → 10 → 11 bits
    val rnd = new scala.util.Random(7)
    val noisy = Array.fill(6000)(rnd.nextInt(256).toByte)
    // runs compress heavily (dictionary chains), then a value sweep
    val runs = Array.tabulate(3000)(i => (i / 37 % 256).toByte)
    val sweep = Array.tabulate(256)(_.toByte)
    for (row <- Seq(noisy, runs, sweep, "x".getBytes, "ab".getBytes)) {
      val gif = MediaCodecs.encodeGrayGif(row)
      assert(gif(0) == 'G' && gif(5) == 'a'.toByte)
      assert(MediaCodecs.decodeImageLuma(gif).get.toSeq ==
        row.map(_ & 0xff).toSeq, s"row len ${row.length}")
    }
    // force a table reset: > 4096 dictionary entries need a clear code
    val big = Array.fill(40000)(rnd.nextInt(256).toByte)
    assert(MediaCodecs.decodeImageLuma(MediaCodecs.encodeGrayGif(big)).get
      .toSeq == big.map(_ & 0xff).toSeq)
    // and LZW genuinely compresses the redundant input
    assert(MediaCodecs.encodeGrayGif(runs).length < runs.length + 800)
  }

  test("RGB raster decode averages bands; JPEG decodes through imageio") {
    // 2×1 RGB PNG written by ImageIO itself (not our encoder): red, white
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0xffffff)
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(MediaCodecs.decodeImageLuma(png).get.toSeq == Seq(255 / 3, 255))
    // JPEG: lossy, so assert shape + plausible values, not exact pixels
    val jpg = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val plane = MediaCodecs.decodeImageLuma(jpg).get
    assert(plane.length == 2 && plane.forall(v => v >= 0 && v <= 255))
    // junk is not an image → None, stub fallback
    assert(MediaCodecs.decodeImageLuma("not an image".getBytes).isEmpty)
  }

  test("indexed-color GIF resolves the palette, not raw indices") {
    // palette: index 0 -> WHITE, index 1 -> black. A raw-sample read
    // would report an all-white image as an all-zero plane.
    val icm = new java.awt.image.IndexColorModel(1, 2,
      Array(255.toByte, 0.toByte), // reds
      Array(255.toByte, 0.toByte), // greens
      Array(255.toByte, 0.toByte)) // blues
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    img.getRaster.setSample(0, 0, 0, 0) // index 0 = white
    img.getRaster.setSample(1, 0, 0, 1) // index 1 = black
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val plane = MediaCodecs.decodeImageLuma(bos.toByteArray).get
    assert(plane.toSeq == Seq(255, 0),
      s"palette must be resolved before averaging: ${plane.toSeq}")
  }

  test("animated GIF: every-k-th frame sampling with palette-resolved planes") {
    // 6-frame 1x1 animation, frame i = gray level i*40 through a
    // 256-entry identity gray palette; write via ImageIO's sequence API
    val grays = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    for (i <- 0 until 6) {
      val img = new java.awt.image.BufferedImage(1, 1,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      img.getRaster.setSample(0, 0, 0, i * 40)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); out.close(); writer.dispose()
    val gif = bos.toByteArray

    // every 2nd frame: 0, 2, 4 → gray 0, 80, 160 — with canvas dims
    val (cw, ch, sampled) = MediaCodecs.decodeGifFrames(gif, everyK = 2).get
    assert((cw, ch) == ((1, 1)))
    assert(sampled.map(_.toSeq) == Seq(Seq(0), Seq(80), Seq(160)))
    // k=1 keeps all 6; junk and k<=0 refuse rather than throw
    assert(MediaCodecs.decodeGifFrames(gif, 1).get._3.length == 6)
    assert(MediaCodecs.decodeGifFrames("junk".getBytes, 2).isEmpty)
    assert(MediaCodecs.decodeGifFrames(gif, 0).isEmpty)
  }

  test("MJPEG AVI: container round-trips and every-k frame sampling decodes") {
    // real video path with zero native deps: JPEG frames (written by
    // the JDK's own encoder) inside a hand-built RIFF AVI. Uniform-gray
    // frames survive JPEG's lossy DCT nearly exactly (flat blocks), so
    // the sampled plane means pin the frame ORDER as well as the decode.
    val grays = Seq(32, 96, 160, 224)
    val (w, h) = (16, 8)
    val jpegs = grays.map { g =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, g)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = MediaCodecs.encodeMjpegAvi(jpegs, w, h)
    // sample every 2nd frame: expect frames 0 and 2 (gray 32 and 160)
    val (dw, dh, planes) = MediaCodecs.decodeAviMjpegFrames(avi, 2).get
    assert((dw, dh) == (w, h))
    assert(planes.length == 2)
    val means = planes.map(p => p.sum.toDouble / p.length)
    assert(math.abs(means(0) - 32) <= 3, s"frame 0 mean ${means(0)}")
    assert(math.abs(means(1) - 160) <= 3, s"frame 1 mean ${means(1)}")
    // every frame: all four in order
    val all = MediaCodecs.decodeAviMjpegFrames(avi, 1).get._3
    assert(all.length == 4)
    all.zip(grays).foreach { case (p, g) =>
      assert(math.abs(p.sum.toDouble / p.length - g) <= 3)
    }
    // never-throw contract on garbage and on a truncated container
    assert(MediaCodecs.decodeAviMjpegFrames("not an avi".getBytes, 1).isEmpty)
    assert(MediaCodecs.decodeAviMjpegFrames(avi.take(40).toArray, 1).isEmpty)
    assert(MediaCodecs.decodeAviMjpegFrames(avi, 0).isEmpty)

    // interleaved layout: frames wrapped in a 'rec ' LIST inside movi
    // (what real muxers emit) must decode identically. Rebuild the
    // container by hand with the same headers but rec-wrapped frames.
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, b: Array[Byte]) = cc(id) ++ le32(b.length) ++ b ++
      (if ((b.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def lst(kind: String, b: Array[Byte]) =
      cc("LIST") ++ le32(4 + b.length) ++ cc(kind) ++ b
    val recMovi = lst("movi",
      jpegs.map(f => lst("rec ", chunk("00dc", f))).reduce(_ ++ _))
    // splice: reuse the original container up to its movi LIST
    val moviAt = {
      var p = 12; var at = -1
      while (at < 0 && p + 12 <= avi.length) {
        if (new String(avi, p, 4, "US-ASCII") == "LIST" &&
          new String(avi, p + 8, 4, "US-ASCII") == "movi") at = p
        else p += 8 + (avi(p + 4) & 0xff | (avi(p + 5) & 0xff) << 8 |
          (avi(p + 6) & 0xff) << 16 | (avi(p + 7) & 0xff) << 24) +
          ((avi(p + 4) & 1))
      }
      at
    }
    val body2 = avi.slice(8, moviAt) ++ recMovi
    val avi2 = cc("RIFF") ++ le32(body2.length) ++ body2
    val recPlanes = MediaCodecs.decodeAviMjpegFrames(avi2, 1).get._3
    assert(recPlanes.length == 4)
    recPlanes.zip(grays).foreach { case (p, g) =>
      assert(math.abs(p.sum.toDouble / p.length - g) <= 3)
    }
  }

  test("GIF frames flagging a transparent color are refused, not mis-read") {
    // a FULL-canvas frame with transparentColorFlag set composites over
    // the previous frame: resolving its transparent index through the
    // palette RGB would return a plane that is not the displayed frame.
    // Build one via explicit GCE metadata on a 1x1 gray-palette frame.
    val grays = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setSample(0, 0, 0, 200)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(out)
    val fmt = "javax_imageio_gif_image_1.0"
    val meta = writer.getDefaultImageMetadata(
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
    val root = meta.getAsTree(fmt)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val gces = root.getElementsByTagName("GraphicControlExtension")
    val gce =
      if (gces.getLength > 0)
        gces.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      else {
        val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
        n.setAttribute("disposalMethod", "none")
        n.setAttribute("userInputFlag", "FALSE")
        n.setAttribute("delayTime", "10")
        root.appendChild(n)
        n
      }
    gce.setAttribute("transparentColorFlag", "TRUE")
    gce.setAttribute("transparentColorIndex", "0")
    meta.setFromTree(fmt, root)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), null)
    out.close(); writer.dispose()
    assert(MediaCodecs.decodeGifFrames(bos.toByteArray, 1).isEmpty,
      "transparent frames must fall back to the stub, not decode wrong")
  }

  test("resizePlane: exact box averages, floor division, upscale guard") {
    // 4x2 plane -> 2x1: each output pixel averages a 2x2 block
    val p = Array(
      10, 20, 30, 40,
      50, 60, 70, 80)
    assert(Multimodal.resizePlane(p, 4, 2, 2, 1).toSeq ==
      Seq((10 + 20 + 50 + 60) / 4, (30 + 40 + 70 + 80) / 4))
    // floor: (1+2)/2 = 1
    assert(Multimodal.resizePlane(Array(1, 2), 2, 1, 1, 1).toSeq == Seq(1))
    // identity geometry is a no-op
    assert(Multimodal.resizePlane(p, 4, 2, 4, 2).toSeq == p.toSeq)
    // upscale along y (h=1 -> outH=3): the guard repeats the single row
    assert(Multimodal.resizePlane(Array(7, 9), 2, 1, 2, 3).toSeq ==
      Seq(7, 9, 7, 9, 7, 9))
  }

  test("malformed media falls back to the stub instead of throwing") {
    import spark.implicits._
    val junk = "P6 not a real image".getBytes("US-ASCII")
    val media = Seq((1L, "image/ppm", junk)).toDF("doc_id", "media_type", "content")
    val f = Multimodal.extractFeatures(spark, media).collect()(0)
    // stub semantics: mean over RAW bytes, first-8 raw bytes as frames
    val wantMean = junk.map(_ & 0xff).sum.toDouble / junk.length
    assert(f.mean_byte == wantMean)
    assert(f.frame_samples == junk.take(8).map(_ & 0xff).toSeq)
  }

  test("ADPCM 1-sample boundary: header-only block round-trips") {
    // encodeImaAdpcmWav(1 sample) emits blockAlign=4 — the 4-byte block
    // header alone, carrying sample 0 verbatim. The decoder must accept
    // it: the gated query's WHERE admits 1-byte docs, so rejecting
    // blockAlign=4 diverged from the DuckDB oracle (round-7 advice).
    for (s8 <- Seq(0, 1, 128, 255)) {
      val wav = MediaCodecs.encodeImaAdpcmWav(Array((s8 - 128) << 8))
      val dec = MediaCodecs.decodeWavBytes(wav)
      assert(dec.isDefined, s"1-sample WAV (byte $s8) must decode")
      assert(dec.get.toSeq == Seq(s8), s"byte $s8 round-trip")
    }
    // 2 samples still work after the guard change (blockAlign = 5)
    val two = MediaCodecs.encodeImaAdpcmWav(Array(0, 256))
    assert(MediaCodecs.decodeWavBytes(two).get.length == 2)
  }

  test("mu-law: exhaustive byte-plane round-trip within companding error") {
    // all 256 source bytes in one WAV: the requantized reconstruction
    // must stay within the logarithmic segment's quantization width —
    // the top chord (e=7) spaces codes 1024 apart in 16-bit, i.e. 4
    // requantized units, so the worst |r8 - b| on the (b-128)<<8 plane
    // is 2. Exhaustive, so this is an exact pin, not a tolerance.
    val src = (0 until 256).toArray
    val wav = MediaCodecs.encodeMuLawWav(src.map(b => (b - 128) << 8))
    val dec = MediaCodecs.decodeWavBytes(wav)
    assert(dec.isDefined && dec.get.length == 256)
    val errs = dec.get.zip(src).map { case (d, o) => math.abs(d - o) }
    assert(errs.max <= 2, s"mu-law 8-bit reconstruction error ${errs.max}")
    // zero and full-scale anchors decode exactly
    assert(dec.get(128) == 128, "silence must round-trip exactly")
    // 1-sample boundary: min container (44 + 1 + pad) decodes
    val one = MediaCodecs.encodeMuLawWav(Array(0))
    assert(MediaCodecs.decodeWavBytes(one).get.toSeq == Seq(128))
    // sign symmetry of the raw codec: decode(encode(-s)) == -decode(encode(s))
    for (s <- Seq(100, 1000, 10000, 32000))
      assert(MediaCodecs.muLawDecode(MediaCodecs.muLawEncode(-s)) ==
        -MediaCodecs.muLawDecode(MediaCodecs.muLawEncode(s)))
  }

  test("adversarial RIFF sizes terminate with None instead of hanging") {
    // a declared chunk size >= 2^31 truncated to Int is negative; the
    // pre-fix walks advanced by 8 + size and spun forever. Both the
    // AVI and WAV chunk walks must stop and return None/absent.
    def le32u(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    // AVI: RIFF/AVI header, then one chunk claiming size 0xFFFFFFF8
    val evilAvi = cc("RIFF") ++ le32u(100) ++ cc("AVI ") ++
      cc("LIST") ++ le32u(0xFFFFFFF8L) ++ cc("movi") ++ new Array[Byte](64)
    assert(MediaCodecs.decodeAviMjpegFrames(evilAvi, 1).isEmpty)
    // AVI: valid top-level movi whose inner chunk lies about its size
    val evilInner = {
      val inner = cc("00dc") ++ le32u(0xFFFFFFF0L) ++ new Array[Byte](16)
      val movi = cc("LIST") ++ le32u(4 + inner.length) ++ cc("movi") ++ inner
      cc("RIFF") ++ le32u(4 + movi.length) ++ cc("AVI ") ++ movi
    }
    assert(MediaCodecs.decodeAviMjpegFrames(evilInner, 1).isEmpty)
    // WAV: oversize fmt chunk size must not spin the fmt/data scan
    val evilWav = cc("RIFF") ++ le32u(100) ++ cc("WAVE") ++
      cc("junk") ++ le32u(0xFFFFFFF8L) ++ new Array[Byte](64)
    assert(MediaCodecs.decodeWavBytes(evilWav).isEmpty)
  }

  test("features on sf0.001 documents: 500 rows, deterministic digests") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val a = Multimodal.extractFeatures(spark, Multimodal.packFromText(docs))
      .toDF().orderBy("doc_id").collect()
    val b = Multimodal.extractFeatures(spark, Multimodal.packFromText(docs))
      .toDF().orderBy("doc_id").collect()
    assert(a.length == 500 && a.sameElements(b))
  }

  test("phash banded pairing is recall-lossless vs the exhaustive scan") {
    // The multimodal_phash_dedup gate relies on 8 bands > maxHamming 6
    // making the banded join emit EXACTLY the exhaustive ham<=6 pairs;
    // pin that equivalence on the real signatures (63-bit dHash of the
    // sf0.001 documents' strips).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sigs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .where(octet_length(col("text")) >= 6)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val w = bytes.length / 3
        val plane = MediaCodecs
          .decodePpmLuma(s"P6\n$w 1\n255\n".getBytes("US-ASCII")
            ++ bytes.take(w * 3)).get
        val b = Multimodal.resizePlane(plane, w, 1, 64, 1)
        (id, (0 until 63).foldLeft(0L)((s, i) =>
          if (b(i + 1) > b(i)) s | (1L << i) else s))
      }.toDF("doc_id", "sim").cache()
    val banded = SimHashDedup.pairsFromSignatures(sigs, maxHamming = 6, bands = 8)
      .select("d1", "d2", "hamming").orderBy("d1", "d2")
      .as[(Long, Long, Int)].collect().toSeq
    val exhaustive = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .where(col("hamming") <= 6).orderBy("d1", "d2")
      .as[(Long, Long, Int)].collect().toSeq
    assert(banded == exhaustive && exhaustive.nonEmpty)
  }

  test("resampleLinear: endpoint anchoring, identity at m=n, exact midpoints") {
    val p = Array(10, 20, 30, 40, 50)
    // identity when rates match
    assert(Multimodal.resampleLinear(p, 5).toSeq == p.toSeq)
    // endpoints always anchor to the source endpoints
    val r3 = Multimodal.resampleLinear(p, 3)
    assert(r3.head == 10 && r3.last == 50 && r3(1) == 30) // midpoint exact
    // upsample 2 -> 4: positions 0, 1/3, 2/3, 1 over [10, 40] with
    // floor((10*(3-f) + 40*f)/3)
    assert(Multimodal.resampleLinear(Array(10, 40), 4).toSeq == Seq(10, 20, 30, 40))
    // weights are non-negative and sum to m-1, so output stays in range
    val r7 = Multimodal.resampleLinear(p, 7)
    assert(r7.forall(v => v >= 10 && v <= 50))
    assertThrows[IllegalArgumentException](Multimodal.resampleLinear(Array(1), 3))
    assertThrows[IllegalArgumentException](Multimodal.resampleLinear(p, 1))
  }

  test("video gate recovers encoded frame levels through the full MJPEG round-trip") {
    // The multimodal_video_frames gate's determinism claim: JPEG error
    // on flat frames (±3) never crosses the 32-level snapping margin,
    // so the decoded-and-snapped levels equal the levels the encoder
    // chose from the text bytes. Pin that on the real sf0.001 corpus —
    // every sampled frame, every document.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val got = graft.queries.StreamQueries
      .multimodalVideoFrames(spark, TestSpark.Sf0001)
      .select("doc_id", "n_sampled", "lv_first", "lv_last", "lv_sum")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = docs.where(octet_length(col("text")) >= 4)
      .select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("UTF-8")
      val nf = 2 + (id % 3).toInt
      val lv = (0 until nf by 2).map(i => ((bytes(i) & 0xff) % 4 * 64 + 32).toLong)
      id -> ((lv.length.toLong, lv.head, lv.last, lv.sum))
    }.toMap
    assert(got.nonEmpty && got == want)
  }

  test("VAD segments match a driver-side recomputation over frame energies") {
    val sf = TestSpark.Sf0001
    val frames = graft.queries.StreamQueries
      .multimodalAudioEnergy(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("energy")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val want = frames.flatMap { case (doc, fs) =>
      val tot = fs.map(_._3).sum
      val n = fs.length.toLong
      val active = fs.filter { case (_, _, e) => e * 2 * n >= tot }
      // islands: split where frame_idx is non-consecutive
      val segs = active.foldLeft(List.empty[List[(Long, Long, Long)]]) {
        case (acc, f) => acc match {
          case (h @ ((_, last, _) :: _)) :: t if f._2 == last + 1 =>
            (f :: h) :: t
          case _ => List(f) :: acc
        }
      }.map(_.reverse).reverse
      segs.map { s =>
        (doc, s.head._2) -> ((s.last._2, s.length.toLong, s.map(_._3).sum))
      }
    }
    val got = graft.queries.StreamQueries.multimodalAudioVad(spark, sf)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_start")) ->
          ((r.getAs[Long]("seg_end"), r.getAs[Long]("n_frames"),
            r.getAs[Long]("seg_energy")))).toMap
    assert(got.nonEmpty && got == want.toMap)
  }

  test("patch tokens match a driver-side repatch of the decoded plane") {
    val rows = graft.queries.StreamQueries
      .multimodalPatchTokens(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("patch_id")) ->
      ((r.getAs[Long]("mean_luma"), r.getAs[Long]("token_id")))).toMap
    val want = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val h = bytes.length / 3 / 12
      if (h < 4) Nil
      else {
        val luma = (0 until 12 * h).map(p =>
          ((bytes(3 * p) & 0xff) + (bytes(3 * p + 1) & 0xff) +
            (bytes(3 * p + 2) & 0xff)) / 3)
        for { band <- 0 until h / 4; pc <- 0 until 3 } yield {
          val s = (for (r <- 0 until 4; c <- 0 until 4)
            yield luma((band * 4 + r) * 12 + pc * 4 + c)).sum.toLong
          (id, (band * 3 + pc).toLong) -> ((s / 16, s / 16 / 4))
        }
      }
    }
    assert(got == want.toMap)
    rows.foreach(r => assert(r.getAs[Long]("token_id") < 64))
  }

  test("WHT spectral energy obeys Parseval against the energy gate") {
    val energies = graft.queries.StreamQueries
      .multimodalAudioEnergy(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        r.getAs[Long]("energy")).toMap
    val rows = graft.queries.StreamQueries
      .multimodalAudioWht(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty && rows.length == energies.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"))
      // Parseval for the unnormalized 8-point WHT: sum c_k^2 = 8 * sum s_j^2
      assert(r.getAs[Long]("spec_energy") == 8L * energies(key), s"$key")
      val dom = r.getAs[Long]("dom_seq")
      assert(dom >= 1 && dom <= 7)
    }
  }

  test("late-data accounting fires and respects its invariants") {
    val rows = graft.queries.StreamQueries.streamLateData(spark, TestSpark.Sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, late, ppm) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_late"), r.getAs[Long]("late_ppm"))
      assert(late >= 0 && late <= n)
      assert(ppm == late * 1000000L / n)
    }
    // the buffering-skew arrival model must actually produce late rows
    assert(rows.map(_.getAs[Long]("n_late")).sum > 0L)
    val total = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }
}
