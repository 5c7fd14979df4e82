package graft.ops

/** Real, dependency-free decoders for the multimodal pipeline — formats
  * whose decoding is pure byte arithmetic, so "no imaging libraries in
  * the sandbox" is no excuse: PPM (P6) raster images, RIFF/WAVE 16-bit
  * PCM audio, and IMA ADPCM compressed audio (fmt 0x0011 — a genuine
  * 4:1 lossy codec, spec-complete integer math).
  * `Multimodal.extractFeatures` dispatches on media_type: these
  * formats get REAL decoded planes/samples; types that genuinely need
  * a licensed/native codec (MP3, H.264) fall back to the documented
  * deterministic stub.
  *
  * Both decoders normalize into the pipeline's feature space — an
  * unsigned-byte-valued sequence (0..255):
  *   - PPM: per-pixel integer luminance (R+G+B)/3 over the raster in
  *     row-major order (the grayscale plane a resize would operate on);
  *   - WAV: 16-bit signed PCM samples (channel-interleaved, all
  *     channels kept) mapped to the unsigned byte range via the
  *     high-order byte (sample >> 8) + 128 — the classic 16→8-bit
  *     requantization.
  *
  * Malformed input returns None and the caller falls back to the stub —
  * a decode error must never kill a 100 TB scan (the reference's
  * cleaning layer takes the same never-throw stance, load_data.py:122).
  */
object MediaCodecs {

  /** PPM "P6" binary: `P6 <ws> width <ws> height <ws> maxval <single ws>`
    * then width·height RGB triplets. Comments (`#` to end-of-line) are
    * legal anywhere in the header. Only maxval ≤ 255 (1-byte samples)
    * is supported — the common case; 2-byte-sample PPMs return None.
    */
  def decodePpmLuma(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start) None
      else Some(new String(bytes, start, pos - start).toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if maxv > 0 && maxv <= 255 && w > 0 && h > 0
      // exactly ONE whitespace byte separates header from raster
      _ <- if (pos < bytes.length) { pos += 1; Some(()) } else None
      if bytes.length - pos >= w * h * 3
    } yield {
      val out = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        val o = pos + i * 3
        val r = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val b = bytes(o + 2) & 0xff
        out(i) = (r + g + b) / 3
        i += 1
      }
      out
    }
  }

  /** Compressed raster formats (PNG/JPEG/BMP/GIF) via the JDK's
    * `javax.imageio` — no third-party dependency; readers come from the
    * static ImageIO registry, so there is no per-partition init to
    * amortize. Luminance plane in row-major order, matching the PPM
    * contract: ≥3 bands → integer (r+g+b)/3 over the RAW raster samples,
    * 1 band → the sample itself. Samples wider than 8 bits are mapped to
    * 0..255 via a right shift. Raw `Raster.getSample`, NOT
    * `BufferedImage.getRGB`: getRGB runs a linear-gray→sRGB color-space
    * conversion on TYPE_BYTE_GRAY images that silently brightens values —
    * a decode must return the encoded sample, not a rendering.
    *
    * EXCEPTION: indexed-color images (every GIF, palette PNG/BMP) store
    * palette INDICES in the raster — a raw sample there is a function
    * of palette ORDER, not brightness (an all-white GIF whose palette
    * maps index 0 → white would read as an all-zero plane). For an
    * IndexColorModel the index must be resolved through the palette
    * (getRed/getGreen/getBlue on the model — a table lookup, no
    * color-space conversion) before averaging.
    * Undecodable/malformed bytes → None (stub fallback, never throw).
    */
  def decodeImageLuma(bytes: Array[Byte]): Option[Array[Int]] =
    new RasterDecoder().decodeLuma(bytes)

  /** Reusable raster decoder — ONE per partition (the MessageDigest
    * pattern in Multimodal.extractFeatures), because the convenience
    * `ImageIO.read(InputStream)` pays three per-call costs that dwarf
    * decoding a tiny raster: an ImageInputStream whose default cache is
    * a TEMP FILE on disk (`ImageIO.getUseCache` is true out of the
    * box), a full service-registry scan to find a reader, and a fresh
    * reader instance. Here the container format is sniffed from magic
    * bytes, the matching reader is created once and re-`setInput` per
    * image, and the stream is an explicit MemoryCacheImageInputStream —
    * no disk, no registry walk, identical decoded samples (reader.read
    * is exactly what ImageIO.read calls internally).
    * NOT thread-safe (ImageReader holds per-decode state) — per
    * partition, never shared.
    */
  /** Reusable JPEG encoder — the write-side sibling of RasterDecoder.
    * `ImageIO.write(img, "jpg", os)` pays a per-call writer-registry
    * lookup AND (with the default `ImageIO.useCache = true`) spools
    * every image through a temp-FILE-backed FileCacheImageOutputStream
    * — one disk file create/write/delete per frame, serialized through
    * the filesystem and a synchronized registry at 32 threads. One
    * instance per partition holds ONE ImageWriter and streams through
    * an in-heap MemoryCacheImageOutputStream: zero disk, zero registry
    * traffic on the hot path. Not thread-safe (one per partition).
    */
  final class JpegEncoder {
    private val writer: javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
      if (!it.hasNext) throw new IllegalStateException("JDK jpeg writer missing")
      it.next()
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally {
        try ios.close() catch { case scala.util.control.NonFatal(_) => () }
      }
      bos.toByteArray
    }
  }

  final class RasterDecoder {
    private val readers =
      scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]

    private def sniff(b: Array[Byte]): Option[String] =
      if (b.length < 4) None
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Some("jpeg")
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') Some("gif")
      else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
      else None

    def decodeLuma(bytes: Array[Byte]): Option[Array[Int]] =
      decodeLumaDims(bytes).map(_._3)

    /** Plane plus decoded geometry — for container formats (AVI) whose
      * headers are advisory: the codec's dimensions are the truth.
      */
    def decodeLumaDims(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      try {
        val img = sniff(bytes) match {
          case Some(fmt) =>
            val reader = readers.getOrElseUpdate(fmt, {
              val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
              if (!it.hasNext) return None
              it.next()
            })
            val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            // close the stream once the image is materialized — its
            // in-heap cache segments otherwise stay referenced by the
            // reader until the NEXT setInput and pile up under memory
            // pressure on exactly the hot path this class optimizes
            try {
              reader.setInput(stream, true, true)
              reader.read(0)
            } finally {
              try stream.close() catch { case scala.util.control.NonFatal(_) => () }
            }
          case None => // unknown magic: the slow generic path, rare by contract
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        }
        if (img == null) None
        else lumaPlane(img).map(p => (img.getWidth, img.getHeight, p))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Shared plane extraction (see decodeImageLuma scaladoc for the
    * raw-sample vs getRGB and indexed-palette contracts).
    */
  private def lumaPlane(img: java.awt.image.BufferedImage): Option[Array[Int]] = {
      if (img == null) return None
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      if (w <= 0 || h <= 0 || bands <= 0) return None
      val shift = math.max(0, raster.getSampleModel.getSampleSize(0) - 8)
      val palette = img.getColorModel match {
        case icm: java.awt.image.IndexColorModel => Some(icm)
        case _ => None
      }
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = palette match {
            case Some(icm) =>
              val i = raster.getSample(x, y, 0)
              (icm.getRed(i) + icm.getGreen(i) + icm.getBlue(i)) / 3
            case None if bands >= 3 =>
              ((raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
                raster.getSample(x, y, 2)) / 3) >> shift
            case None =>
              raster.getSample(x, y, 0) >> shift
          }
          x += 1
        }
        y += 1
      }
      Some(out)
  }

  /** Encode one row of 8-bit gray samples as a REAL, spec-complete PNG
    * (signature, IHDR, one IDAT, IEND — CRC32s and zlib wrapper
    * included), width = row.length, height = 1, color type 0. The zlib
    * stream is a single STORED (uncompressed) deflate block, which makes
    * the container size a closed form the SQL oracle can restate:
    * total = row.length + 69 bytes
    *       = 8 (sig) + 25 (IHDR) + [12 + 2 + 5 + (1 filter byte +
    *         row.length) + 4 (adler)] (IDAT) + 12 (IEND).
    * Requires row.length ≤ 65534 so filter byte + row fit one stored
    * block (stored-block payload cap is 65535).
    */
  def encodeGrayPng(row: Array[Byte]): Array[Byte] = {
    require(row.length <= 65534, "single stored deflate block only")
    val out = new java.io.ByteArrayOutputStream(row.length + 69)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong), 0, 4)
      val payload = tag.getBytes("US-ASCII") ++ data
      out.write(payload, 0, payload.length)
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      out.write(be32(crc.getValue), 0, 4)
    }
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte), 0, 8)
    chunk("IHDR", be32(row.length.toLong) ++ be32(1L) ++
      Array[Byte](8 /* bit depth */, 0 /* gray */, 0, 0, 0))
    val raw = Array(0.toByte) ++ row // filter byte 0 (None) + samples
    val zlib = {
      val n = raw.length
      val header = Array(0x78.toByte, 0x01.toByte) // 32K window, no dict
      val stored = Array(1.toByte, // BFINAL=1, BTYPE=00 (stored)
        (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        (~n & 0xff).toByte, ((~n >> 8) & 0xff).toByte)
      val adler = new java.util.zip.Adler32
      adler.update(raw)
      header ++ stored ++ raw ++ be32(adler.getValue)
    }
    chunk("IDAT", zlib)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** 24-bit BMP encoder (BITMAPFILEHEADER + BITMAPINFOHEADER + BI_RGB
    * pixel array): one row of gray samples as (b,g,r)=(v,v,v) triples,
    * w×1, row padded to a 4-byte boundary per the spec — the
    * UNCOMPRESSED little-endian sibling of [[encodeGrayPng]]'s
    * stored-deflate container: PNG exercises the chunk/CRC/zlib path,
    * GIF the LZW path, BMP the raw-DIB path with its padding and
    * BGR-order traps. Deterministic closed-form container size
    * 54 + ceil4(3·w), so the oracle can restate n_bytes. The JDK's BMP
    * ImageReader decodes it back as TYPE_3BYTE_BGR; integer luminance
    * (r+g+b)/3 of an (v,v,v) pixel is v, so the decoded plane equals
    * the input row exactly.
    */
  def encodeGrayBmp(row: Array[Byte]): Array[Byte] = {
    require(row.nonEmpty, "BMP needs at least one pixel")
    val w = row.length
    val stride = (3 * w + 3) / 4 * 4
    val fileSize = 54 + stride
    val out = new java.io.ByteArrayOutputStream(fileSize)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('B'); out.write('M')
    le32(fileSize); le16(0); le16(0); le32(54) // file header
    le32(40); le32(w); le32(1) // info header: w×1, bottom-up
    le16(1); le16(24) // planes, bpp
    le32(0); le32(stride) // BI_RGB, image size
    le32(0); le32(0); le32(0); le32(0) // ppm x/y, colors used/important
    var i = 0
    while (i < w) {
      val v = row(i) & 0xff
      out.write(v); out.write(v); out.write(v) // b, g, r
      i += 1
    }
    var pad = stride - 3 * w
    while (pad > 0) { out.write(0); pad -= 1 }
    out.toByteArray
  }

  /** Gray GIF87a encoder with a REAL LZW compressor — the compressed
    * sibling of [[encodeGrayPng]]'s stored-deflate container: one row of
    * 8-bit samples (w×1), 256-entry identity gray global color table, a
    * from-scratch variable-width LZW stream (9→12-bit codes, LSB-first
    * packing, clear-code reset on table overflow, sub-block framing).
    * Unlike the PNG path there is no closed-form container size — LZW
    * output is data-dependent, which is exactly what makes it the
    * compression-arm test vector. The JDK's GIF ImageReader decodes it
    * back bit-for-bit (MultimodalSpec pins the round trip across the
    * 9/10/11-bit width boundaries and a table reset).
    */
  def encodeGrayGif(row: Array[Byte]): Array[Byte] = {
    require(row.nonEmpty && row.length <= 65535, "w*1 raster, u16 width")
    val w = row.length
    val out = new java.io.ByteArrayOutputStream(w / 2 + 800)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"), 0, 6)
    le16(w); le16(1)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // pixel aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(1)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW minimum code size
    val lzw = lzwCompress(row, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: codes start at minCodeSize+1 bits, widen when the
    * next free slot crosses a power of two, reset via the clear code
    * when slot 4096 would be needed; bits packed LSB-first. Dictionary
    * keys are (prefixCode << 8 | literal) ints — prefix < 4096, so the
    * key fits 20 bits, one boxed HashMap probe per input byte.
    */
  private def lzwCompress(pixels: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 64)
    var acc = 0L
    var nbits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var nextCode = eoi + 1
    emit(clear)
    var prev = pixels(0) & 0xff
    var i = 1
    while (i < pixels.length) {
      val k = pixels(i) & 0xff
      val key = Integer.valueOf((prev << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        if (nextCode < 4096) {
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // widen one code LATER than the slot count crossing the power
          // of two: the decoder adds its copy of each entry only while
          // processing the NEXT code, so its width bump lags the
          // encoder's add by exactly one emitted code (the classic
          // early-change off-by-one; OpenJDK's GIFImageReader is strict)
          if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else {
          emit(clear)
          dict.clear()
          codeSize = minCodeSize + 1
          nextCode = eoi + 1
        }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Multi-frame (video-style) decode: every `everyK`-th frame of an
    * animated GIF as a luminance plane over the canvas — the
    * frame-sampling stage of a video pipeline, real and dependency-free
    * (the JDK's GIF ImageReader exposes per-frame access; a production
    * MP4/H.264 arm would slot in here with the identical signature).
    * Returns (canvasW, canvasH, sampled planes); frame 0 is always
    * sampled; indexed frames resolve through their palette exactly like
    * decodeImageLuma.
    *
    * HONESTY over coverage: optimized GIFs store later frames as delta
    * sub-rectangles with offsets, disposal rules, and transparent
    * palette indices that composite over prior frames; returning those
    * patches as "frames" would hand the caller data that is NOT the
    * displayed frame, at the wrong dimensions. Any sampled frame whose
    * raster is not the full (0,0)-anchored canvas, or that flags a
    * transparent color (its pixels show through to the PREVIOUS frame,
    * so its palette RGB is not the displayed value) → None (stub
    * fallback) rather than a wrong answer — full-frame animations
    * (screen capture exports, synthetic data) decode; a compositing
    * engine is the upgrade, not a different contract. Malformed bytes
    * → None (never-throw contract).
    */
  def decodeGifFrames(bytes: Array[Byte],
      everyK: Int): Option[(Int, Int, Seq[Array[Int]])] = {
    if (everyK <= 0) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      // explicit memory-backed stream: createImageInputStream defaults
      // to a temp-FILE cache (ImageIO.getUseCache) — see RasterDecoder
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(stream, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        val (cw, ch) = (reader.getWidth(0), reader.getHeight(0))
        if (cw <= 0 || ch <= 0) return None
        // (left, top, usesTransparency) per frame. Transparency matters
        // for the same honesty reason as the sub-rectangle check: a
        // FULL-canvas frame with a transparent palette index still
        // composites over the previous frame — resolving that index
        // through its palette RGB would return a plane that is not the
        // displayed frame, the wrong-answer class this guard rejects.
        def frameMeta(i: Int): (Int, Int, Boolean) = {
          val root = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val descs = root.getElementsByTagName("ImageDescriptor")
          val (left, top) =
            if (descs.getLength == 0) (0, 0)
            else {
              val e = descs.item(0).asInstanceOf[org.w3c.dom.Element]
              (e.getAttribute("imageLeftPosition").toInt,
                e.getAttribute("imageTopPosition").toInt)
            }
          val gces = root.getElementsByTagName("GraphicControlExtension")
          val transparent = (0 until gces.getLength).exists { g =>
            gces.item(g).asInstanceOf[org.w3c.dom.Element]
              .getAttribute("transparentColorFlag")
              .equalsIgnoreCase("true")
          }
          (left, top, transparent)
        }
        val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        var i = 0
        while (i < n) {
          val img = reader.read(i)
          val (fLeft, fTop, fTransparent) = frameMeta(i)
          if (img.getWidth != cw || img.getHeight != ch ||
            fLeft != 0 || fTop != 0 || fTransparent) return None
          val raster = img.getRaster
          val palette = img.getColorModel match {
            case icm: java.awt.image.IndexColorModel => Some(icm)
            case _ => None
          }
          val out = new Array[Int](cw * ch)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              out(y * cw + x) = palette match {
                case Some(icm) =>
                  val idx = raster.getSample(x, y, 0)
                  (icm.getRed(idx) + icm.getGreen(idx) + icm.getBlue(idx)) / 3
                case None => raster.getSample(x, y, 0)
              }
              x += 1
            }
            y += 1
          }
          planes += out
          i += everyK
        }
        Some((cw, ch, planes.toSeq))
      } finally {
        reader.dispose()
        stream.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** IMA/DVI ADPCM (fmt tag 0x0011) — a REAL compressed-audio codec in
    * pure integer math (IMA "Recommended Practices for Enhancing
    * Digital Audio Compatibility", 1992; the same tables every
    * implementation ships). 4 bits per sample, 4:1 vs PCM16: each
    * nibble encodes a quantized delta against an adaptive predictor,
    * and the step size adapts through the 89-entry table. The
    * ENCODER's reconstructed predictor is BY CONSTRUCTION the
    * decoder's output (it quantizes against its own reconstruction),
    * so encode→decode is one state recurrence — which is what lets the
    * DuckDB oracle restate the full lossy pipeline exactly
    * (multimodal_adpcm_decode). MP3/H.264 remain honestly stubbed
    * (decodeStub): those need licensed/native codecs; ADPCM is the
    * compressed arm that is genuinely implementable from the spec.
    */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA step shared by encoder and decoder: given state
    * (pred, idx) and a nibble, the reconstructed sample and next state.
    */
  private def imaStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var diffq = step >> 3
    if ((nibble & 4) != 0) diffq += step
    if ((nibble & 2) != 0) diffq += step >> 1
    if ((nibble & 1) != 0) diffq += step >> 2
    val p = if ((nibble & 8) != 0) pred - diffq else pred + diffq
    val clamped = math.max(-32768, math.min(32767, p))
    val nidx = math.max(0, math.min(88, idx + ImaIndexTable(nibble & 7)))
    (clamped, nidx)
  }

  /** Encode 16-bit mono samples as a single-block IMA ADPCM WAV:
    * RIFF/WAVE, fmt tag 0x0011 with the 2-byte extension carrying
    * samplesPerBlock, one data block (4-byte header: initial predictor
    * int16 LE + step index + reserved; then two nibbles per byte, LOW
    * nibble first). Sample 0 is stored verbatim in the header — the
    * standard block layout. Deterministic: initial step index 0.
    */
  def encodeImaAdpcmWav(samples: Array[Int]): Array[Byte] = {
    require(samples.nonEmpty, "ADPCM block needs at least one sample")
    // the single-block layout stores samplesPerBlock and blockAlign in
    // 16-bit header fields; past 65535 they would silently wrap and the
    // written header would LIE (decoder trims to the wrapped count) —
    // refuse loudly instead. Callers gate input length (the query's
    // WHERE carries the same bound as its oracle twin).
    require(samples.length <= 65535,
      s"single-block IMA ADPCM caps at 65535 samples, got ${samples.length}")
    val nib = new Array[Int](math.max(0, samples.length - 1))
    var pred = math.max(-32768, math.min(32767, samples(0)))
    val pred0 = pred
    var idx = 0
    var i = 1
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      val step = ImaStepTable(idx)
      var diff = s - pred
      var nibble = 0
      if (diff < 0) { nibble = 8; diff = -diff }
      if (diff >= step) { nibble |= 4; diff -= step }
      if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) nibble |= 1
      val (p2, i2) = imaStep(pred, idx, nibble)
      pred = p2; idx = i2
      nib(i - 1) = nibble
      i += 1
    }
    val dataBytes = (nib.length + 1) / 2
    val blockLen = 4 + dataBytes
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val block = new java.io.ByteArrayOutputStream(blockLen)
    block.write(le16(pred0), 0, 2)
    block.write(0 /* initial step index */); block.write(0 /* reserved */)
    var b = 0
    while (b < dataBytes) {
      val lo = nib(2 * b)
      val hi = if (2 * b + 1 < nib.length) nib(2 * b + 1) else 0
      block.write(lo | (hi << 4))
      b += 1
    }
    val data = block.toByteArray
    val pad = data.length & 1
    val fmt = le16(0x11) ++ le16(1) ++ le32(7968) ++ le32(3984) ++
      le16(blockLen) ++ le16(4) ++ le16(2) ++ le16(samples.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    out.write(le32(4 + 8 + fmt.length + 8 + data.length + pad), 0, 4)
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    out.write(le32(fmt.length), 0, 4)
    out.write(fmt, 0, fmt.length)
    out.write("data".getBytes("US-ASCII"), 0, 4)
    out.write(le32(data.length), 0, 4)
    out.write(data, 0, data.length)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** G.711 μ-law (PCMU) — the telephony companding codec, fmt tag
    * 0x0007: 16-bit linear → 8-bit via a signed logarithmic segment
    * encoding (8 chords × 16 steps). STATELESS per sample — unlike
    * ADPCM there is no predictor recurrence, so the oracle twin replays
    * it with plain per-row integer arithmetic, no recursive CTE. Both
    * directions are the ITU-T formula spelled with shifts and adds
    * only: no tables, no floats, so the SQL restatement is line-for-
    * line the same arithmetic.
    */
  private val MuLawBias = 132 // 0x84
  private val MuLawClip = 32635

  /** 16-bit linear sample → μ-law byte. */
  def muLawEncode(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    var m = math.min(if (sample < 0) -sample else sample, MuLawClip) + MuLawBias
    // chord = position of the highest set bit above bit 7 (m ≤ 32767,
    // so 0..7); spelled as thresholds to mirror the oracle's CASE
    val exp =
      if (m >= 16384) 7 else if (m >= 8192) 6 else if (m >= 4096) 5
      else if (m >= 2048) 4 else if (m >= 1024) 3 else if (m >= 512) 2
      else if (m >= 256) 1 else 0
    val mant = (m >> (exp + 3)) & 0x0f
    // ~x & 0xFF restated as 255 - x (x ∈ 0..255): the form DuckDB can
    // replay without a bitwise NOT
    255 - (sign | (exp << 4) | mant)
  }

  /** μ-law byte → 16-bit linear sample. */
  def muLawDecode(b: Int): Int = {
    val u = 255 - (b & 0xff)
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + MuLawBias) << exp) - MuLawBias
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Encode 16-bit mono samples as a μ-law WAV: RIFF/WAVE, fmt tag
    * 0x0007, 8 bits/sample, blockAlign 1 — one byte per sample plus the
    * word-alignment pad. Container size closed form: 44 + n + (n mod 2).
    */
  def encodeMuLawWav(samples: Array[Int]): Array[Byte] = {
    require(samples.nonEmpty, "µ-law WAV needs at least one sample")
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val n = samples.length
    val pad = n & 1
    val fmt = le16(0x0007) ++ le16(1) ++ le32(8000) ++ le32(8000) ++
      le16(1) ++ le16(8)
    val out = new java.io.ByteArrayOutputStream(44 + n + pad)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    out.write(le32(4 + 8 + fmt.length + 8 + n + pad), 0, 4)
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    out.write(le32(fmt.length), 0, 4)
    out.write(fmt, 0, fmt.length)
    out.write("data".getBytes("US-ASCII"), 0, 4)
    out.write(le32(n), 0, 4)
    var i = 0
    while (i < n) {
      out.write(muLawEncode(
        math.max(-32768, math.min(32767, samples(i)))))
      i += 1
    }
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** Decode the data blocks of a mono IMA ADPCM stream to 16-bit
    * samples, trimming each block to `samplesPerBlock`.
    */
  private def decodeImaBlocks(bytes: Array[Byte], off: Int, len: Int,
      blockAlign: Int, samplesPerBlock: Int): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blockStart = off
    while (blockStart + 4 <= off + len) {
      val blockLen = math.min(blockAlign, off + len - blockStart)
      var pred = ((bytes(blockStart + 1) << 8) | (bytes(blockStart) & 0xff))
      var idx = math.max(0, math.min(88, bytes(blockStart + 2) & 0xff))
      var produced = 1
      out += pred
      var p = blockStart + 4
      while (p < blockStart + blockLen && produced < samplesPerBlock) {
        val byte = bytes(p) & 0xff
        var half = 0
        while (half < 2 && produced < samplesPerBlock) {
          val nibble = if (half == 0) byte & 0xf else byte >> 4
          val (p2, i2) = imaStep(pred, idx, nibble)
          pred = p2; idx = i2
          out += pred
          produced += 1
          half += 1
        }
        p += 1
      }
      blockStart += blockLen
    }
    out.toArray
  }

  /** RIFF/WAVE chunk walk, dispatching on the `fmt ` tag: PCM
    * (audioFormat=1, 16-bit interleaved samples) or IMA ADPCM
    * (0x0011, 4-bit blocks). Either way the result is the decoded
    * sample plane requantized to 0..255 via floor(sample/256) + 128.
    */
  def decodeWavBytes(bytes: Array[Byte]): Option[Array[Int]] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      if (o + 4 <= bytes.length) new String(bytes, o, 4, "US-ASCII") else ""
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    // (formatTag, blockAlign, samplesPerBlock) once fmt is parsed:
    // PCM (1, 16-bit) and IMA ADPCM (0x11, 4-bit) are the real arms
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None // (offset, length)
    while (pos + 8 <= bytes.length && (data.isEmpty || fmt.isEmpty)) {
      val id = tag(pos)
      // keep the declared size as a Long: a 32-bit size field >= 2^31
      // truncated to Int goes negative and the cursor stops advancing
      // (an infinite loop on adversarial bytes, not the never-throw
      // None this decoder promises)
      val size = u32(pos + 4)
      if (id == "fmt " && pos + 8 + 16 <= bytes.length) {
        val ftag = u16(pos + 8)
        val nChannels = u16(pos + 8 + 2)
        val bits = u16(pos + 8 + 14)
        val blockAlign = u16(pos + 8 + 12)
        if (ftag == 1 && bits == 16) fmt = Some((1, blockAlign, 0))
        // G.711 μ-law: one byte per sample, mono (multi-channel would
        // interleave and the mono read would produce a garbage plane)
        else if (ftag == 0x07 && bits == 8 && nChannels == 1)
          fmt = Some((0x07, blockAlign, 0))
        // MONO only for ADPCM: stereo IMA interleaves 4-byte
        // per-channel words with one header per channel — reading that
        // as a mono nibble stream would return garbage, and a wrong
        // plane is worse than the stub fallback (None)
        else if (ftag == 0x11 && bits == 4 && nChannels == 1) {
          // samplesPerBlock from the 2-byte fmt extension; fall back to
          // the mono block capacity 1 + 2·(align−4) if absent
          val spb =
            if (size >= 20 && pos + 8 + 20 <= bytes.length) u16(pos + 8 + 18)
            else 1 + 2 * math.max(0, blockAlign - 4)
          fmt = Some((0x11, blockAlign, spb))
        }
      } else if (id == "data")
        data = Some((pos + 8, math.min(size, (bytes.length - pos - 8).toLong).toInt))
      // a size that overruns the buffer means nothing addressable
      // follows this chunk — stop instead of advancing past the end
      if (size > bytes.length - pos - 8) pos = bytes.length
      else pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, _, _)), Some((off, len))) =>
        val n = len / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = bytes(off + 2 * i) & 0xff
          val hi = bytes(off + 2 * i + 1) // signed high byte
          val sample = (hi << 8) | lo // sign-extended 16-bit
          out(i) = (sample >> 8) + 128
          i += 1
        }
        Some(out)
      case (Some((0x07, _, _)), Some((off, len))) =>
        // μ-law: stateless per-byte expansion, then the shared 8-bit
        // requantize
        Some(Array.tabulate(len)(i =>
          (muLawDecode(bytes(off + i) & 0xff) >> 8) + 128))
      // blockAlign == 4 is legal: the 4-byte block header alone carries
      // one verbatim sample, which is exactly what encodeImaAdpcmWav
      // emits for a 1-sample input
      case (Some((0x11, blockAlign, spb)), Some((off, len))) if blockAlign >= 4 =>
        // requantize the decoded 16-bit plane to 0..255 exactly like
        // the PCM arm: arithmetic >>8 (floor division) + 128
        Some(decodeImaBlocks(bytes, off, len, blockAlign, spb)
          .map(s => (s >> 8) + 128))
      case _ => None
    }
  }

  /** Minimal-but-valid MJPEG-in-AVI writer: RIFF 'AVI ' with an hdrl
    * LIST (avih main header, one 'vids'/'MJPG' stream with a
    * BITMAPINFOHEADER strf) and a movi LIST of '00dc' chunks, one JPEG
    * blob per frame, word-aligned. MJPEG is the one VIDEO codec this
    * engine can run end to end with zero native dependencies: the
    * container is pure byte arithmetic and every frame is a baseline
    * JPEG the existing imageio raster arm decodes. (H.264/MP4 stays
    * honestly stubbed — inter-frame codecs need a licensed/native
    * decoder.)
    */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty && w > 0 && h > 0 && fps > 0)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fourcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fourcc(id) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(4 + body.length) ++ fourcc(kind) ++ body

    val maxFrame = jpegFrames.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
      le32(0x10 /* AVIF_HASINDEX off; plain */) ++ le32(jpegFrames.length) ++
      le32(0) ++ le32(1 /* streams */) ++ le32(maxFrame) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1 /* scale */) ++ le32(fps /* rate */) ++
      le32(0) ++ le32(jpegFrames.length) ++ le32(maxFrame) ++
      le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegFrames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Every-k-th-frame sampling from an MJPEG AVI — the real-video
    * sibling of decodeGifFrames, same signature and never-throw
    * contract: walk the RIFF tree to the movi LIST, collect the
    * '00dc'/'00db' frame chunks, decode each sampled JPEG through one
    * reused RasterDecoder. Frame 0 is always sampled. Dimensions come
    * from the first DECODED frame (the strf header is advisory —
    * trusting it over the codec would hand back planes at the wrong
    * geometry); any sampled frame that fails to decode or disagrees on
    * dimensions → None rather than a wrong answer.
    */
  def decodeAviMjpegFrames(bytes: Array[Byte],
      everyK: Int): Option[(Int, Int, Seq[Array[Int]])] =
    decodeAviMjpegFrames(bytes, everyK, new RasterDecoder)

  /** Decoder-reuse overload: callers iterating many containers on one
    * executor thread (mapPartitions) pass ONE RasterDecoder so the
    * imageio reader lookup happens once per partition, not per row —
    * getImageReadersByFormatName walks a synchronized plugin registry,
    * a measurable contention point at 32 threads.
    */
  def decodeAviMjpegFrames(bytes: Array[Byte], everyK: Int,
      decoder: RasterDecoder): Option[(Int, Int, Seq[Array[Int]])] = {
    if (everyK <= 0) return None
    try {
      def u32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def tag(o: Int): String =
        if (o + 4 <= bytes.length) new String(bytes, o, 4, "US-ASCII") else ""
      if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
      // find the movi LIST at the top level of the RIFF body
      var pos = 12
      var movi: Option[(Int, Int)] = None // (offset after 'movi', end)
      while (pos + 12 <= bytes.length && movi.isEmpty) {
        val id = tag(pos)
        // Long, not .toInt: a declared size >= 2^31 truncated to Int is
        // negative, the cursor stops advancing, and the walk loops
        // forever on adversarial bytes instead of returning None
        val size = u32(pos + 4)
        if (id == "LIST" && tag(pos + 8) == "movi")
          movi = Some((pos + 12, math.min(pos + 8 + size, bytes.length.toLong).toInt))
        if (size > bytes.length - pos - 8) pos = bytes.length
        else pos += 8 + size.toInt + (size.toInt & 1)
      }
      val (start, end) = movi.getOrElse(return None)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // interleaved muxers group frames inside 'rec ' LISTs within
      // movi — descend into those; direct ##dc/##db children are the
      // simple layout this writer emits
      def scanChunks(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = tag(p)
          // same Long discipline as the top-level walk: an oversize or
          // wrapped chunk length must stop the scan, never spin it
          val size = u32(p + 4)
          if (id == "LIST" && tag(p + 8) == "rec ")
            scanChunks(p + 12, math.min(p + 8 + size, to.toLong).toInt)
          else if ((id.endsWith("dc") || id.endsWith("db")) && size > 0 &&
            p + 8 + size <= to) frames += ((p + 8, size.toInt))
          if (size > to - p - 8) p = to
          else p += 8 + size.toInt + (size.toInt & 1)
        }
      }
      scanChunks(start, end)
      if (frames.isEmpty) return None
      val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var dims: Option[(Int, Int)] = None
      var i = 0
      while (i < frames.length) {
        val (off, len) = frames(i)
        val jpeg = java.util.Arrays.copyOfRange(bytes, off, off + len)
        val (fw, fh, plane) = decoder.decodeLumaDims(jpeg).getOrElse(return None)
        // geometry from the DECODED raster; all sampled frames must agree
        dims match {
          case None => dims = Some((fw, fh))
          case Some((w, h)) => if (w != fw || h != fh) return None
        }
        planes += plane
        i += everyK
      }
      dims.map { case (w, h) => (w, h, planes.toSeq) }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
