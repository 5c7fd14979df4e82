package graft.ops

/** Real, dependency-free decoders for the multimodal pipeline — formats
  * whose decoding is pure byte arithmetic, so "no imaging libraries in
  * the sandbox" is no excuse: PPM (P6) raster images and RIFF/WAVE
  * 16-bit PCM audio. `Multimodal.extractFeatures` dispatches on
  * media_type: these formats get REAL decoded planes/samples; types
  * that genuinely need a native codec (JPEG, MP3, H.264) fall back to
  * the documented deterministic stub.
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

    def decodeLuma(bytes: Array[Byte]): Option[Array[Int]] = {
      try {
        val img = sniff(bytes) match {
          case Some(fmt) =>
            val reader = readers.getOrElseUpdate(fmt, {
              val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
              if (!it.hasNext) return None
              it.next()
            })
            reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes)), true, true)
            reader.read(0)
          case None => // unknown magic: the slow generic path, rare by contract
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        }
        lumaPlane(img)
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

  /** RIFF/WAVE with a PCM (audioFormat=1) `fmt ` chunk and 16-bit
    * samples: walks the chunk list, returns all interleaved samples
    * requantized to 0..255 via (sample >> 8) + 128.
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
    var fmtOk = false
    var data: Option[(Int, Int)] = None // (offset, length)
    while (pos + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
      val id = tag(pos)
      val size = u32(pos + 4).toInt
      if (id == "fmt " && pos + 8 + 16 <= bytes.length)
        fmtOk = u16(pos + 8) == 1 && u16(pos + 8 + 14) == 16 // PCM, 16-bit
      else if (id == "data")
        data = Some((pos + 8, math.min(size, bytes.length - pos - 8)))
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk) return None
    data.map { case (off, len) =>
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
      out
    }
  }
}
