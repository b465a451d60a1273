package graft.functions

import java.util.zip.Inflater

/** Pure-JVM image decoding for the multimodal column pipeline — no native
  * libraries, so it runs in any executor container. Formats:
  *
  *  - BMP: uncompressed 24/32-bit (BITMAPINFOHEADER) → full pixel decode
  *  - PPM/PGM (P5/P6 binary, maxval ≤ 255) → full pixel decode
  *  - PNG: 8-bit gray / gray+alpha / RGB / RGBA / palette (PLTE-indexed,
  *    expanded to RGB), non-interlaced → full pixel decode (zlib via
  *    `java.util.zip.Inflater`, per-scanline defilter:
  *    None/Sub/Up/Average/Paeth)
  *  - JPEG: full pixel decode via the JDK ImageIO reader (baseline +
  *    progressive; CMYK/YCCK raster fallback with Adobe APP14
  *    handling); SOF metadata-only degradation for unsupported scans
  *
  * Decoded pixels are row-major, top-down, channel-interleaved unsigned
  * bytes — the batch layout a feature extractor or resize kernel consumes
  * directly. Every parser is defensive: any structural violation returns
  * None rather than throwing, so a corrupt payload degrades to the opaque
  * path instead of failing the task (at 100 TB some payloads WILL be
  * truncated).
  */
object ImageCodec {

  /** Sanity cap on header-declared pixel counts for formats whose raster
    * is COMPRESSED (PNG: output size isn't bounded by input size, unlike
    * BMP/PNM which validate against the file length before allocating).
    * 64M pixels ≈ 256 MB RGBA — far above any document image. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** format ∈ {bmp, ppm, pgm, png, jpeg}; pixels is Some(row-major
    * interleaved bytes), or None when only metadata could be recovered
    * (e.g. a JPEG whose scan data is truncated/unsupported). */
  final case class ImageInfo(format: String, width: Int, height: Int,
      channels: Int, pixels: Option[Array[Byte]])

  /** Sniff the magic bytes and dispatch; None = not a recognized image. */
  def decode(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if (bytes(0) == 'P' &&
        (bytes(1) == '5' || bytes(1) == '6')) decodePnm(bytes)
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
      else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        decodeJpegMeta(bytes)
      else None
    } catch { case _: Exception => None } // corrupt payload → opaque path
  }

  // ── BMP ────────────────────────────────────────────────────────────────

  // i32, not u32: BMP height is SIGNED (negative = top-down raster)
  private def le16(b: Array[Byte], off: Int): Int =
    LittleEndian.u16(b, off)
  private def le32(b: Array[Byte], off: Int): Int =
    LittleEndian.i32(b, off)

  private def decodeBmp(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 54) return None
    val dataOff = le32(b, 10)
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || height == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val ch = bpp / 8
    val rowRaw = width * ch
    val stride = (rowRaw + 3) / 4 * 4 // rows pad to 4-byte boundaries
    if (dataOff.toLong + stride.toLong * height > b.length) return None
    val out = new Array[Byte](width * height * ch)
    var y = 0
    while (y < height) {
      val srcRow = dataOff + (if (bottomUp) (height - 1 - y) else y) * stride
      var x = 0
      while (x < width) {
        val s = srcRow + x * ch
        val d = (y * width + x) * ch
        // BMP stores BGR(A); emit RGB(A)
        out(d) = b(s + 2)
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        if (ch == 4) out(d + 3) = b(s + 3)
        x += 1
      }
      y += 1
    }
    Some(ImageInfo("bmp", width, height, ch, Some(out)))
  }

  // ── PPM / PGM (binary) ────────────────────────────────────────────────

  private def decodePnm(b: Array[Byte]): Option[ImageInfo] = {
    val ch = if (b(1) == '6') 3 else 1
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < b.length && {
        val c = b(pos)
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c == ' ' || c == '\t' || c == '\r' || c == '\n'
      }) pos += 1
      var v = -1
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(pos) - '0')
        pos += 1
      }
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 255)
      return None
    pos += 1 // exactly one whitespace byte before the raster
    val n = width * height * ch
    if (pos + n > b.length) return None
    val raster = java.util.Arrays.copyOfRange(b, pos, pos + n)
    // the decoded-pixel contract is 8-bit samples: a maxval below 255
    // (legal PNM) must RESCALE, or the image reads near-black to every
    // 0-255 consumer and round-trips through encodePnm (maxval 255)
    // silently darkened. Integer rounding keeps 0→0 and maxval→255.
    if (maxval < 255) {
      var i = 0
      while (i < raster.length) {
        raster(i) = (((raster(i) & 0xff) * 255 + maxval / 2) / maxval)
          .min(255).toByte
        i += 1
      }
    }
    Some(ImageInfo(if (ch == 3) "ppm" else "pgm", width, height, ch,
      Some(raster)))
  }

  // ── PNG ───────────────────────────────────────────────────────────────

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def decodePng(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 33) return None
    // IHDR is required first: length(4) "IHDR"(4) at offset 8
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' ||
      b(14) != 'D' || b(15) != 'R') return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (width <= 0 || height <= 0) return None
    // header-derived allocation bound (ADVICE r7 #3): a hostile IHDR
    // claiming 50000×50000 RGBA would force multi-GB allocations and an
    // uncatchable OutOfMemoryError before any IDAT data is validated —
    // cap total samples BEFORE allocating so corrupt payloads degrade to
    // None per the decode contract instead of killing the executor.
    if (width.toLong * height > MaxPixels) return None
    val isPalette = colorType == 3
    val ch = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index per pixel (expanded to RGB below)
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    if (bitDepth != 8 || interlace != 0) return None
    // concatenate IDAT chunk payloads; collect PLTE for palette images
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var pos = 33
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (len < 0 || pos + 8L + len + 4 > b.length) return None
      if (typ == "IDAT") idat.write(b, pos + 8, len)
      if (typ == "PLTE" && len % 3 == 0 && len <= 768)
        plte = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + len)
      if (typ == "IEND") done = true
      pos += 8 + len + 4 // chunk + CRC
    }
    if (isPalette && plte == null) return None
    val stride = width * ch
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new Inflater()
    // try/finally: the truncated-stream early return must ALSO free the
    // Inflater's native memory (per-malformed-image finalizer debt)
    var got = 0
    try {
      inf.setInput(idat.toByteArray)
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // bail on ANY zero-progress state, not just needsInput: a zlib
        // header with the FDICT preset-dictionary flag makes inflate()
        // return 0 with needsInput() false forever — the PdfCodec
        // inflate loop's contract, without which one crafted IDAT
        // hangs the task thread instead of degrading to None
        if (n == 0) return None
        got += n
      }
    } finally inf.end()
    if (got < raw.length) return None
    // per-scanline defilter (PNG spec §6): each row = filter byte + data
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= ch) out(dst + x - ch) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= ch) out(dst - stride + x - ch) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (isPalette) {
      // expand palette indexes to interleaved RGB (out-of-range index =
      // corrupt payload -> degrade to None per the decode contract)
      val n = plte.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        val idx = out(i) & 0xff
        if (idx >= n) return None
        rgb(i * 3) = plte(idx * 3)
        rgb(i * 3 + 1) = plte(idx * 3 + 1)
        rgb(i * 3 + 2) = plte(idx * 3 + 2)
        i += 1
      }
      Some(ImageInfo("png", width, height, 3, Some(rgb)))
    } else Some(ImageInfo("png", width, height, ch, Some(out)))
  }

  // ── JPEG ──────────────────────────────────────────────────────────────

  /** SOF-header scan: (width, height, channels). */
  private def jpegSof(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone markers carry no length
      } else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2) return None
        // SOF0/1/2 (baseline / extended / progressive)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (pos + 9 >= b.length) return None
          val height = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
          val width = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
          val ch = b(pos + 9) & 0xff
          if (width <= 0 || height <= 0) return None
          return Some((width, height, ch))
        }
        pos += 2 + len
      }
    }
    None
  }

  /** Adobe APP14 transform flag (2 = YCCK for 4-channel), if present. */
  private def adobeTransform(b: Array[Byte]): Option[Int] = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
      else if (marker == 0xda) return None // scan data: stop
      else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2) return None
        if (marker == 0xee && len >= 13 && pos + 4 + 5 <= b.length &&
            new String(b, pos + 4, 5, "US-ASCII") == "Adobe")
          return Some(b(pos + 2 + len - 1) & 0xff)
        pos += 2 + len
      }
    }
    None
  }

  /** Full JPEG pixel decode via the JDK's ImageIO reader (part of Java
    * SE — no external dependency), with a raw-raster fallback for CMYK/
    * YCCK payloads that the default reader rejects (Adobe APP14
    * transform 2), mirroring the reference's CMYK→RGB page-image path
    * (`enem_pdf_extractor.py:297-335`). Pixels come back as row-major
    * interleaved RGB; anything undecodable degrades to the SOF
    * metadata-only record (pixels = None), never a throw. */
  private def decodeJpegMeta(b: Array[Byte]): Option[ImageInfo] = {
    val sof = jpegSof(b)
    if (sof.isEmpty) return None
    val (w0, h0, ch0) = sof.get
    // header-derived bound BEFORE ImageIO allocates the raster
    if (w0.toLong * h0 > MaxPixels)
      return Some(ImageInfo("jpeg", w0, h0, ch0, None))
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b))
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          out(i * 3) = ((argb(i) >> 16) & 0xff).toByte
          out(i * 3 + 1) = ((argb(i) >> 8) & 0xff).toByte
          out(i * 3 + 2) = (argb(i) & 0xff).toByte
          i += 1
        }
        Some(ImageInfo("jpeg", w, h, 3, Some(out)))
      } else decodeJpegCmyk(b, w0, h0, ch0)
    } catch {
      case _: Exception => decodeJpegCmyk(b, w0, h0, ch0)
    }
  }

  /** CMYK/YCCK fallback: read the raw 4-band raster (the Huffman/DCT
    * layer works even when the reader rejects the color space), undo the
    * YCCK transform if APP14 says so, and apply the Adobe-inverted
    * CMYK→RGB conversion. */
  private def decodeJpegCmyk(b: Array[Byte], w0: Int, h0: Int,
      ch0: Int): Option[ImageInfo] = {
    val metaOnly = Some(ImageInfo("jpeg", w0, h0, ch0, None))
    if (ch0 != 4) return metaOnly
    try {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
      if (!readers.hasNext) return metaOnly
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      reader.setInput(iis)
      val raster = reader.readRaster(0, null)
      reader.dispose()
      val w = raster.getWidth
      val h = raster.getHeight
      if (raster.getNumBands != 4 || w.toLong * h > MaxPixels)
        return metaOnly
      val ycck = adobeTransform(b).contains(2)
      val out = new Array[Byte](w * h * 3)
      val row = new Array[Int](w * 4)
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var x = 0
        while (x < w) {
          var c = row(x * 4); var m = row(x * 4 + 1)
          var ye = row(x * 4 + 2); val k = row(x * 4 + 3)
          if (ycck) {
            // YCCK: first convert YCbCr→RGB, then treat as inverted CMY
            val yy = c.toDouble; val cb = m.toDouble; val cr = ye.toDouble
            c = clamp255(yy + 1.402 * (cr - 128))
            m = clamp255(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
            ye = clamp255(yy + 1.772 * (cb - 128))
          }
          // Adobe JPEGs store CMYK INVERTED: stored value v == 255−ink
          val d = (y * w + x) * 3
          out(d) = ((c * k) / 255).toByte
          out(d + 1) = ((m * k) / 255).toByte
          out(d + 2) = ((ye * k) / 255).toByte
          x += 1
        }
        y += 1
      }
      Some(ImageInfo("jpeg", w, h, 3, Some(out)))
    } catch { case _: Exception => metaOnly }
  }

  private def clamp255(v: Double): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  // ── perceptual hash ────────────────────────────────────────────────────

  /** 64-bit difference hash (dHash) over a decoded raster: grayscale →
    * box-resample to 9×8 → bit (y,x) = gray(y,x) < gray(y,x+1), MSB
    * first. Near-duplicate images (recompression, slight crops/blur)
    * land within a few bits of Hamming distance; unrelated images are
    * ~32 bits apart. None when the image has no materialized pixels
    * (metadata-only formats) or degenerate dimensions. */
  def dHash64(info: ImageInfo): Option[Long] = info.pixels match {
    case Some(px) if info.width > 0 && info.height > 0 =>
      val (w, h, ch) = (info.width, info.height, info.channels)
      // 9×8 box-average luma grid; integer bucket edges (i*dim/9) so the
      // hash is exactly reproducible across platforms — no fp resampling
      val grid = Array.ofDim[Double](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9; val x1 = math.max((gx + 1) * w / 9, x0 + 1)
          var sum = 0L; var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val base = (y * w + x) * ch
              var c = 0; var s = 0
              while (c < ch) { s += px(base + c) & 0xff; c += 1 }
              sum += s / ch; n += 1
              x += 1
            }
            y += 1
          }
          grid(gy)(gx) = if (n == 0) 0.0 else sum.toDouble / n
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var i = 0
      while (i < 64) {
        val (y, x) = (i / 8, i % 8)
        hash = (hash << 1) | (if (grid(y)(x) < grid(y)(x + 1)) 1L else 0L)
        i += 1
      }
      Some(hash)
    case _ => None
  }

  /** Decode + hash in one call; None for undecodable/pixel-less payloads. */
  def dHash64(bytes: Array[Byte]): Option[Long] = decode(bytes).flatMap(dHash64)

  /** Boxed-null form for the codegen path ([[DHash64Expr]]): one static
    * call per row, null = undecodable. */
  def dHash64OrNull(bytes: Array[Byte]): java.lang.Long =
    dHash64(bytes).map(java.lang.Long.valueOf).orNull

  // ── resize ─────────────────────────────────────────────────────────────

  /** Box-average resample to `ow`×`oh`, preserving channel count — the
    * same integer-bucket-edge scheme as [[dHash64]]'s grid (pixel (gy,gx)
    * averages source rows [gy·h/oh, (gy+1)·h/oh) × cols [gx·w/ow,
    * (gx+1)·w/ow), each bucket at least one source pixel), so results are
    * exactly reproducible across platforms and an n× pixel replication
    * resizes back to the original raster bit-exactly. None for inputs
    * without materialized pixels or non-positive targets. */
  def resize(info: ImageInfo, ow: Int, oh: Int): Option[ImageInfo] =
    info.pixels match {
      case Some(px) if ow > 0 && oh > 0 && info.width > 0 && info.height > 0 =>
        val (w, h, ch) = (info.width, info.height, info.channels)
        val out = new Array[Byte](ow * oh * ch)
        var gy = 0
        while (gy < oh) {
          val y0 = gy * h / oh; val y1 = math.max((gy + 1) * h / oh, y0 + 1)
          var gx = 0
          while (gx < ow) {
            val x0 = gx * w / ow; val x1 = math.max((gx + 1) * w / ow, x0 + 1)
            var c = 0
            while (c < ch) {
              var sum = 0L; var n = 0
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  sum += px((y * w + x) * ch + c) & 0xff; n += 1
                  x += 1
                }
                y += 1
              }
              out((gy * ow + gx) * ch + c) =
                (if (n == 0) 0 else (sum / n).toInt).toByte
              c += 1
            }
            gx += 1
          }
          gy += 1
        }
        Some(ImageInfo(info.format, ow, oh, ch, Some(out)))
      case _ => None
    }

  /** Serialize a decoded raster as a binary PNM payload (P5 for 1
    * channel, P6 for 3) — the round-trippable re-encode for resize
    * pipelines; None for channel counts PNM cannot carry. */
  def encodePnm(info: ImageInfo): Option[Array[Byte]] = info.pixels match {
    case Some(px) if info.channels == 1 || info.channels == 3 =>
      val magic = if (info.channels == 1) "P5" else "P6"
      Some(s"$magic ${info.width} ${info.height} 255\n"
        .getBytes("US-ASCII") ++ px)
    case _ => None
  }
}
