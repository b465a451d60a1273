package graft

import graft.functions.ImageCodec
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

/** Real-byte decode tests: every fixture is constructed programmatically
  * from the published format specs (BMP file header layout, PNM text
  * header, PNG chunk grammar + zlib, JPEG marker stream) and then decoded
  * back — a full roundtrip, no golden binaries checked in. */
class ImageCodecSpec extends AnyFunSuite {

  // deterministic pseudo-random pixel pattern
  private def pix(i: Int): Byte = ((i * 31 + 7) % 251).toByte

  // ── fixture builders ──────────────────────────────────────────────────

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** 24-bit bottom-up BMP from top-down RGB pixels. */
  private def buildBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val dataSize = stride * h
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(54 + dataSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(24))
    out.write(le32(0)); out.write(le32(dataSize))
    out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val row = new Array[Byte](stride)
    for (y <- h - 1 to 0 by -1) { // bottom-up
      java.util.Arrays.fill(row, 0.toByte)
      for (x <- 0 until w) {
        val s = (y * w + x) * 3
        row(x * 3) = rgb(s + 2) // BGR
        row(x * 3 + 1) = rgb(s + 1)
        row(x * 3 + 2) = rgb(s)
      }
      out.write(row)
    }
    out.toByteArray
  }

  private def buildPnm(magic: String, w: Int, h: Int,
      raster: Array[Byte]): Array[Byte] = {
    val header = s"$magic\n# a comment\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ raster
  }

  /** Non-interlaced 8-bit PNG with a chosen per-row filter. */
  private def buildPng(w: Int, h: Int, channels: Int, pixels: Array[Byte],
      filter: Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      raw(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= channels) pixels(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          pixels((y - 1) * stride + x - channels) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = java.util.Arrays.copyOf(buf, n)

    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(payload)
      be32(payload.length) ++ t ++ payload ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
  }

  private def buildJpegHeader(w: Int, h: Int, ch: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 (JFIF), length 16
    out.write(0xff); out.write(0xe0); out.write(0); out.write(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(new Array[Byte](10))
    // SOF0: length 8+3*ch, precision 8, height, width, components
    out.write(0xff); out.write(0xc0)
    val len = 8 + 3 * ch
    out.write(len >> 8); out.write(len & 0xff)
    out.write(8)
    out.write(h >> 8); out.write(h & 0xff)
    out.write(w >> 8); out.write(w & 0xff)
    out.write(ch)
    for (c <- 0 until ch) { out.write(c + 1); out.write(0x11); out.write(0) }
    out.toByteArray
  }

  // ── decode tests ──────────────────────────────────────────────────────

  test("BMP 24-bit roundtrip, including stride padding (odd width)") {
    val (w, h) = (5, 3) // 5*3=15 bytes/row → 16-byte stride, pad exercised
    val rgb = Array.tabulate(w * h * 3)(pix)
    val info = ImageCodec.decode(buildBmp(w, h, rgb)).get
    assert(info.format === "bmp")
    assert((info.width, info.height, info.channels) === ((w, h, 3)))
    assert(info.pixels.get.toSeq === rgb.toSeq)
  }

  test("PPM P6 and PGM P5 roundtrip with header comments") {
    val (w, h) = (4, 2)
    val rgb = Array.tabulate(w * h * 3)(pix)
    val p6 = ImageCodec.decode(buildPnm("P6", w, h, rgb)).get
    assert(p6.format === "ppm" && p6.channels === 3)
    assert(p6.pixels.get.toSeq === rgb.toSeq)
    val gray = Array.tabulate(w * h)(pix)
    val p5 = ImageCodec.decode(buildPnm("P5", w, h, gray)).get
    assert(p5.format === "pgm" && p5.channels === 1)
    assert(p5.pixels.get.toSeq === gray.toSeq)
  }

  test("PNG roundtrip across every filter type and channel layout") {
    for (filter <- 0 to 4; channels <- Seq(1, 2, 3, 4)) {
      val (w, h) = (6, 4)
      val px = Array.tabulate(w * h * channels)(pix)
      val info = ImageCodec.decode(buildPng(w, h, channels, px, filter)).get
      assert(info.format === "png", s"filter=$filter ch=$channels")
      assert((info.width, info.height, info.channels) === ((w, h, channels)))
      assert(info.pixels.get.toSeq === px.toSeq,
        s"pixel mismatch at filter=$filter ch=$channels")
    }
  }

  test("JPEG SOF parse yields dimensions and channels, no pixels") {
    // header-only payload (no scan data): degrades to metadata-only
    val info = ImageCodec.decode(buildJpegHeader(640, 480, 3)).get
    assert(info.format === "jpeg")
    assert((info.width, info.height, info.channels) === ((640, 480, 3)))
    assert(info.pixels.isEmpty)
  }

  test("baseline JPEG decodes real pixels (ADVICE/VERDICT r7 task 5)") {
    // encode a solid-color image with the JDK encoder, decode with the
    // codec, and require the lossy roundtrip to stay within JPEG noise
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xC83214 else 0x1432C8)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val info = ImageCodec.decode(bos.toByteArray).get
    assert(info.format === "jpeg")
    assert((info.width, info.height, info.channels) === ((w, h, 3)))
    val px = info.pixels.get
    assert(px.length === w * h * 3)
    // sample interior pixels of each half (away from the lossy edge)
    def rgb(x: Int, y: Int) = {
      val d = (y * w + x) * 3
      ((px(d) & 0xff), (px(d + 1) & 0xff), (px(d + 2) & 0xff))
    }
    val (r1, g1, b1) = rgb(4, 12)
    assert(math.abs(r1 - 0xC8) < 24 && math.abs(g1 - 0x32) < 24 &&
      math.abs(b1 - 0x14) < 24, s"left half off: ($r1,$g1,$b1)")
    val (r2, g2, b2) = rgb(w - 4, 12)
    assert(math.abs(r2 - 0x14) < 24 && math.abs(g2 - 0x32) < 24 &&
      math.abs(b2 - 0xC8) < 24, s"right half off: ($r2,$g2,$b2)")
  }

  test("real DCTDecode page images from the reference PDFs decode") {
    val f = new java.io.File(
      "/root/reference/pdfs_enem/2023/2023_PV_impresso_D2_CD7.pdf")
    assume(f.exists(), "reference PDFs not present")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val jpegs = graft.functions.PdfCodec.extractImages(bytes)
      .filter(_.filter == "DCTDecode")
    assume(jpegs.nonEmpty, "no DCTDecode images in the booklet")
    val decoded = jpegs.map(im => ImageCodec.decode(im.bytes))
    // every DCT payload must at least carry SOF metadata; the decodable
    // majority must carry real pixels
    assert(decoded.forall(_.isDefined))
    val withPixels = decoded.flatten.count(_.pixels.isDefined)
    assert(withPixels > 0,
      s"0 of ${decoded.size} page JPEGs produced pixels")
  }

  test("palette PNG expands PLTE indexes to RGB") {
    val (w, h) = (10, 6)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val info = ImageCodec.decode(bos.toByteArray).get
    assert(info.format === "png")
    assert((info.width, info.height, info.channels) === ((w, h, 3)))
    val px = info.pixels.get
    def rgb(x: Int, y: Int) = {
      val d = (y * w + x) * 3
      ((px(d) & 0xff), (px(d + 1) & 0xff), (px(d + 2) & 0xff))
    }
    // indexed encoding is lossless: exact colors back
    assert(rgb(0, 0) === ((0xFF, 0, 0)))
    assert(rgb(1, 0) === ((0, 0, 0xFF)))
    assert(rgb(3, 2) === ((0, 0, 0xFF)))
  }

  test("PNM maxval below 255 rescales to the 8-bit contract — a " +
      "maxval-15 raster must not read near-black") {
    val raster = Array[Byte](0, 5, 10, 15)
    val bytes = "P5\n2 2\n15\n".getBytes("US-ASCII") ++ raster
    val img = ImageCodec.decode(bytes).get
    // v * 255 / 15 rounded: 0, 85, 170, 255
    assert(img.pixels.get.map(_ & 0xff).toSeq === Seq(0, 85, 170, 255))
  }

  test("PNG with an FDICT (preset dictionary) zlib header degrades to " +
      "None instead of spinning the inflate loop forever") {
    // 0x78 0x20: CMF=0x78, FLG=0x20 — FDICT bit set and
    // (0x78*256 + 0x20) % 31 == 0, so Inflater accepts the header and
    // then stalls waiting for a dictionary: zero progress, not EOF
    val idat = Array[Byte](0x78, 0x20, 1, 2, 3, 4)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(payload)
      be32(payload.length) ++ t ++ payload ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 0, 0, 0, 0)
    val png =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.empty[Byte])
    assert(ImageCodec.decode(png).isEmpty) // and returns, not hangs
  }

  test("corrupt and non-image payloads return None, never throw") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    // truncated PNG: valid signature+IHDR, body chopped
    val png = buildPng(8, 8, 3, Array.tabulate(8 * 8 * 3)(pix), 0)
    assert(ImageCodec.decode(java.util.Arrays.copyOf(png, 40)).isEmpty)
    // truncated BMP pixel data
    val bmp = buildBmp(4, 4, Array.tabulate(48)(pix))
    assert(ImageCodec.decode(java.util.Arrays.copyOf(bmp, 60)).isEmpty)
  }
}

/** Spark-side: the decode pipeline on a mixed batch of REAL images and
  * opaque payloads. */
class MultimodalDecodeSpec extends SparkSpec {

  test("Multimodal.decode parses real image bytes and falls back " +
      "to the opaque path for unknown formats") {
    import spark.implicits._
    def pix(i: Int): Byte = ((i * 31 + 7) % 251).toByte
    // a real 3x2 PPM, and an opaque text payload
    val rgb = Array.tabulate(3 * 2 * 3)(pix)
    val ppm = s"P6\n3 2\n255\n".getBytes("US-ASCII") ++ rgb
    val opaque = "just some bytes".getBytes("UTF-8")
    val ds = Seq(MediaRecord(1L, ppm), MediaRecord(2L, opaque))
      .toDS().repartition(2)
    val out = Multimodal.decode(ds).collect().sortBy(_.id)
    assert(out.length === 2)
    val img = out(0)
    assert(img.format === "ppm")
    assert((img.width, img.height, img.channels) === ((3, 2, 3)))
    assert(img.nFrames === 1)
    val op = out(1)
    assert(op.format === "opaque")
    assert((op.width, op.height, op.channels) === ((-1, -1, -1)))
    assert(op.nFrames === opaque.length % 8 + 1)
    assert(op.nBytes === opaque.length)
  }
}
