package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedRecord, MediaRecord}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary feature columns match a local computation") {
    import spark.implicits._
    val payloads = Seq(0L -> "tiny", 1L -> "a longer binary payload body")
      .map { case (id, s) => (id, s.getBytes("UTF-8")) }
    val df = payloads.toDF("id", "bytes")
    val got = Multimodal.features(df, "id", "bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1)
    payloads.zip(got).foreach { case ((id, bytes), (gid, n, hash, frames)) =>
      assert(gid === id)
      assert(n === bytes.length)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(hash === md5)
      assert(frames === bytes.length % 8 + 1)
    }
  }

  test("writeBinaryFiles: one file per row, bytes intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    val rows = Seq(("a.png", "alpha".getBytes("UTF-8")),
      ("b.png", "bravo".getBytes("UTF-8")))
    Multimodal.writeBinaryFiles(rows.toDF("name", "bytes").repartition(2),
      dir, "name", "bytes")
    rows.foreach { case (name, bytes) =>
      val got = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, name))
      assert(got.toSeq === bytes.toSeq)
    }
  }

  test("typed per-partition decode keeps one output row per input record") {
    import spark.implicits._
    val ds = (0L until 20L)
      .map(i => MediaRecord(i, s"payload-$i".getBytes("UTF-8")))
      .toDS().repartition(4)
    val out: Array[DecodedRecord] = Multimodal.decode(ds).collect()
    assert(out.length === 20)
    assert(out.map(_.id).sorted === (0L until 20L).toArray)
    // deterministic: same input → same decoded metadata on every run
    val again = Multimodal.decode(ds).collect().sortBy(_.id)
    assert(out.sortBy(_.id).toSeq === again.toSeq)
  }

  test("balancedBySize bounds every partition's payload and isolates " +
      "oversize rows") {
    import spark.implicits._
    // heavy-tailed: one 2500-byte "video", some mid, many small
    val sizes = Seq(2500, 700, 650, 300) ++ Seq.fill(20)(100)
    val df = sizes.zipWithIndex
      .map { case (sz, i) => (i.toLong, Array.fill(sz)('x'.toByte)) }
      .toDF("id", "bytes").repartition(5)
    val target = 1000L
    val out = Multimodal.balancedBySize(df, "id", "bytes", target)

    // row preservation
    assert(out.count() === sizes.length)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      === sizes.indices.map(_.toLong).toArray)

    // per-PARTITION byte budget: ≤ target + that partition's last row
    val perPart = out.select(col("bytes"))
      .rdd.mapPartitions { it =>
        val szs = it.map(_.getAs[Array[Byte]](0).length.toLong).toSeq
        if (szs.isEmpty) Iterator.empty
        else Iterator.single((szs.sum, szs.last))
      }.collect()
    perPart.foreach { case (sum, last) =>
      assert(sum <= target + last, s"partition holds $sum bytes")
    }

    // the oversize row sits alone in its partition
    val oversizeAlone = out.select(col("bytes"))
      .rdd.mapPartitions { it =>
        val szs = it.map(_.getAs[Array[Byte]](0).length).toSeq
        Iterator.single(szs.contains(2500) && szs.length == 1)
      }.collect()
    assert(oversizeAlone.count(identity) === 1)

    // one bucket per partition (placement is exact, not hashed)
    val bucketsPerPart = out.select(col("task_bucket"))
      .rdd.mapPartitions(it => Iterator.single(it.map(_.getInt(0)).toSet))
      .collect()
    bucketsPerPart.foreach(b => assert(b.size <= 1))
  }

  test("sampleFrames: every=1 frames reassemble the exact payload; " +
      "every=2 keeps the even frame indices") {
    import spark.implicits._
    val payloads = Seq(
      1L -> "short",
      2L -> "a considerably longer payload with many bytes inside it",
      3L -> "x")
    val media = payloads
      .map { case (id, s) => Multimodal.MediaRecord(id, s.getBytes("UTF-8")) }
      .toDS()
    val all = Multimodal.sampleFrames(media, every = 1).collect()
      .groupBy(_.id)
    payloads.foreach { case (id, s) =>
      val reassembled = all(id).sortBy(_.frame_idx)
        .flatMap(_.frame_bytes)
      assert(reassembled === s.getBytes("UTF-8").toSeq,
        s"payload $id did not reassemble")
    }
    val sampled = Multimodal.sampleFrames(media, every = 2).collect()
    assert(sampled.forall(_.frame_idx % 2 === 0))
    // sampled frames are byte-identical to their every=1 counterparts
    sampled.foreach { f =>
      val full = all(f.id).find(_.frame_idx == f.frame_idx).get
      assert(f.frame_bytes.toSeq === full.frame_bytes.toSeq)
    }
  }

  /** 16×16 grayscale PGM whose pixel (y,x) is f(y*16+x) — a deterministic
    * image fixture; two fixtures with mostly-equal pixel functions decode
    * to near-identical rasters and thus near-equal dHashes. */
  private def pgm16(f: Int => Int): Array[Byte] = {
    val header = "P5 16 16 255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(256)(i => (f(i) & 0xff).toByte)
  }

  test("perceptualHash: near-identical images land within Hamming 3, " +
    "unrelated images far apart, undecodable payloads null") {
    import spark.implicits._
    def base(i: Int) = (i * 7 + (i / 16) * 31) % 256
    val rows = Seq(
      0L -> pgm16(base),                                 // original
      1L -> pgm16(i => if (i == 40) base(i) + 4 else base(i)), // 1px nudge
      2L -> pgm16(i => 255 - base(i)),                   // inverted
      3L -> "not an image".getBytes("UTF-8"))            // undecodable
    val hashed = Multimodal.perceptualHash(
      rows.toDF("id", "bytes"), "id", "bytes")
    val got = hashed.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(3L) === None)
    val Seq(h0, h1, h2) = Seq(0L, 1L, 2L).map(got(_).get)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3)
    assert(java.lang.Long.bitCount(h0 ^ h2) > 16) // inversion flips the hash
    // determinism: same bytes → same hash via the bytes-level entry point
    assert(graft.functions.ImageCodec.dHash64(pgm16(base)) === Some(h0))
  }

  test("resizeImages: downscale of a 2x-replicated image recovers the " +
    "base raster bit-exactly; undecodable payloads null; dims honored") {
    import spark.implicits._
    def base(i: Int) = (i * 7 + (i / 16) * 31) % 256
    val b16 = pgm16(base)
    // 32×32 upscale by pixel replication of the same 16×16 raster
    val up = ("P5 32 32 255\n".getBytes("US-ASCII") ++
      Array.tabulate(1024) { i =>
        val (y, x) = (i / 32, i % 32)
        (base((y / 2) * 16 + x / 2) & 0xff).toByte
      })
    val rows = Seq(1L -> up, 2L -> "junk".getBytes("UTF-8"))
    val got = Multimodal.resizeImages(
        rows.toDF("id", "bytes"), "id", "bytes", w = 16, h = 16)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Array[Byte]](1))))
      .toMap
    assert(got(2L) === None)
    assert(got(1L).get.toSeq === b16.toSeq) // bit-exact round trip
    val redecoded = graft.functions.ImageCodec.decode(got(1L).get).get
    assert(redecoded.width === 16 && redecoded.height === 16 &&
      redecoded.channels === 1)
  }

  test("phashNearDupPairs: banded candidates find planted near-dups and " +
    "nothing else; hamming verified exactly") {
    import spark.implicits._
    def base(i: Int) = (i * 11 + (i / 16) * 13) % 256
    val rows = Seq(
      0L -> pgm16(base),
      1L -> pgm16(i => if (i == 100) base(i) + 6 else base(i)), // near-dup of 0
      2L -> pgm16(i => (i * 97 + 55) % 256),                    // unrelated
      3L -> pgm16(base))                                        // exact dup of 0
    val hashed = Multimodal.perceptualHash(
      rows.toDF("id", "bytes"), "id", "bytes")
    val pairs = Multimodal.phashNearDupPairs(hashed, "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue))
      .sortBy(p => (p._1, p._2))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 3L))) // exact dup, hamming 0
    assert(pairSet.contains((0L, 1L)) && pairSet.contains((1L, 3L)))
    assert(!pairSet.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated out
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 === 0L)
    pairs.foreach(p => assert(p._3 <= 3L))
  }

  test("WavCodec: PCM16 round trip preserves features; malformed bytes " +
      "decode to None") {
    import graft.functions.WavCodec
    // 1 kHz-ish square-ish tone at 8 kHz, 0.5 s, amplitude 0.5
    val sr = 8000
    val tone = Array.tabulate(sr / 2)(i =>
      if ((i / 4) % 2 == 0) 0.5f else -0.5f)
    val bytes = WavCodec.encodePcm16(sr, tone)
    val w = WavCodec.decode(bytes).get
    assert(w.sampleRate === sr && w.channels === 1 &&
      w.samples.length === tone.length)
    val f = WavCodec.features(w)
    assert(f.durationMs === 500L)
    // RMS of a +-0.5 square wave is 0.5 -> 500 milli
    assert(math.abs(f.rmsMilli - 500L) <= 1L)
    assert(math.abs(f.peakMilli - 500L) <= 1L)
    assert(f.silenceMilli === 0L)
    // period 8 samples -> 2 crossings per period -> 250 per 1000
    assert(math.abs(f.zcrMilli - 250L) <= 2L)
    // malformed: wrong magic, truncation, empty
    assert(WavCodec.decode("not a wav at all".getBytes("UTF-8")).isEmpty)
    assert(WavCodec.decode(java.util.Arrays.copyOf(bytes, 30)).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("audioFeatures: per-row features through the frame; undecodable " +
      "payloads keep their row with null features") {
    import spark.implicits._
    import graft.functions.WavCodec
    val sr = 8000
    val silence = Array.fill(sr)(0.0f)
    val loud = Array.tabulate(sr)(i => if (i % 2 == 0) 0.9f else -0.9f)
    val rows = Seq(
      (0L, WavCodec.encodePcm16(sr, silence)),
      (1L, WavCodec.encodePcm16(sr, loud)),
      (2L, "junk".getBytes("UTF-8")))
    val got = graft.operators.Multimodal.audioFeatures(
        rows.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("silence_milli") === 1000L)
    assert(got(0L).getAs[Long]("duration_ms") === 1000L)
    assert(got(1L).getAs[Long]("silence_milli") === 0L)
    assert(got(1L).getAs[Long]("rms_milli") >= 890L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("duration_ms")))
  }

  test("audioFingerprints: amplitude-scaled copy collides exactly, " +
      "different content lands far, and the image-axis LSH pair " +
      "generator works unchanged") {
    import spark.implicits._
    import graft.functions.WavCodec
    val sr = 8000
    // a 2 s "melody": 20 segments of 0.1 s, each at a seed-derived level
    def melody(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val levels = Array.fill(20)(0.1f + r.nextInt(8) * 0.1f)
      Array.tabulate(sr * 2) { i =>
        val amp = levels(math.min(19, i / (sr / 10)))
        if (i % 2 == 0) amp else -amp
      }
    }
    val base = melody(1)
    val scaled = base.map(x => x * 0.5f) // uniform gain
    val other = melody(9)
    val rows = Seq((0L, WavCodec.encodePcm16(sr, base)),
      (1L, WavCodec.encodePcm16(sr, scaled)),
      (2L, WavCodec.encodePcm16(sr, other)),
      (3L, "junk".getBytes("UTF-8")))
    val hashed = graft.operators.Multimodal.audioFingerprints(
      rows.toDF("doc_id", "bytes"), "doc_id", "bytes")
    val hs = hashed.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hs(0L).isDefined && hs(3L).isEmpty)
    // amplitude invariance: energy COMPARISONS are gain-invariant
    assert(hs(0L) === hs(1L))
    assert(java.lang.Long.bitCount(hs(0L).get ^ hs(2L).get) > 3)
    val pairs = graft.operators.Multimodal.phashNearDupPairs(
        hashed, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("AviCodec: encode/parse round trip — header metadata, frame " +
      "count and payload bytes; malformed containers degrade to None") {
    import graft.functions.AviCodec
    val frames = (0 until 5).map(i => s"frame payload number $i x".getBytes("UTF-8"))
    val avi = AviCodec.encode(320, 240, 40000, frames) // 25 fps
    val info = AviCodec.decodeInfo(avi).get
    assert(info.width === 320 && info.height === 240)
    assert(info.usPerFrame === 40000 && info.declaredFrames === 5)
    assert(info.frameChunks === 5)
    val got = AviCodec.frames(avi)
    assert(got.length === 5)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(AviCodec.decodeInfo("RIFFjunk".getBytes("UTF-8")).isEmpty)
    assert(AviCodec.decodeInfo(java.util.Arrays.copyOf(avi, 20)).isEmpty)
    assert(AviCodec.frames(java.util.Arrays.copyOf(avi, 40)).isEmpty)
  }

  test("videoMeta + videoFrameSample: every-Nth frames explode and " +
      "decode through the image stack; undecodable keeps a null row") {
    import spark.implicits._
    import graft.functions.AviCodec
    def pgm(seed: Int): Array[Byte] =
      "P5 16 16 255\n".getBytes("US-ASCII") ++
        Array.tabulate(256)(i => (((i * 7 + seed * 31) % 256) & 0xff).toByte)
    val frames = (0 until 6).map(pgm)
    val avi = AviCodec.encode(16, 16, 100000, frames)
    val rows = Seq((0L, avi), (1L, "not avi".getBytes("UTF-8")))
    val meta = graft.operators.Multimodal.videoMeta(
        rows.toDF("vid", "bytes"), "vid", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(0L).getAs[Int]("width") === 16)
    assert(meta(0L).getAs[Long]("fps_milli") === 10000L)
    assert(meta(0L).getAs[Int]("frame_chunks") === 6)
    assert(meta(1L).isNullAt(meta(1L).fieldIndex("width")))
    val sampled = graft.operators.Multimodal.videoFrameSample(
        rows.toDF("vid", "bytes"), "vid", "bytes", every = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]]("frame_bytes")))
    assert(sampled.map(x => (x._1, x._2)).toSet ===
      Set((0L, 0), (0L, 2), (0L, 4)))
    // every sampled frame decodes through ImageCodec (image stack reuse)
    sampled.foreach { case (_, idx, b) =>
      assert(graft.functions.ImageCodec.dHash64(b).isDefined, s"frame $idx")
      assert(b.sameElements(frames(idx)))
    }
  }

  test("videoFingerprints: re-encoded copy collides, different content " +
      "far, LSH pair generator unchanged on the video axis") {
    import spark.implicits._
    import graft.functions.AviCodec
    def pgm(f: Int => Int): Array[Byte] =
      "P5 16 16 255\n".getBytes("US-ASCII") ++
        Array.tabulate(256)(i => (f(i) & 0xff).toByte)
    def gradient(i: Int) = (i * 7 + (i / 16) * 31) % 256
    def noise(i: Int) = (i * 97 + 55) % 256
    val a = AviCodec.encode(16, 16, 40000,
      (0 until 5).map(_ => pgm(gradient)))
    // same content, different container timing + one extra frame
    val b = AviCodec.encode(16, 16, 33333,
      (0 until 6).map(_ => pgm(gradient)))
    val c = AviCodec.encode(16, 16, 40000,
      (0 until 5).map(_ => pgm(noise)))
    val rows = Seq((0L, a), (1L, b), (2L, c),
      (3L, "garbage".getBytes("UTF-8")))
    val hashed = graft.operators.Multimodal.videoFingerprints(
      rows.toDF("vid", "bytes"), "vid", "bytes")
    val hs = hashed.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hs(0L).isDefined && hs(3L).isEmpty)
    assert(hs(0L) === hs(1L))
    assert(java.lang.Long.bitCount(hs(0L).get ^ hs(2L).get) > 3)
    val pairs = graft.operators.Multimodal.phashNearDupPairs(
        hashed, "vid", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("WAV/AVI mutation fuzz: corrupted and truncated containers never " +
      "throw — decode degrades to None/empty") {
    import graft.functions.{AviCodec, WavCodec}
    val wav = WavCodec.encodePcm16(8000,
      Array.tabulate(4000)(i => if (i % 2 == 0) 0.4f else -0.4f))
    val avi = AviCodec.encode(16, 16, 40000,
      (0 until 4).map(k => s"frame payload $k".getBytes("UTF-8")))
    val rnd = new scala.util.Random(42)
    for (base <- Seq(wav, avi); trial <- 1 to 25) {
      val b = base.clone()
      val at = rnd.nextInt(b.length - 64)
      (0 until 1 + rnd.nextInt(64)).foreach { k =>
        b(at + k) = rnd.nextInt(256).toByte
      }
      // contract: degrade, never throw
      WavCodec.decode(b).foreach(w => assert(w.samples.nonEmpty))
      assert(AviCodec.frames(b) != null)
      AviCodec.decodeInfo(b).foreach(i => assert(i.width > 0))
    }
    for (base <- Seq(wav, avi);
         n <- Seq(0, 1, 8, 43, 44, 45, base.length / 2, base.length - 3)) {
      val b = java.util.Arrays.copyOf(base, n)
      WavCodec.decode(b) // must not throw
      assert(AviCodec.frames(b) != null)
    }
  }
}
