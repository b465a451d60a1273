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
}
