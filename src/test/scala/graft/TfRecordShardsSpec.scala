package graft

import graft.functions.TfRecordCodec
import graft.sources.TfRecordShards
import org.apache.spark.sql.functions._

class TfRecordShardsSpec extends SparkSpec {
  import spark.implicits._

  test("write/read round trip: one shard per non-empty partition, " +
      "every Example payload intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrec")
      .toString + "/shards"
    val rows = (0L until 40L).map { i =>
      i -> TfRecordCodec.encodeExample(
        Seq("text" -> s"doc $i".getBytes("UTF-8")),
        Seq("ids" -> Array(i, i * 2)))
    }
    val df = rows.toDF("id", "payload").repartition(4)
    val written = TfRecordShards.write(df, "payload", dir)
    assert(written === 40L)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord"))
    assert(shards.length === 4)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.contains(".tfrecord.tmp")),
      "uncommitted tmp shard left")

    val back = TfRecordShards.read(spark, dir)
      .select(col("payload")).collect()
      .map(r => TfRecordCodec.decodeExample(r.getAs[Array[Byte]](0)))
    assert(back.length === 40)
    val ids = back.map { case (bs, is) =>
      val t = new String(bs("text"), "UTF-8")
      val i = is("ids")
      assert(t === s"doc ${i(0)}" && i(1) === i(0) * 2)
      i(0)
    }.toSet
    assert(ids === (0L until 40L).toSet)
  }

  test("re-running the write overwrites shards idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrec2")
      .toString + "/shards"
    val df = Seq(1L -> "a".getBytes, 2L -> "b".getBytes)
      .toDF("id", "payload").repartition(1)
    assert(TfRecordShards.write(df, "payload", dir) === 2L)
    assert(TfRecordShards.write(df, "payload", dir) === 2L)
    assert(TfRecordShards.read(spark, dir).count() === 2L)
  }

  test("a re-run with FEWER partitions sweeps the stale higher-index " +
      "shards — read() must never mix a previous run's data into the " +
      "current result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrec3")
      .toString + "/shards"
    val payloads = (0L until 16L).map(i => i -> s"p$i".getBytes("UTF-8"))
    assert(TfRecordShards.write(
      payloads.toDF("id", "payload").repartition(8), "payload", dir) === 16L)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tfrecord")) === 8)
    // second run: same data, 2 partitions — shards 2-7 must disappear
    assert(TfRecordShards.write(
      payloads.toDF("id", "payload").repartition(2), "payload", dir) === 16L)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tfrecord")) === 2,
      "stale shards from the wider run survived the sweep")
    val back = TfRecordShards.read(spark, dir).count()
    assert(back === 16L, s"read mixed stale shards: $back rows")
  }

  test("stale shards and orphaned tmps are swept BEFORE tasks launch, " +
      "and no post-job sweep exists to race a zombie attempt's " +
      "rename-failure path into deleting a committed shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrec4")
      .toString + "/shards"
    val d = new java.io.File(dir)
    d.mkdirs()
    // simulate a previous crashed run: a stale high-index shard (whose
    // partition won't exist this run) and an orphaned attempt tmp
    java.nio.file.Files.write(
      new java.io.File(d, "part-00099.tfrecord").toPath,
      "stale".getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(d, "part-00000.tfrecord.tmp-999").toPath,
      "orphan".getBytes("UTF-8"))
    val df = Seq(1L -> "a".getBytes, 2L -> "b".getBytes)
      .toDF("id", "payload").repartition(2)
    assert(TfRecordShards.write(df, "payload", dir) === 2L)
    val names = d.listFiles().map(_.getName).toSet
    assert(!names.contains("part-00099.tfrecord"),
      "stale shard survived the pre-sweep")
    assert(!names.exists(_.contains(".tfrecord.tmp")),
      "orphaned tmp survived the pre-sweep")
    assert(names.filter(_.endsWith(".tfrecord"))
      .forall(_.matches("part-0000[01]\\.tfrecord")),
      s"unexpected shards: $names")
    assert(TfRecordShards.read(spark, dir).count() === 2L)
  }
}
