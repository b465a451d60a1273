package graft

import graft.sources.BucketedCollection
import org.apache.spark.sql.functions._

class BucketedCollectionSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bcoll").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/coll"
  }

  private def bucketFiles(path: String, b: Int): Map[String, Long] = {
    val dir = new java.io.File(s"$path/bucket=$b")
    if (!dir.exists()) Map.empty
    else dir.listFiles().filter(f => f.isFile &&
        f.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("upsert replaces by id, inserts new ids, and leaves untouched " +
      "buckets' files byte-identical on disk") {
    import spark.implicits._
    val path = tmpDir()
    val n = 16
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("id", "payload")
    BucketedCollection.write(base, path, "id", n)

    // batch: overwrite ids 0..9, insert ids 1000..1004
    val updates = ((0L until 10L).map(i => (i, s"NEW$i")) ++
      (1000L until 1005L).map(i => (i, s"ins$i"))).toDF("id", "payload")
    val touched = updates
      .select(BucketedCollection.bucketOf(col("id"), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val untouched = (0 until n).toSet -- touched
    assert(untouched.nonEmpty, "test needs at least one untouched bucket")
    val beforeFiles = untouched.map(b => b -> bucketFiles(path, b)).toMap

    val report = BucketedCollection.upsert(spark, path, updates, "id", n)
    assert(report.bucketsTouched === touched.size)
    assert(report.replaced === 10L)
    assert(report.inserted === 5L)

    // merge semantics: replaced rows carry the new payload, the rest the old
    val all = BucketedCollection.read(spark, path)
      .select(col("id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all.size === 205)
    assert(all(3L) === "NEW3")
    assert(all(42L) === "v42")
    assert(all(1002L) === "ins1002")

    // bucket placement invariant survives the merge (readers can prune)
    val misplaced = BucketedCollection.read(spark, path)
      .filter(BucketedCollection.bucketOf(col("id"), n) =!= col("bucket"))
      .count()
    assert(misplaced === 0L)

    // untouched buckets: exact same files, never rewritten
    untouched.foreach { b =>
      assert(bucketFiles(path, b) === beforeFiles(b),
        s"bucket $b was rewritten but none of the batch hashes into it")
    }
  }

  test("upsert reads only the affected bucket directories") {
    import spark.implicits._
    val path = tmpDir()
    val n = 16
    BucketedCollection.write(
      (0L until 200L).map(i => (i, s"v$i")).toDF("id", "payload"),
      path, "id", n)
    val updates = Seq((7L, "NEW7")).toDF("id", "payload")
    val touched = updates
      .select(BucketedCollection.bucketOf(col("id"), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

    // replicate upsert's pruned read and assert the scan lists no other dirs
    val dirs = touched.toSeq.sorted.map(b => s"$path/bucket=$b")
    val pruned = spark.read.option("basePath", path).parquet(dirs: _*)
    val readBuckets = pruned.inputFiles
      .map(f => f.replaceAll(".*/bucket=(\\d+)/.*", "$1").toInt).toSet
    assert(readBuckets === touched)

    BucketedCollection.upsert(spark, path, updates, "id", n)
    assert(BucketedCollection.read(spark, path)
      .filter(col("id") === 7L).select(col("payload"))
      .collect().head.getString(0) === "NEW7")
  }

  test("upsert rejects batches with duplicate ids") {
    import spark.implicits._
    val path = tmpDir()
    BucketedCollection.write(
      Seq((1L, "a")).toDF("id", "payload"), path, "id", 4)
    val dup = Seq((2L, "x"), (2L, "y")).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      BucketedCollection.upsert(spark, path, dup, "id", 4)
    }
  }

  test("upsert rejects a batch that already carries a 'bucket' column — " +
      "the partition key would silently overwrite the data column") {
    import spark.implicits._
    val path = tmpDir()
    val clash = Seq((1L, "a", "s3-bucket-name"))
      .toDF("id", "payload", "bucket")
    val e = intercept[IllegalArgumentException] {
      BucketedCollection.upsert(spark, path, clash, "id", 4)
    }
    assert(e.getMessage.contains("bucket"))
  }

  test("upsert crash window: a read after a crash mid-bucket-swap heals " +
      "from the bucket's ._old backup") {
    import spark.implicits._
    val path = tmpDir()
    val base = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    BucketedCollection.write(base, path, "id", 8)
    // pick a real bucket dir and simulate the crash: live renamed to
    // ._old, replacement never renamed in
    val b = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).head
    val bak = new java.io.File(b.getParent, b.getName + "._old")
    assert(b.renameTo(bak))
    assert(BucketedCollection.read(spark, path).count() === 100)
    assert(!bak.exists() && b.exists())
    // stale backup next to a live bucket is dropped
    assert(bak.mkdirs())
    assert(BucketedCollection.read(spark, path).count() === 100)
    assert(!bak.exists())
  }
}
