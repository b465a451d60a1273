package graft

import graft.sources.VectorCollection
import graft.stats.LoadStats
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VectorCollectionSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft_coll").toString

  test("S9/S10: create, count empty, recreate") {
    VectorCollection.create(spark, root, "c1", dim = 4)
    assert(VectorCollection.count(spark, root, "c1") === 0)
    VectorCollection.recreate(spark, root, "c1", dim = 4)
    assert(VectorCollection.count(spark, root, "c1") === 0)
  }

  test("dim is ENFORCED on append: a wrong-width vector fails the load " +
      "loudly instead of silently vanishing from every search") {
    import spark.implicits._
    VectorCollection.recreate(spark, root, "cdim", dim = 3)
    val good = Seq((0L, Seq(1.0, 2.0, 3.0), "ok", "math", 2023))
      .toDF("id", "vector", "page_content", "materia", "ano")
    val (a, d) = VectorCollection.append(spark, root, "cdim", good)
    assert(a === 1L && d === 1L)
    val bad = Seq((1L, Seq(1.0, 2.0), "short", "math", 2023))
      .toDF("id", "vector", "page_content", "materia", "ano")
    val e = intercept[Exception] {
      VectorCollection.append(spark, root, "cdim", bad)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dim")), s"not the dim guard: $e")
    // the failed append added nothing
    assert(VectorCollection.count(spark, root, "cdim") === 1)
    // the declared dim survives compact's directory swap (the sidecar
    // is a SIBLING of the collection dir)
    VectorCollection.compact(spark, root, "cdim")
    intercept[Exception] {
      VectorCollection.append(spark, root, "cdim", bad)
    }
  }

  test("W2/S8: id-offset append twice, then K1 search hits the right point") {
    import spark.implicits._
    VectorCollection.recreate(spark, root, "c2", dim = 4)
    def batch(tag: String, n: Int) = (0 until n).map { i =>
      (Seq.tabulate(4)(j => math.sin(tag.hashCode + i * 4 + j)),
        s"$tag-$i", "math", 2023)
    }.toDF("vector", "page_content", "materia", "ano")

    val b1 = VectorCollection.assignIdsOrdered(
      batch("first", 3), 0L, Seq("page_content"))
    VectorCollection.append(spark, root, "c2",
      b1.select(col("id"), col("vector"), col("page_content"),
        col("materia"), col("ano")))
    assert(VectorCollection.count(spark, root, "c2") === 3)

    val offset = VectorCollection.count(spark, root, "c2")
    val b2 = VectorCollection.assignIdsOrdered(
      batch("second", 2), offset, Seq("page_content"))
    val (attempted, added) = VectorCollection.append(spark, root, "c2",
      b2.select(col("id"), col("vector"), col("page_content"),
        col("materia"), col("ano")))
    assert(attempted === 2 && added === 2)

    val ids = VectorCollection.read(spark, root, "c2")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids === Array(0L, 1L, 2L, 3L, 4L))

    // search for an exact stored vector → top-1 is that point, score 1.
    val target = VectorCollection.read(spark, root, "c2")
      .filter(col("page_content") === "second-0")
      .select("vector").first().getSeq[Double](0)
    val hit = VectorCollection.search(spark, root, "c2", target, k = 1)
      .first()
    assert(hit.getAs[String]("page_content") === "second-0")
    assert(math.abs(hit.getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("compact: many append files collapse, contents identical, " +
    "search still works") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString
    VectorCollection.recreate(spark, root, "c", dim = 4)
    // 6 append batches, each fanned over partitions → many part files.
    (0 until 6).foreach { b =>
      val pts = (0 until 10).map { i =>
        (b * 10L + i, Seq(1.0, 0.0, 0.0, 0.0), s"doc ${b * 10 + i}",
          "math", 2023)
      }.toDF("id", "vector", "page_content", "materia", "ano")
        .repartition(4)
      VectorCollection.append(spark, root, "c", pts)
    }
    val before = VectorCollection.read(spark, root, "c")
      .collect().map(_.getLong(0)).sorted
    val (filesBefore, filesAfter) =
      VectorCollection.compact(spark, root, "c", targetRowsPerFile = 30)
    assert(filesBefore > filesAfter,
      s"expected fewer files, got $filesBefore -> $filesAfter")
    assert(filesAfter === 2) // 60 rows / 30 per file
    val after = VectorCollection.read(spark, root, "c")
      .collect().map(_.getLong(0)).sorted
    assert(after === before)
    // the temp/backup dirs are gone; the collection is still searchable.
    assert(!new java.io.File(
      VectorCollection.path(root, "c") + "._compact").exists())
    assert(!new java.io.File(
      VectorCollection.path(root, "c") + "._old").exists())
    assert(VectorCollection.search(spark, root, "c",
      Seq(1.0, 0.0, 0.0, 0.0), k = 1).count() === 1)
  }

  test("compact crash window: a read after a crash mid-swap heals the " +
    "collection from the ._old backup") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_heal")
      .toString
    VectorCollection.recreate(spark, root, "c", dim = 4)
    val pts = (0 until 10).map { i =>
      (i.toLong, Seq(1.0, 0.0, 0.0, 0.0), s"doc $i", "math", 2023)
    }.toDF("id", "vector", "page_content", "materia", "ano")
    VectorCollection.append(spark, root, "c", pts)
    // simulate the crash: live dir renamed to ._old, replacement never
    // renamed in (the window between compact's two renames)
    val live = new java.io.File(VectorCollection.path(root, "c"))
    val bak = new java.io.File(VectorCollection.path(root, "c") + "._old")
    assert(live.renameTo(bak))
    assert(!live.exists())
    val ids = VectorCollection.read(spark, root, "c")
      .collect().map(_.getLong(0)).sorted
    assert(ids === (0L until 10L).toArray)
    assert(!bak.exists())
    // stale backup NEXT TO a live dir (crash after the forward rename)
    // is dropped, live data wins
    assert(bak.mkdirs())
    assert(VectorCollection.read(spark, root, "c").count() === 10)
    assert(!bak.exists())
  }

  test("append during the crash window heals FIRST — pre-crash rows are " +
    "not orphaned into a 'stale' backup") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_heal2")
      .toString
    VectorCollection.recreate(spark, root, "c", dim = 4)
    def batch(from: Int, n: Int) = (from until from + n).map { i =>
      (i.toLong, Seq(1.0, 0.0, 0.0, 0.0), s"doc $i", "math", 2023)
    }.toDF("id", "vector", "page_content", "materia", "ano")
    VectorCollection.append(spark, root, "c", batch(0, 10))
    // crash mid-swap: live dir renamed away
    val live = new java.io.File(VectorCollection.path(root, "c"))
    val bak = new java.io.File(VectorCollection.path(root, "c") + "._old")
    assert(live.renameTo(bak))
    // the loader's next batch arrives BEFORE any read: without healing,
    // Append would recreate the live dir with only the new batch and the
    // 10 pre-crash rows would later be deleted as a stale backup.
    VectorCollection.append(spark, root, "c", batch(10, 5))
    val ids = VectorCollection.read(spark, root, "c")
      .collect().map(_.getLong(0)).sorted
    assert(ids === (0L until 15L).toArray)
    assert(!bak.exists())
  }

  test("A4: stats pivot merge matches the golden CSV shape") {
    import spark.implicits._
    val counts = Seq(
      (2022, "math", "todas questoes", 37L),
      (2022, "natu", "todas questoes", 29L),
      (2022, "spani", "todas questoes", 3L),
      (2022, "lang", "todas questoes", 24L),
      (2022, "huma", "todas questoes", 26L),
      (2022, "math", "questoes add", 37L),
      (2022, "natu", "questoes add", 29L),
      (2022, "spani", "questoes add", 3L),
      (2022, "lang", "questoes add", 24L),
      (2022, "huma", "questoes add", 26L)
    ).toDF("year", "subject", "kind", "n")
    val stats = LoadStats.pivot(counts)
    assert(stats.columns.toSeq ===
      "row_key" +: LoadStats.Subjects)
    val rows = stats.collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("2022 questoes add", "2022 todas questoes"))
    // 119-question 2022 total (BASELINE.md golden count).
    val total = LoadStats.Subjects.map(s =>
      rows(1).getAs[Long](s)).sum
    assert(total === 119L)
    // eng had no 2022 extractions → zero-filled.
    assert(rows(1).getAs[Long]("eng") === 0L)
  }
}
