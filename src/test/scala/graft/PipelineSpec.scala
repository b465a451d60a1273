package graft

import graft.etl.Pipeline
import graft.sources.VectorCollection
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("E1: process folder end-to-end — extract, embed, load, search") {
    val root = Files.createTempDirectory("graft_etl").toString
    VectorCollection.recreate(spark, root, "enem", dim = 64)

    val report = Pipeline.processFolder(spark,
      TestBooklet.pagesDf(spark), TestBooklet.keysDf(spark),
      root, "enem", dim = 64)

    // D1: 9 standard visible questions; D2: 4 → 13 points.
    assert(report.attempted === 13)
    assert(report.added === 13)
    assert(report.pairs === 2)

    val coll = VectorCollection.read(spark, root, "enem")
    assert(coll.count() === 13)
    // ids dense from 0.
    val ids = coll.select("id").collect().map(_.getLong(0)).sorted
    assert(ids === (0L until 13L).toArray)

    // K1: searching with a loaded point's vector returns that point.
    val probe = coll.filter(col("materia") === "natu").limit(1).first()
    val hit = VectorCollection.search(spark, root, "enem",
      probe.getSeq[Double](probe.fieldIndex("vector")), k = 1).first()
    assert(hit.getAs[Long]("id") === probe.getAs[Long]("id"))

    // Second run appends with offset ids (incremental load, W2).
    val report2 = Pipeline.processFolder(spark,
      TestBooklet.pagesDf(spark), TestBooklet.keysDf(spark),
      root, "enem", dim = 64)
    assert(report2.added === 13)
    val ids2 = VectorCollection.read(spark, root, "enem")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids2 === (0L until 26L).toArray)
  }

  test("E1 from RAW PDF FILES on disk: processPdfFolder renders the same " +
      "13 points as the fixture path") {
    val dir = Files.createTempDirectory("graft_pdfetl").toString
    def writePdf(name: String, pages: Seq[Seq[String]],
        images: Set[Int]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        PdfFixture.build(pages, images))
      ()
    }
    // booklets: one page per TestBooklet row, real content streams;
    // D1 page 2 carries an embedded image XObject (drives has_images)
    writePdf(TestBooklet.d1File,
      TestBooklet.d1Pages.sortBy(_._2).map(_._3.split("\n").toSeq),
      images = Set(2))
    writePdf(TestBooklet.d2File,
      TestBooklet.d2Pages.sortBy(_._2).map(_._3.split("\n").toSeq),
      images = Set.empty)
    // answer keys: GB PDFs whose page 0 carries the key grid
    writePdf(TestBooklet.d1KeyFile,
      Seq(TestBooklet.d1KeyText.split("\n").toSeq), Set.empty)
    writePdf(TestBooklet.d2KeyFile,
      Seq(TestBooklet.d2KeyText.split("\n").toSeq), Set.empty)

    val root = Files.createTempDirectory("graft_pdfetl_coll").toString
    VectorCollection.recreate(spark, root, "enem", dim = 64)
    val report = Pipeline.processPdfFolder(spark, dir, root, "enem",
      dim = 64)
    assert(report.pairs === 2)
    assert(report.attempted === 13)
    assert(report.added === 13)
    val coll = VectorCollection.read(spark, root, "enem")
    assert(coll.count() === 13)
    // same subjects as the fixture-path run — full parity through the
    // PDF bytes (cover skip, image-page skip, spanish flag, key join)
    val bySubject = coll.groupBy("materia").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySubject === Map("eng" -> 5, "spani" -> 3, "lang" -> 1,
      "natu" -> 4))
  }

  test("E1: external-embedder path — batched client, same collection") {
    CountingEmbedder.reset()
    val root = Files.createTempDirectory("graft_etl3").toString
    VectorCollection.recreate(spark, root, "enem", dim = 64)
    val report = Pipeline.processFolder(spark,
      TestBooklet.pagesDf(spark), TestBooklet.keysDf(spark),
      root, "enem", dim = 64,
      embedder = Some(new CountingEmbedder(64)), embedBatchSize = 4)
    assert(report.attempted === 13)
    assert(report.added === 13)
    // 13 chunks in batches of ≥1 → strictly fewer client calls than rows
    // (the reference: 1 call per chunk).
    val calls = CountingEmbedder.calls.get()
    assert(calls > 0 && calls < 13, s"expected batched calls, got $calls")
    assert(CountingEmbedder.batchSizes.toArray(Array.empty[Integer])
      .map(_.toInt).sum === 13)

    // the client path must land the SAME vectors as the in-plan expression.
    val rootExpr = Files.createTempDirectory("graft_etl4").toString
    VectorCollection.recreate(spark, rootExpr, "enem", dim = 64)
    Pipeline.processFolder(spark, TestBooklet.pagesDf(spark),
      TestBooklet.keysDf(spark), rootExpr, "enem", dim = 64)
    val a = VectorCollection.read(spark, root, "enem")
      .select("page_content", "vector").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val b = VectorCollection.read(spark, rootExpr, "enem")
      .select("page_content", "vector").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(a === b)
  }

  test("E1: unpaired test aborts the folder (reference IOError semantics)") {
    import spark.implicits._
    val pagesNoKey = TestBooklet.pagesDf(spark)
      .filter(col("file_name") === TestBooklet.d1File)
    val emptyKeys = Seq.empty[(String, String)].toDF("file_name", "key_text")
    val root = Files.createTempDirectory("graft_etl2").toString
    VectorCollection.recreate(spark, root, "enem", dim = 64)
    intercept[java.io.IOException] {
      Pipeline.processFolder(spark, pagesNoKey, emptyKeys, root, "enem")
    }
  }
}
