package graft

import graft.streaming.DocIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private val schema = "doc_id LONG, text STRING"

  test("streaming ingest embeds and appends each file batch exactly once") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString + "/coll"
    val ckpt = Files.createTempDirectory("graft_stream_ck").toString

    Seq((0L, "first document about spark"), (1L, "second document about sql"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)

    val q = DocIngest.start(spark, in, schema, out, ckpt, dim = 16,
      pollInterval = "200 milliseconds")
    try {
      q.processAllAvailable()
      // second file lands mid-stream
      Seq((2L, "third document about streams"))
        .toDF("doc_id", "text").write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
    assert(got.count() === 3)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(0L, 1L, 2L))
    // every row carries a dim-16 embedding
    assert(got.filter(size(col("vector")) =!= 16).count() === 0)
  }

  test("stateful dedup-on-ingest drops cross-batch exact duplicates") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream2_in").toString
    val out = Files.createTempDirectory("graft_stream2_out").toString + "/coll"
    val ckpt = Files.createTempDirectory("graft_stream2_ck").toString

    Seq((0L, "unique text alpha"), (1L, "dup text body"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    val q = DocIngest.startDeduped(spark, in, schema, out, ckpt, dim = 16)
    try {
      q.processAllAvailable()
      // batch 2 re-sends an exact duplicate of doc 1 plus a new doc.
      Seq((2L, "dup text body"), (3L, "unique text beta"))
        .toDF("doc_id", "text").write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
    // doc 2 (same fp as doc 1, earlier batch) must be dropped by state.
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(0L, 1L, 3L))
  }
}
