package graft.sources

import org.apache.spark.sql.DataFrame

/** S8 (live form) — the network vector-DB client seam, mirroring the
  * [[graft.etl.Embedder]] seam on the sink side.
  *
  * The reference upserts each batch to a live Qdrant and checks
  * `result.status == completed` (qdrant_text_loader.py:202-214). The
  * engine's native collection is parquet ([[VectorCollection]]); this trait
  * is the boundary a live-store deployment implements instead: executors
  * open one client per partition, push points in `batchSize` groups, retry
  * failed batches with backoff, and acknowledged counts flow back through
  * an accumulator (no data ever returns to the driver).
  */
trait VectorSink extends Serializable {

  /** One point: (id, vector, page_content, materia, ano). */
  type Point = (Long, Seq[Double], String, String, Int)

  /** Upsert one batch; MUST return the number of points the store
    * acknowledged (the reference's status check). Throwing marks the batch
    * failed and triggers the driver's retry. Implementations must be
    * idempotent per (id) — Spark task retries re-send a partition. */
  def upsertBatch(points: Seq[Point]): Long
}

object VectorSink {

  /** Push `points` (id, vector, page_content, materia, ano) through the
    * sink, `batchSize` points per `upsertBatch` call, each batch retried
    * `maxRetries` times with exponential backoff. Returns (attempted,
    * acknowledged) — the reference's reconciliation pair, with
    * `acknowledged` summed from the store's own responses via accumulator
    * rather than a post-hoc collection scan. */
  def write(points: DataFrame, sink: VectorSink, batchSize: Int = 128,
      maxRetries: Int = 3, backoffMs: Long = 100L): (Long, Long) = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = points.sparkSession
    val attempted = spark.sparkContext.longAccumulator("vectorsink.attempted")
    val acked = spark.sparkContext.longAccumulator("vectorsink.acked")
    val prepared = points.select("id", "vector", "page_content",
      "materia", "ano")
    prepared.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.map { r =>
          (r.getLong(0), r.getSeq[Double](1), r.getString(2), r.getString(3),
            r.getInt(4))
        }.grouped(batchSize).foreach { batch =>
          attempted.add(batch.length.toLong)
          acked.add(withRetries(maxRetries, backoffMs) {
            sink.upsertBatch(batch)
          })
        }
    }
    (attempted.value, acked.value)
  }

  /** Reference impl: one JSON-lines file per acknowledged batch in a local
    * directory — stands in for a store that acks whole batches. Used by
    * specs; a live deployment swaps in an HTTP/gRPC client with the same
    * contract. */
  final class LocalDirSink(dir: String) extends VectorSink {
    override def upsertBatch(points: Seq[Point]): Long = {
      // file name derived from the batch's id set — a retried task
      // re-sends identical batches and OVERWRITES its own files, which
      // is the per-(id) idempotency the trait contract mandates (a
      // UUID name would duplicate every replayed point)
      val md = java.security.MessageDigest.getInstance("MD5")
      points.foreach(p => md.update(
        java.nio.ByteBuffer.allocate(8).putLong(p._1).array()))
      val key = md.digest().map("%02x".format(_)).mkString
      writeJsonl(s"$dir/batch-$key.jsonl", points)
      points.length.toLong
    }
  }

  private[sources] def withRetries[T](maxRetries: Int, backoffMs: Long)(
      f: => T): T =
    graft.etl.Retries.withRetries(maxRetries, backoffMs)(f)

  /** Executor-local JSON-lines write (no SparkSession on executors — a
    * real sink client is a plain socket, this is a plain file; the spec
    * reads it back with spark.read.json). */
  private def writeJsonl(path: String,
      points: Seq[(Long, Seq[Double], String, String, Int)]): Unit = {
    val sb = new StringBuilder
    points.foreach { case (id, vec, content, materia, ano) =>
      sb.append(s"""{"id":$id,"vector":[${vec.mkString(",")}],""")
      sb.append(s""""page_content":${jsonStr(content)},""")
      sb.append(s""""materia":${jsonStr(materia)},"ano":$ano}""")
      sb.append('\n')
    }
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
}
