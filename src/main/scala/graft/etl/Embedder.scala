package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}

/** T15 — the embedding-client seam (SURVEY.md §7.1-4).
  *
  * The reference embeds ONE chunk per HTTP call inside a Python row loop
  * (qdrant_text_loader.py:58-64, :199) — its biggest flaw at scale. Here the
  * client is a trait invoked once per `batchSize` rows inside
  * `mapPartitions`, so a 1000-executor cluster makes
  * rows / (partitions · batchSize) calls, each amortizing connection and
  * model-batching overhead, with retry/backoff around the batch.
  */
trait Embedder extends Serializable {

  /** Embedding dimensionality (every returned vector must have it). */
  def dim: Int

  /** Embed a batch of texts: MUST return exactly one vector per input, in
    * input order. Called once per batch, never per row. */
  def embedBatch(texts: Seq[String]): Seq[Array[Double]]
}

/** Deterministic feature-hash embedder — the offline stand-in implementation
  * (identical output to the in-plan `Fingerprints.hashEmbed` expression, so
  * either path yields the same collection). */
final class HashEmbedder(val dim: Int) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
    texts.map(t => graft.functions.Hashing.hashEmbedVec(
      if (t == null) "" else t, dim))
}

object Embedder {

  /** Attach `outCol ARRAY<DOUBLE>` by batching `textCol` through
    * `embedder.embedBatch` — one client call per `batchSize` rows per
    * partition. Each batch retries independently with exponential backoff
    * (`maxRetries` re-attempts), so a flaky external API fails a batch, not
    * the stage; a Spark task retry re-embeds only its own partition, which
    * is idempotent for deterministic embedders and id-reconciled downstream
    * for external ones.
    *
    * This is deliberately an RDD mapPartitions (not a UDF): the client is
    * stateful I/O, not an expression — it must never be inlined, re-ordered,
    * or re-evaluated by the optimizer, and per-partition batching is the
    * unit of retry. Deterministic local embedders that CAN live in the plan
    * should use the codegen-friendly `Fingerprints.hashEmbed` instead. */
  def embedColumn(df: DataFrame, textCol: String, embedder: Embedder,
      outCol: String = "embedding", batchSize: Int = 64,
      maxRetries: Int = 3, backoffMs: Long = 100L): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType, containsNull = false)))
    val dim = embedder.dim
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val texts = rows.map { r =>
          val v = r.get(idx)
          if (v == null) "" else v.toString
        }
        val vecs = withRetries(maxRetries, backoffMs) {
          embedder.embedBatch(texts)
        }
        require(vecs.length == rows.length,
          s"embedBatch returned ${vecs.length} vectors for ${rows.length} texts")
        vecs.foreach(v => require(v.length == dim,
          s"embedBatch returned a ${v.length}-dim vector, expected $dim"))
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  private def withRetries[T](maxRetries: Int, backoffMs: Long)(f: => T): T =
    Retries.withRetries(maxRetries, backoffMs)(f)
}
