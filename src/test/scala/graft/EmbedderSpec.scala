package graft

import graft.etl.{Embedder, HashEmbedder}
import graft.functions.Hashing
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Counting fake: delegates to the deterministic hash embedder but records
  * every embedBatch invocation (static state — local-mode tasks share the
  * JVM, and statics are not captured by closure serialization). */
class CountingEmbedder(val dim: Int) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    CountingEmbedder.calls.incrementAndGet()
    CountingEmbedder.batchSizes.add(texts.length)
    texts.map(t => Hashing.hashEmbedVec(t, dim))
  }
}

object CountingEmbedder {
  val calls = new AtomicInteger(0)
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  def reset(): Unit = { calls.set(0); batchSizes.clear() }
}

/** Flaky fake: the first `failures` embedBatch calls throw — exercises the
  * per-batch retry loop. */
class FlakyEmbedder(val dim: Int, failures: Int) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    if (FlakyEmbedder.attempts.incrementAndGet() <= failures)
      throw new RuntimeException("transient embed failure")
    texts.map(t => Hashing.hashEmbedVec(t, dim))
  }
}

object FlakyEmbedder {
  val attempts = new AtomicInteger(0)
}

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 10).map(i => (i.toLong, s"doc number $i words"))

  test("T15: embedColumn batches — one client call per batch, not per row") {
    CountingEmbedder.reset()
    val df = docs.toDF("id", "text").repartition(1)
    val out = graft.etl.Embedder.embedColumn(
      df, "text", new CountingEmbedder(16), batchSize = 3)
    val rows = out.collect()
    assert(rows.length === 10)
    // 10 rows, one partition, batchSize 3 → ceil(10/3) = 4 calls — NOT 10
    // (the reference makes one API call per row, qdrant_text_loader.py:199).
    assert(CountingEmbedder.calls.get() === 4)
    assert(CountingEmbedder.batchSizes.toArray(Array.empty[Integer])
      .map(_.toInt).sorted.toSeq === Seq(1, 3, 3, 3))
  }

  test("T15: embedColumn output matches the in-plan hash_embed expression") {
    CountingEmbedder.reset()
    val df = docs.toDF("id", "text").repartition(3)
    val out = graft.etl.Embedder.embedColumn(
      df, "text", new HashEmbedder(16), outCol = "vector", batchSize = 4)
    assert(out.schema("vector").dataType.simpleString === "array<double>")
    out.collect().foreach { r =>
      val expected = Hashing.hashEmbedVec(r.getAs[String]("text"), 16)
      assert(r.getSeq[Double](r.fieldIndex("vector")) === expected.toSeq,
        s"row ${r.getAs[Long]("id")} vector mismatch")
    }
  }

  test("T15: a transiently failing batch is retried, not fatal") {
    FlakyEmbedder.attempts.set(0)
    val df = docs.toDF("id", "text").repartition(1)
    val out = graft.etl.Embedder.embedColumn(
      df, "text", new FlakyEmbedder(8, failures = 2),
      batchSize = 100, maxRetries = 3, backoffMs = 1L)
    assert(out.count() === 10)
    // one batch: 2 failed attempts + 1 success.
    assert(FlakyEmbedder.attempts.get() === 3)
  }

  test("T15: retries exhausted surfaces the client error") {
    FlakyEmbedder.attempts.set(0)
    val df = docs.toDF("id", "text").repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      graft.etl.Embedder.embedColumn(
        df, "text", new FlakyEmbedder(8, failures = 100),
        batchSize = 100, maxRetries = 2, backoffMs = 1L).collect()
    }
    assert(ex.getMessage.contains("transient embed failure") ||
      Option(ex.getCause).exists(_.getMessage.contains("transient embed failure")))
  }
}
