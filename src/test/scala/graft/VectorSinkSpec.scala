package graft

import graft.sources.VectorSink
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Counting fake store: acks every batch, records invocations (static —
  * local-mode tasks share the JVM). */
class CountingSink extends VectorSink {
  override def upsertBatch(points: Seq[Point]): Long = {
    CountingSink.calls.incrementAndGet()
    CountingSink.points.addAndGet(points.length)
    points.length.toLong
  }
}

object CountingSink {
  val calls = new AtomicInteger(0)
  val points = new AtomicInteger(0)
  def reset(): Unit = { calls.set(0); points.set(0) }
}

/** Store whose first `failures` upserts throw (transient outage). */
class FlakySink(failures: Int) extends VectorSink {
  override def upsertBatch(points: Seq[Point]): Long = {
    if (FlakySink.attempts.incrementAndGet() <= failures)
      throw new RuntimeException("store unavailable")
    points.length.toLong
  }
}

object FlakySink {
  val attempts = new AtomicInteger(0)
}

class VectorSinkSpec extends SparkSpec {
  import spark.implicits._

  private def pointsDf(n: Int) = (0 until n).map { i =>
    (i.toLong, Seq(i * 0.5, 1.0 - i * 0.25), s"conteúdo \"q$i\"\nlinha", "math",
      2023)
  }.toDF("id", "vector", "page_content", "materia", "ano")

  test("S8 live form: batched upserts — one client call per batch") {
    CountingSink.reset()
    val (attempted, acked) = VectorSink.write(
      pointsDf(20).repartition(1), new CountingSink, batchSize = 6)
    assert(attempted === 20L)
    assert(acked === 20L)
    assert(CountingSink.calls.get() === 4) // ceil(20/6), NOT 20
    assert(CountingSink.points.get() === 20)
  }

  test("S8 live form: transient store failure retries the batch only") {
    FlakySink.attempts.set(0)
    val (attempted, acked) = VectorSink.write(
      pointsDf(10).repartition(1), new FlakySink(failures = 2),
      batchSize = 100, maxRetries = 3, backoffMs = 1L)
    assert(attempted === 10L)
    assert(acked === 10L)
    assert(FlakySink.attempts.get() === 3) // 2 failures + 1 success
  }

  test("S8 live form: exhausted retries fail the load") {
    FlakySink.attempts.set(0)
    intercept[org.apache.spark.SparkException] {
      VectorSink.write(pointsDf(5).repartition(1),
        new FlakySink(failures = 100), batchSize = 100,
        maxRetries = 1, backoffMs = 1L)
    }
  }

  test("LocalDirSink roundtrip: every point lands exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = pointsDf(25).repartition(3)
    val (attempted, acked) = VectorSink.write(df,
      new VectorSink.LocalDirSink(dir), batchSize = 4)
    assert(attempted === 25L && acked === 25L)
    val back = spark.read.json(s"$dir/*.jsonl")
    assert(back.count() === 25)
    val got = back.select(col("id"), col("page_content")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df.select(col("id"), col("page_content")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want) // JSON escaping survives quotes/newlines
  }

  test("LocalDirSink honors the trait's idempotency-per-id contract: a " +
      "replayed batch (a Spark task retry) overwrites its own file " +
      "instead of duplicating every point") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val sink = new VectorSink.LocalDirSink(dir)
    val batch = Seq((1L, Seq(0.5), "a", "math", 2023),
      (2L, Seq(0.6), "b", "math", 2023))
    assert(sink.upsertBatch(batch) === 2L)
    assert(sink.upsertBatch(batch) === 2L) // the retry re-send
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".jsonl")) === 1,
      "a replayed batch must overwrite, not duplicate")
    assert(spark.read.json(s"$dir/*.jsonl").count() === 2)
  }
}
