package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: JVM/SQL hash-bucket parity (the property
  * the DuckDB oracle rests on), hand-checked ratio table and weights on
  * a controlled corpus, determinism, Gumbel-top-k behavior, and guards.
  * The gate queries (`dsir_weights`, `dsir_resample`) value-check the
  * full pipeline against DuckDB at sf0.01. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private val B = 64

  private def tinyDocs = Seq(
    (0L, "aa aa bb", "en"),
    (1L, "aa cc", "en"),
    (2L, "dd dd dd", "fr"),
    (3L, "aa bb cc dd", "fr"),
    (4L, "", "fr"),
    (5L, "ee", "fr")
  ).toDF("doc_id", "text", "lang")

  test("bucketOf matches the SQL md5 bucket expression exactly") {
    val toks = Seq("aa", "bb", "The", "quick-brown", "fox", "ü", "日本語",
      "x" * 100)
    val md = java.security.MessageDigest.getInstance("MD5")
    val jvm = toks.map(t => Dsir.bucketOf(md, t, 1024))
    val sql = toks.toDF("tk")
      .select(pmod(conv(substring(md5(col("tk")), 1, 8), 16, 10)
        .cast("long"), lit(1024)).cast("int").as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(jvm === sql)
  }

  test("logRatioMicro and importanceWeights agree with a driver-side " +
      "recompute on a controlled corpus (exact integers)") {
    val docs = tinyDocs
    val ratio = Dsir.logRatioMicro(
      docs.filter(col("lang") === "en"), docs, "text", B)
    assert(ratio.length === B)

    // independent recompute of the smoothed micro-nat table
    val md = java.security.MessageDigest.getInstance("MD5")
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val all = Seq("aa aa bb", "aa cc", "dd dd dd", "aa bb cc dd", "", "ee")
    val target = Seq("aa aa bb", "aa cc")
    val tc = new Array[Long](B); val rcv = new Array[Long](B)
    target.flatMap(toks).foreach(t => tc(Dsir.bucketOf(md, t, B)) += 1)
    all.flatMap(toks).foreach(t => rcv(Dsir.bucketOf(md, t, B)) += 1)
    val tn = tc.sum.toDouble; val rn = rcv.sum.toDouble
    val expected = Array.tabulate(B) { b =>
      math.floor(1e6 * (math.log((tc(b) + 1.0) / (tn + B)) -
        math.log((rcv(b) + 1.0) / (rn + B))) + 0.5).toLong
    }
    assert(ratio.toSeq === expected.toSeq)

    val w = Dsir.importanceWeights(docs, "doc_id", "text", ratio)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expW = all.zipWithIndex.map { case (t, i) =>
      i.toLong -> toks(t).map(tok => expected(Dsir.bucketOf(md, tok, B))).sum
    }.toMap
    assert(w === expW)
    assert(w(4L) === 0L) // token-less doc weighs 0, not absent
    // target-vocabulary docs outweigh the out-of-target doc
    assert(w(0L) > w(2L))
  }

  test("pipeline is deterministic end to end") {
    val docs = tinyDocs
    def run() = {
      val ratio = Dsir.logRatioMicro(
        docs.filter(col("lang") === "en"), docs, "text", B)
      Dsir.resampleTopK(
        Dsir.importanceWeights(docs, "doc_id", "text", ratio),
        "id", "weight_micro", 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    }
    assert(run() === run())
  }

  test("resampleTopK: k ≥ n returns every row; an overwhelming weight " +
      "is always selected; keys = weight + Gumbel(md5(id))") {
    val w = Seq((0L, 0L), (1L, 0L), (2L, 1000000000L)).toDF("id", "wm")
    assert(Dsir.resampleTopK(w, "id", "wm", 10).count() === 3L)
    val top = Dsir.resampleTopK(w, "id", "wm", 1).collect()
    assert(top.head.getLong(0) === 2L)
    // key decomposes: key(id) − weight(id) is the same Gumbel offset
    // whatever the weight column holds (content-hash RNG, salt "dsir|")
    val w2 = Seq((0L, 5L), (1L, -5L), (2L, 0L)).toDF("id", "wm")
    val g1 = Dsir.resampleTopK(w, "id", "wm", 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) - r.getLong(1))).toMap
    val g2 = Dsir.resampleTopK(w2, "id", "wm", 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) - r.getLong(1))).toMap
    assert(g1 === g2)
  }

  test("plan shapes: the weight pass is exchange-free (one kernel, no " +
      "explode/join) and the resample lowers to TakeOrderedAndProject") {
    val docs = tinyDocs
    val ratio = Dsir.logRatioMicro(
      docs.filter(col("lang") === "en"), docs, "text", B)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", ratio)
    val wPlan = w.queryExecution.executedPlan
    val exchanges = wPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"importanceWeights plan contains an exchange:\n$wPlan")
    val top = Dsir.resampleTopK(w, "id", "weight_micro", 2)
    val toap = top.queryExecution.executedPlan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(toap.nonEmpty,
      "resampleTopK did not lower to TakeOrderedAndProject")
  }

  test("guards: empty target, zero buckets, bad k fail loudly") {
    val docs = tinyDocs
    intercept[IllegalArgumentException] {
      Dsir.logRatioMicro(docs.filter(col("lang") === "xx"), docs, "text", B)
    }
    intercept[IllegalArgumentException] {
      Dsir.logRatioMicro(docs, docs, "text", 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resampleTopK(Seq((1L, 1L)).toDF("id", "wm"), "id", "wm", 0)
    }
  }
}
