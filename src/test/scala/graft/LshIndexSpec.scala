package graft

import graft.operators.{Dedup, LshIndex}
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "o rato roeu a roupa do rei de roma e depois fugiu " +
    "para o campo onde encontrou um queijo enorme perto do moinho antigo"
  private val bread = "receita de pao caseiro com fermento natural agua " +
    "farinha sal e tempo de descanso longo na geladeira durante a noite"
  private val corpus = Seq((0L, base), (1L, bread),
    (2L, "um documento completamente diferente sobre motores spark e " +
      "planos de execucao distribuida em larga escala com muitos nos"))

  test("probePairs equals the unindexed incrementalLshPairs contract " +
      "(pairs, jaccard) for a mixed batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx")
      .toString + "/idx"
    val corpusDf = corpus.toDF("doc_id", "text")
    LshIndex.build(corpusDf, "doc_id", "text", dir)
    val batch = Seq(
      (10L, base.replace("queijo", "bolo")), // near-dup of corpus 0
      (11L, bread),                          // exact re-send of corpus 1
      (12L, "texto novo sobre assuntos nunca vistos antes em nenhum " +
        "documento do corpus atual de testes pequenos"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("new_id"), col("corpus_id"),
        round(col("jaccard"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val idx = canon(LshIndex.probePairs(spark, dir, batch, "doc_id",
      "text", threshold = 0.5))
    val ref = canon(Dedup.incrementalLshPairs(batch, corpusDf, "doc_id",
      "text", threshold = 0.5))
    assert(idx === ref)
    assert(idx.map(p => (p._1, p._2)) === Set((10L, 0L), (11L, 1L)))
  }

  test("append folds a batch in; the NEXT probe collides against it " +
      "without rebuilding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx2")
      .toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", dir)
    val accepted = Seq((20L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais umidos"))
      .toDF("doc_id", "text")
    LshIndex.append(accepted, "doc_id", "text", dir)
    val probe = Seq((30L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais secos"))
      .toDF("doc_id", "text")
    val hits = LshIndex.probePairs(spark, dir, probe, "doc_id", "text",
        threshold = 0.5)
      .select(col("new_id"), col("corpus_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((30L, 20L)),
      "appended doc not visible to the next probe")
  }

  test("crash-replayed append (at-least-once window) does not re-expand " +
      "deduped candidates into duplicate output pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx3")
      .toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", dir)
    val accepted = Seq((20L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais umidos"))
      .toDF("doc_id", "text")
    // the documented failure mode: the batch commits, the caller crashes
    // before recording it, and replays the SAME append
    LshIndex.append(accepted, "doc_id", "text", dir)
    LshIndex.append(accepted, "doc_id", "text", dir)
    val probe = Seq((30L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais secos"))
      .toDF("doc_id", "text")
    val rows = LshIndex.probePairs(spark, dir, probe, "doc_id", "text",
        threshold = 0.5)
      .select(col("new_id"), col("corpus_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.toSet.size,
      s"duplicate pairs after replayed append: ${rows.toSeq}")
    assert(rows.toSet === Set((30L, 20L)))
  }

  test("compact after a replayed append restores exactly the " +
      "once-appended row counts per table, and the next probe's pairs " +
      "are unchanged") {
    def rowCounts(dir: String): Map[String, Long] =
      Seq("buckets", "sigs", "fps").map(t =>
        t -> spark.read.parquet(s"$dir/$t").count()).toMap
    def buildAt(suffix: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_lshidx_c$suffix").toString + "/idx"
      LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", dir)
      dir
    }
    val accepted = Seq((20L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais umidos"))
      .toDF("doc_id", "text")
    // reference: the exactly-once world
    val ref = buildAt("ref")
    LshIndex.append(accepted, "doc_id", "text", ref)
    // replayed world: same append lands twice, then compact
    val dir = buildAt("dup")
    LshIndex.append(accepted, "doc_id", "text", dir)
    LshIndex.append(accepted, "doc_id", "text", dir)
    val inflated = rowCounts(dir)
    val expected = rowCounts(ref)
    assert(Seq("buckets", "sigs", "fps")
        .exists(t => inflated(t) > expected(t)),
      "replay did not inflate any table — the compact test is vacuous")
    val (before, after) = LshIndex.compact(spark, dir)
    assert(before === inflated.values.sum)
    assert(after === expected.values.sum)
    assert(rowCounts(dir) === expected,
      "compact did not restore the exactly-once per-table row counts")
    // admission behavior is untouched: the next probe reads the same pairs
    val probe = Seq((30L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais secos"))
      .toDF("doc_id", "text")
    def pairsAt(p: String) =
      LshIndex.probePairs(spark, p, probe, "doc_id", "text",
          threshold = 0.5)
        .select(col("new_id"), col("corpus_id"), round(col("jaccard"), 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    assert(pairsAt(dir) === pairsAt(ref))
    assert(pairsAt(dir) === Set((30L, 20L,
      pairsAt(ref).head._3)))
  }

  test("compaction policy probe: a replay-heavy index recommends " +
      "compaction, a clean one does not, and compact resets the ratio") {
    val accepted = Seq((20L, "frase original sobre jardins botanicos e " +
      "estufas de vidro com plantas raras de climas tropicais umidos"))
      .toDF("doc_id", "text")
    val clean = java.nio.file.Files
      .createTempDirectory("graft_lshidx_pc").toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", clean)
    LshIndex.append(accepted, "doc_id", "text", clean)
    assert(LshIndex.redundancyRatio(spark, clean) === 1.0)
    assert(!LshIndex.compactRecommended(spark, clean))
    // replay-heavy: the same accepted batch folds in four times
    // (at-least-once crash loops) — 7 fps rows over 4 ids = 1.75x
    val heavy = java.nio.file.Files
      .createTempDirectory("graft_lshidx_ph").toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", heavy)
    (1 to 4).foreach(_ =>
      LshIndex.append(accepted, "doc_id", "text", heavy))
    val ratio = LshIndex.redundancyRatio(spark, heavy)
    assert(ratio === 1.75, s"expected 7/4 fps redundancy, got $ratio")
    assert(LshIndex.compactRecommended(spark, heavy))
    LshIndex.compact(spark, heavy)
    assert(LshIndex.redundancyRatio(spark, heavy) === 1.0)
    assert(!LshIndex.compactRecommended(spark, heavy))
  }

  test("an interrupted compact swap (live dir renamed away, tmp not " +
      "yet in) heals on the next read — no data loss, no manual step") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_h")
      .toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", dir)
    val fps = new org.apache.hadoop.fs.Path(s"$dir/fps")
    val fs = fps.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: live renamed to ._old, nothing in place
    assert(fs.rename(fps, new org.apache.hadoop.fs.Path(s"$dir/fps._old")))
    assert(LshIndex.exists(spark, dir), "heal did not roll the backup in")
    val hits = LshIndex.exactHits(spark, dir,
        Seq((50L, bread)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(50L), "healed fps table lost the exact-dup rows")
  }

  test("probe reads only the batch's pb partition folds (file pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx3")
      .toString + "/idx"
    LshIndex.build(corpus.toDF("doc_id", "text"), "doc_id", "text", dir)
    val batch = Seq((40L, base)).toDF("doc_id", "text")
    // plan-level check: the buckets scan must carry a pb IN (...) filter
    // with < 64 folds, i.e. partition pruning is active
    val pairs = LshIndex.probePairs(spark, dir, batch, "doc_id", "text",
      threshold = 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("pb"), "pb partition column missing from plan")
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((40L, 0L)))
  }
}
