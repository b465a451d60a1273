package graft

import graft.operators.{Pq, PqIndex}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: build→write→probe roundtrip equality with the
  * ephemeral ADC search, partition pruning (plan-asserted via scan
  * metrics), pruned-probe dominance, sidecar model roundtrip, the
  * append maintenance path, and guards. */
class PqIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queryV = emb.filter(col("vec_id") === 0)
    .select(col("embedding").cast("array<double>")).first().getSeq[Double](0)

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pqidx_$tag").toString +
      "/idx"

  test("probe-all equals the ephemeral full-corpus ADC top-k exactly, " +
      "and the codebook sidecar roundtrips the model bit-for-bit") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val path = freshPath("rt")
    PqIndex.build(emb, "vec_id", "embedding", path, ncells = 4,
      m = 8, ksub = 16, maxIter = 12)
    val model = Pq.train(emb, "embedding", 8, 16, maxIter = 12)
    val loaded = PqIndex.loadModel(spark, path)
    assert(loaded.m === model.m && loaded.dsub === model.dsub)
    assert(loaded.codebooks.flatten.flatten.toSeq ===
      model.codebooks.flatten.flatten.toSeq)

    val full = Pq.adcTopK(Pq.encode(emb, "vec_id", "embedding", model),
        model, queryV, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probeAll = PqIndex.probe(spark, path, queryV, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeAll === full)
  }

  test("a pruned probe reads only the probed cell directories and its " +
      "scores never beat the full probe at any rank") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val path = freshPath("prune")
    PqIndex.build(emb, "vec_id", "embedding", path, ncells = 4,
      m = 4, ksub = 8, maxIter = 8)
    val probed = PqIndex.probe(spark, path, queryV, 5, nprobe = 2)
    val rows = probed.collect()
    val scan = probed.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec in the probe plan")
    val filesRead = scan.map(_.metrics("numFiles").value).sum
    val allFiles = new java.io.File(s"$path/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    assert(filesRead > 0 && filesRead < allFiles,
      s"probe read $filesRead of $allFiles files — pruning did not happen")

    val fullScores = PqIndex.probe(spark, path, queryV, 5, nprobe = 4)
      .collect().map(_.getDouble(1))
    rows.map(_.getDouble(1)).zip(fullScores).foreach { case (p, f) =>
      assert(p <= f + 1e-12)
    }
  }

  test("append: new vectors are probe-visible with frozen sidecars and " +
      "untouched cell files are not rewritten") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    import spark.implicits._
    val path = freshPath("app")
    PqIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding",
      path, ncells = 4, m = 4, ksub = 8, maxIter = 8)
    val before = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap

    // append the query vector itself under a fresh id: it reconstructs
    // onto its own centroid chain, so it must take rank 1.
    PqIndex.append(Seq((9999L, queryV)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    val top = PqIndex.probe(spark, path, queryV, 3, nprobe = 4).collect()
    assert(top.map(_.getLong(0)).contains(9999L))

    val after = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
    val untouched = before.keySet.filter(after.contains)
    assert(untouched.nonEmpty)
    untouched.foreach(p => assert(after(p) === before(p),
      s"pre-existing file $p was rewritten by append"))
  }

  test("guards: ragged append vector and empty corpus fail loudly") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    import spark.implicits._
    val path = freshPath("guard")
    PqIndex.build(emb, "vec_id", "embedding", path, ncells = 2,
      m = 4, ksub = 4, maxIter = 4)
    intercept[org.apache.spark.SparkException] {
      PqIndex.append(Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", path)
    }
    intercept[IllegalArgumentException] {
      PqIndex.build(emb.filter(col("vec_id") < 0), "vec_id", "embedding",
        freshPath("empty"), ncells = 2, m = 4, ksub = 4)
    }
  }
}
