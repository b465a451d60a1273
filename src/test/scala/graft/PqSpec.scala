package graft

import graft.functions.VectorFunctions._
import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product quantization: train/encode determinism, the ADC–reconstruction
  * algebraic identity, pinned recall and reconstruction error at sf0.001,
  * and input guards. The gate queries (`pq_adc_consistency`,
  * `pq_recall_floor`) re-check the contracts at sf0.01 against 0-row
  * oracles; this spec pins the codebook-defined VALUES the gate cannot. */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  // One model for the pinned-value tests (the gate's exact parameters).
  private lazy val model = Pq.train(emb, "embedding", 8, 16, maxIter = 12)
  private lazy val enc = Pq.encode(emb, "vec_id", "embedding", model)
  private lazy val queryV = emb.filter(col("vec_id") === 0)
    .select(col("embedding").cast("array<double>")).first().getSeq[Double](0)

  test("train is deterministic and shaped m × ksub × dsub") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val small = emb.limit(100)
    val a = Pq.train(small, "embedding", 4, 4, maxIter = 5)
    val b = Pq.train(small, "embedding", 4, 4, maxIter = 5)
    assert(a.m === 4 && a.dsub === 16 && a.ksub === 4)
    assert(a.codebooks.flatten.flatten.toSeq === b.codebooks.flatten.flatten.toSeq)
  }

  test("encode emits one row per vector, codes within [0, ksub)") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val n = emb.count()
    assert(enc.count() === n)
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c >= model.ksub)).count()
    assert(bad === 0L)
    assert(enc.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(model.m))
  }

  test("ADC score equals dot(query, reconstruction) — the asymmetric " +
      "distance identity, for every vector") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val viol = Pq.adcScores(enc, model, queryV)
      .join(enc.select(col("id"),
        vectorDot(Pq.reconstructCol(col("codes"), model),
          typedLit(queryV)).as("r")), Seq("id"))
      .filter(abs(col("adc_score") - col("r")) > 1e-9)
      .count()
    assert(viol === 0L)
  }

  test("pinned at sf0.001: recall@10 = 3 hits, self-hit first, " +
      "reconstruction MSE ≈ 0.5407") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val exact = emb.select(col("vec_id").cast("long").as("id"),
        vectorDot(asDouble(col("embedding")), typedLit(queryV)).as("s"))
      .orderBy(desc("s"), col("id").asc).limit(10)
    val approx = Pq.adcTopK(enc, model, queryV, 10)
    val approxIds = approx.collect().map(_.getLong(0)).toSeq
    // the query IS vector 0: its reconstruction must rank first (no other
    // vector's centroid chain is closer to the query than its own).
    assert(approxIds.head === 0L)
    assert(approx.join(exact, Seq("id")).count() === 3L)
    val mse = enc.select(col("id"),
        Pq.reconstructCol(col("codes"), model).as("r"))
      .join(emb.select(col("vec_id").as("id"),
        asDouble(col("embedding")).as("v")), Seq("id"))
      .select(aggregate(zip_with(col("r"), col("v"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
        .as("se"))
      .agg(avg(col("se"))).first().getDouble(0)
    assert(math.abs(mse - 0.540682) < 1e-4, s"mse=$mse")
  }

  test("ivfAdcTopK: cell-pruned ADC never beats full ADC at any rank, " +
      "and equals it when every cell is probed") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val full = Pq.adcTopK(enc, model, queryV, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val pruned = Pq.ivfAdcTopK(emb, "vec_id", "embedding", model, queryV,
        10, ncells = 8, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    pruned.map(_._2).zip(full.map(_._2)).foreach { case (p, f) =>
      assert(p <= f + 1e-12)
    }
    val all = Pq.ivfAdcTopK(emb, "vec_id", "embedding", model, queryV,
        10, ncells = 8, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq === full.toSeq) // nprobe = ncells → identical ranking
  }

  test("guards: indivisible dim and empty corpus fail loudly") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    intercept[IllegalArgumentException] {
      Pq.train(emb, "embedding", 7, 4, maxIter = 2) // 64 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.train(emb.filter(col("vec_id") < 0), "embedding", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Pq.adcScores(enc, model, Seq(1.0, 2.0)) // wrong query dim
    }
  }
}
