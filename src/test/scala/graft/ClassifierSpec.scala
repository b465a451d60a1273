package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Logistic-regression trainer: analytic-vs-numeric gradient agreement,
  * monotone convex descent, determinism, the two scorer paths agreeing,
  * pinned corpus values at sf0.001, separable-data sanity, and input
  * guards. The gate query (`classifier_train_audit`) re-checks descent
  * and the accuracy floor at sf0.01 against a 0-row oracle. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // 4-point, 2-dim hand corpus used by the gradient and separability tests.
  private def tiny = Seq(
    (Seq(1.0, 0.0), 1.0), (Seq(0.8, 0.1), 1.0),
    (Seq(0.0, 1.0), 0.0), (Seq(0.1, 0.9), 0.0)).toDF("x", "y")

  test("one GD step matches the numeric gradient of the log-loss at w=0") {
    val m = Classifier.train(tiny, "x", "y", dim = 2, lr = 1.0, iters = 1)
    // loss(w, b) computed independently of the trainer
    val data = Seq((Array(1.0, 0.0), 1.0), (Array(0.8, 0.1), 1.0),
      (Array(0.0, 1.0), 0.0), (Array(0.1, 0.9), 0.0))
    def loss(w: Array[Double], b: Double): Double =
      data.map { case (x, y) =>
        val z = b + w.zip(x).map(p => p._1 * p._2).sum
        math.log1p(math.exp(-math.abs(z))) + math.max(z, 0.0) - z * y
      }.sum / data.length
    val eps = 1e-6
    val numGrad = Array.tabulate(2) { i =>
      val wp = new Array[Double](2); wp(i) = eps
      val wm = new Array[Double](2); wm(i) = -eps
      (loss(wp, 0.0) - loss(wm, 0.0)) / (2 * eps)
    }
    val numGb = (loss(new Array[Double](2), eps) -
      loss(new Array[Double](2), -eps)) / (2 * eps)
    // after one lr=1 step from zero init: w = −grad, b = −gradB
    assert(math.abs(m.weights(0) + numGrad(0)) < 1e-5)
    assert(math.abs(m.weights(1) + numGrad(1)) < 1e-5)
    assert(math.abs(m.bias + numGb) < 1e-5)
  }

  test("training is deterministic: two fits produce identical weights") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val d = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
      .select(col("embedding").as("x"),
        (col("label") < 5).cast("double").as("y"))
    val a = Classifier.train(d, "x", "y", dim = 64, iters = 10)
    val b = Classifier.train(d, "x", "y", dim = 64, iters = 10)
    assert(a.weights.toSeq === b.weights.toSeq && a.bias === b.bias)
    assert(a.lossHistory.toSeq === b.lossHistory.toSeq)
  }

  test("pinned at sf0.001: loss descends monotonically from ln 2 and " +
      "accuracy beats the majority class") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m = Classifier.train(
      emb.select(col("embedding").as("x"),
        (col("label") < 5).cast("double").as("y")),
      "x", "y", dim = 64, lr = 1.0, iters = 80)
    assert(math.abs(m.lossHistory.head - math.log(2)) < 1e-12)
    assert(m.lossHistory.sliding(2).forall(p => p(1) <= p(0) + 1e-12))
    assert(math.abs(m.lossHistory.last - 0.670035) < 1e-4)
    assert(math.abs(m.accuracy - 0.644) < 1e-9, s"acc=${m.accuracy}")
    assert(math.abs(m.bias - (-0.02812181)) < 1e-6)
  }

  test("curriculum staging pinned at sf0.001: quantile-threshold stages " +
      "are near-balanced with strictly increasing mean scores (the " +
      "curriculum_stages contract, populations pinned)") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Classifier.train(
      emb.select(col("embedding").as("x"),
        (col("label") < 5).cast("double").as("y")),
      "x", "y", dim = 64, lr = 1.0, iters = 80)
    val scored = Classifier.scoreFrame(
      emb.select(col("vec_id"), col("embedding").as("x")), "x", model)
    val th = scored.stat.approxQuantile("score",
      Array(0.25, 0.5, 0.75), 0.001)
    assert(th.sliding(2).forall(p => p(0) <= p(1)))
    val stage = when(col("score") < th(0), 0)
      .when(col("score") < th(1), 1)
      .when(col("score") < th(2), 2)
      .otherwise(3)
    val stats = scored.withColumn("stage", stage)
      .groupBy("stage")
      .agg(count(lit(1)).as("n"), avg("score").as("m"))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(stats.map(_._1).toSeq === Seq(0, 1, 2, 3))
    assert(stats.map(_._2).toSeq === Seq(124L, 125L, 125L, 126L))
    assert(stats.map(_._3).sliding(2).forall(p => p(0) < p(1)))
  }

  test("scoreCol and scoreFrame agree (expression path vs typed kernel)") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"),
        (col("label") < 5).cast("double").as("y"))
    val m = Classifier.train(emb, "x", "y", dim = 64, iters = 5)
    val viaCol = emb.select(col("vec_id"),
        Classifier.scoreCol(col("x"), m).as("s_col"))
    val viaKernel = Classifier.scoreFrame(emb, "x", m)
      .select(col("vec_id"), col("score").as("s_ker"))
    val diff = viaCol.join(viaKernel, Seq("vec_id"))
      .filter(abs(col("s_col") - col("s_ker")) > 1e-12).count()
    assert(diff === 0L)
  }

  test("linearly separable data trains to accuracy 1") {
    val m = Classifier.train(tiny, "x", "y", dim = 2, lr = 2.0, iters = 200)
    assert(m.accuracy === 1.0)
    assert(m.lossHistory.last < 0.1)
  }

  test("guards: bad labels, wrong dims, empty corpus fail loudly") {
    val badLabel = Seq((Seq(1.0, 0.0), 2.0)).toDF("x", "y")
    intercept[Exception] {
      Classifier.train(badLabel, "x", "y", dim = 2, iters = 1)
    }
    val badDim = Seq((Seq(1.0), 1.0)).toDF("x", "y")
    intercept[Exception] {
      Classifier.train(badDim, "x", "y", dim = 2, iters = 1)
    }
    intercept[Exception] {
      Classifier.train(tiny.filter(col("y") > 5), "x", "y", dim = 2,
        iters = 1)
    }
  }
}
