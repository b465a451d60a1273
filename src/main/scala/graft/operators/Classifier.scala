package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression — the in-engine form of the
  * embedding-based quality/domain classifiers that gate web-scale
  * training corpora (a linear head over document embeddings, the
  * CCNet/fastText-lineage design). The reference scores documents only
  * implicitly (its vector DB ranks by cosine; qdrant_text_loader.py:
  * 137-141) — this adds the supervised filter the curation pipeline
  * needs to act on those embeddings.
  *
  * Spark-first, 100 TB posture:
  *  - **One job per iteration, partials only on the wire.** Each
  *    iteration is a typed mapPartitions pass emitting ONE
  *    (gradient[dim], bias-gradient, loss, n, correct) row per
  *    partition; the driver reduces a partitions×(dim+4) matrix — model
  *    state, not data. This is exactly the treeAggregate shape MLlib
  *    uses, with the feature frame localCheckpointed once so 50
  *    iterations re-read a materialized columnar block, not the
  *    upstream pipeline.
  *  - **Deterministic.** Full-batch gradient (no sampling, no RNG),
  *    zero init, and the driver folds partition partials in partition
  *    order — two trains on the same corpus produce byte-identical
  *    weights, which is what lets specs pin them and the gate re-train
  *    inside a query.
  *  - **Contracts.** Full-batch descent on the (convex, L-smooth)
  *    logistic loss strictly decreases the loss whenever
  *    lr < 2/L, L = max‖x‖²/4 — `classifier_loss_descent` emits any
  *    iteration that violates it (0-row oracle, holds for ANY corpus at
  *    sane lr). In-sample accuracy must beat the majority class —
  *    w = 0 with a bias step already achieves the baseline, so a
  *    trained model that undershoots it signals a broken gradient
  *    (`classifier_accuracy_floor`). Exact values pinned in
  *    ClassifierSpec.
  */
object Classifier {

  /** lossHistory(i) = mean log-loss BEFORE iteration i's update (index 0
    * = loss at the zero init); accuracy = in-sample share of correct
    * 0.5-thresholded predictions under the FINAL weights. */
  final case class Model(weights: Array[Double], bias: Double,
      lossHistory: Array[Double], accuracy: Double, n: Long)

  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Train on (features ARRAY<DOUBLE>, label ∈ {0,1}). Rows with a null/
    * wrong-dimension feature vector or out-of-domain label fail loudly —
    * silently skipping training rows skews the model. */
  def train(df: DataFrame, featCol: String, labelCol: String, dim: Int,
      lr: Double = 1.0, iters: Int = 50, l2: Double = 0.0): Model = {
    require(dim > 0 && iters > 0 && lr > 0, "dim, iters, lr must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(asDouble(col(featCol)).as("x"),
        col(labelCol).cast("double").as("y"))
      .as[(Seq[Double], Double)]
      .localCheckpoint() // 1 materialization, `iters` re-reads
    var w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](iters)
    var acc = 0.0
    var total = 0L
    var it = 0
    while (it < iters) {
      val bw = w.clone() // stable closure copy per iteration
      val bb = b
      // (grad[dim], gradBias, loss, n, correct) per partition
      val partials: Array[(Seq[Double], Double, Double, Long, Long)] =
        data.mapPartitions { rows =>
          val g = new Array[Double](dim)
          var gb = 0.0
          var loss = 0.0
          var n = 0L
          var correct = 0L
          rows.foreach { case (xs, y) =>
            require(xs != null && xs.length == dim,
              s"feature vector of dim ${if (xs == null) -1 else xs.length}" +
                s" (expected $dim)")
            require(y == 0.0 || y == 1.0, s"label $y not in {0,1}")
            val x = xs.toArray
            var z = bb
            var i = 0
            while (i < dim) { z += bw(i) * x(i); i += 1 }
            val p = sigmoid(z)
            val err = p - y
            i = 0
            while (i < dim) { g(i) += err * x(i); i += 1 }
            gb += err
            // numerically-stable log-loss: log(1+e^-|z|) + max(z,0) − z·y
            loss += math.log1p(math.exp(-math.abs(z))) +
              math.max(z, 0.0) - z * y
            if ((p >= 0.5) == (y == 1.0)) correct += 1
            n += 1
          }
          Iterator.single((g.toSeq, gb, loss, n, correct))
        }.collect() // partition order → deterministic fold
      val n = partials.map(_._4).sum
      require(n > 0, "cannot train on an empty corpus")
      val grad = new Array[Double](dim)
      var gb = 0.0
      var loss = 0.0
      var correct = 0L
      partials.foreach { case (g, pgb, pl, _, pc) =>
        var i = 0
        while (i < dim) { grad(i) += g(i); i += 1 }
        gb += pgb; loss += pl; correct += pc
      }
      losses(it) = loss / n
      acc = correct.toDouble / n
      total = n
      var i = 0
      while (i < dim) { w(i) -= lr * (grad(i) / n + l2 * w(i)); i += 1 }
      b -= lr * gb / n
      it += 1
    }
    // accuracy under the FINAL weights (the loop measured it pre-update)
    val fm = Model(w, b, losses, acc, total)
    val scored = scoreFrame(data.toDF("x", "y"), "x", fm)
      .select(((col("score") >= 0.5) === (col("y") === 1.0))
        .cast("long").as("ok"))
      .agg(sum("ok").as("c"), count(lit(1)).as("n")).first()
    data.unpersist()
    fm.copy(accuracy = scored.getLong(0).toDouble / scored.getLong(1))
  }

  /** σ(w·x + b) as a Column — audit/verify path (interpreted HOF; the
    * corpus-scale scorer is `scoreFrame`). */
  def scoreCol(features: Column, model: Model): Column = {
    val wLit = typedLit(model.weights.toSeq)
    val z = aggregate(zip_with(features, wLit, (a, c) => a * c),
      lit(model.bias), (accum, x) => accum + x)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** (original columns…, score) via a typed kernel — the hot path:
    * scalac-compiled dot product, weights in the closure, one corpus
    * pass, no shuffle (PLANS.md lesson 7). */
  def scoreFrame(df: DataFrame, featCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = model.weights
    val b = model.bias
    val cols = df.columns
    val withV = df.withColumn("_v", asDouble(col(featCol)))
    val schema = withV.schema
    implicit val enc = org.apache.spark.sql.Encoders.row(
      schema.add("score", "double"))
    val vIdx = schema.fieldIndex("_v")
    withV.mapPartitions { rows =>
      rows.map { r =>
        val xs = r.getSeq[Double](vIdx)
        // loud like train: a null/mismatched vector scored against a
        // truncated dot product yields a plausible-but-wrong score
        require(xs != null && xs.length == w.length,
          s"Classifier.scoreFrame: feature vector of dim " +
            s"${if (xs == null) -1 else xs.length} (expected ${w.length})")
        var z = b
        var i = 0
        while (i < w.length) { z += w(i) * xs(i); i += 1 }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sigmoid(z))
      }
    }.drop("_v")
     .select((cols :+ "score").map(col).toSeq: _*)
  }
}
