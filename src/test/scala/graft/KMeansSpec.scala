package graft

import graft.operators.KMeansCluster
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def blobs() = {
    // 3 tight, well-separated blobs on coordinate axes (deterministic).
    val pts = for {
      (center, base) <- Seq(
        (Seq(10.0, 0.0, 0.0), 0),
        (Seq(0.0, 10.0, 0.0), 100),
        (Seq(0.0, 0.0, 10.0), 200))
      i <- 0 until 20
    } yield (base + i.toLong,
      center.zipWithIndex.map { case (c, d) => c + 0.01 * ((i + d) % 5) })
    pts.toDF("id", "vec")
  }

  test("fit recovers well-separated blobs and converges to a fixed point") {
    val d = blobs()
    val model = KMeansCluster.fit(d, "vec", k = 3)
    assert(model.converged, s"did not converge in ${model.iterations} iters")
    val assigned = KMeansCluster.assign(d, "vec", model)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    // each blob lands in exactly one cell, and the three cells differ.
    val byBlob = assigned.groupBy { case (id, _) => id / 100 }
      .map { case (b, xs) => b -> xs.map(_._2).distinct }
    assert(byBlob.values.forall(_.length === 1), byBlob.toString)
    assert(byBlob.values.flatten.toSet.size === 3)
    // fixed point: centroid == member mean within float tolerance.
    assert(KMeansCluster.fixedPointViolations(d, "vec", model).count() === 0)
  }

  test("assignment is deterministic across partition layouts") {
    val d = blobs()
    val model = KMeansCluster.fit(d, "vec", k = 3)
    val a1 = KMeansCluster.assign(d, "vec", model)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = KMeansCluster.assign(d.repartition(7), "vec", model)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2)
  }

  test("cellOf assignment equals a local argmin-distance computation") {
    // the in-plan argmax(x·c − ‖c‖²/2) must equal argmin ‖x − c‖² with
    // first-wins tie-breaks — checked against a plain Scala evaluation
    // over deterministic pseudo-random points and centroids.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centroids = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian()))
    val pts = (0 until 200).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    def localCell(v: Seq[Double]): Int = {
      val scores = centroids.map { c =>
        var d = 0.0; var i = 0
        while (i < dim) { d += v(i) * c(i); i += 1 }
        d - c.map(x => x * x).sum / 2.0
      }
      scores.indexOf(scores.max) // first max, like the expression
    }
    val model = KMeansCluster.Model(centroids, 0, converged = true)
    val got = KMeansCluster.assign(pts.toDF("id", "vec"), "vec", model)
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pts.foreach { case (id, v) =>
      assert(got(id) === localCell(v), s"id=$id")
    }
  }

  test("empty cells keep their previous centroid (k > distinct points)") {
    val d = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val model = KMeansCluster.fit(d, "vec", k = 3, maxIter = 10)
    assert(model.centroids.length === 3)
    assert(model.converged)
  }
}
