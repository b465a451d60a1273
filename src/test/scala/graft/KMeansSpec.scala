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

  test("empty cells keep their previous centroid (k > distinct points)") {
    val d = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val model = KMeansCluster.fit(d, "vec", k = 3, maxIter = 10)
    assert(model.centroids.length === 3)
    assert(model.converged)
  }
}
