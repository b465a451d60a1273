package graft

import graft.operators.Covariance
import org.apache.spark.sql.functions._

class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceMatrix: hand-computed 2-D case (population covariance)") {
    // (1,2), (2,4), (3,6): var_x = 2/3, cov = 4/3, var_y = 8/3
    val df = Seq(Seq(1.0, 2.0), Seq(2.0, 4.0), Seq(3.0, 6.0)).toDF("v")
    val got = Covariance.covarianceMatrix(df, "v", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(6)))).toMap
    assert(got((0, 0)) === ((3L, 0.666667)))
    assert(got((0, 1)) === ((3L, 1.333333)))
    assert(got((1, 1)) === ((3L, 2.666667)))
  }

  test("covarianceMatrix: kernel grid equals the naive explode form on " +
      "random data; negative covariance carries +0.0 discipline; " +
      "layout independent") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(40)(Seq(rnd.nextDouble(), -rnd.nextDouble() * 2,
      rnd.nextDouble() - 0.5))
    val df = data.toDF("v")
    val got = Covariance.covarianceMatrix(df, "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(6)).toMap
    // naive: quantize + explode pairs declaratively
    val q = df.select(transform(col("v").cast("array<double>"),
      x => round(x * lit(1000000L), 0).cast("long")).as("qv"))
    val naive = q.select(posexplode(col("qv")).as(Seq("i", "qi")),
        col("qv"))
      .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("qi").as("si"), sum("qj").as("sj"),
        sum(col("qi") * col("qj")).as("sij"))
      .select(col("i"), col("j"),
        (round((col("sij").cast("double") / col("n") -
            (col("si").cast("double") / col("n")) *
              (col("sj").cast("double") / col("n"))) / lit(1.0e12), 6)
          + lit(0.0)).as("cov"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(got === naive)
    val repart = Covariance.covarianceMatrix(df.repartition(7), "v", 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(6))
      .toMap
    assert(repart === got)
  }

  test("principalComponent: rank-1 matrix recovers the exact direction " +
      "and eigenvalue; sign fixed positive; deterministic") {
    val df = Seq(Seq(1.0, 2.0), Seq(2.0, 4.0), Seq(3.0, 6.0)).toDF("v")
    val (l1, v1) = Covariance.principalComponent(df, "v", 2)
    // C = [[2/3, 4/3], [4/3, 8/3]] (rounded cells): λ1 = trace = 10/3,
    // eigvec (1, 2)/√5
    assert(math.abs(l1 - 10.0 / 3.0) < 1e-3)
    assert(math.abs(v1(0) - 1.0 / math.sqrt(5.0)) < 1e-6)
    assert(math.abs(v1(1) - 2.0 / math.sqrt(5.0)) < 1e-6)
    val (l2, v2) = Covariance.principalComponent(df, "v", 2)
    assert(l1 === l2 && v1.toSeq === v2.toSeq)
  }

  test("pcaDominanceAudit: empty on random data; guards fire") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(30)(Seq.fill(4)(rnd.nextDouble() - 0.3)).toDF("v")
    assert(Covariance.pcaDominanceAudit(df, "v", 4).count() === 0L)
    intercept[Exception] {
      Covariance.covarianceMatrix(df, "v", 5).collect()
    }
    intercept[IllegalArgumentException] {
      Covariance.covarianceMatrix(df, "v", 0)
    }
  }
  test("jacobiEigen: hand-built symmetric matrix with known eigenpairs") {
    // C = [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2, (1,-1)/√2
    val (evals, evecs) = Covariance.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-10)
    assert(math.abs(evals(1) - 1.0) < 1e-10)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(r2, r2)).forall {
      case (a, b) => math.abs(a - b) < 1e-10 })
    assert(evecs(1).zip(Array(r2, -r2)).forall {
      case (a, b) => math.abs(a - b) < 1e-10 })
  }

  test("jacobiEigen reconstructs the matrix: C = E^T diag(l) E") {
    val rnd = new scala.util.Random(7)
    val n = 6
    val m = Array.tabulate(n, n)((_, _) => rnd.nextDouble() - 0.5)
    val c = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(k => m(i)(k) * m(j)(k)).sum) // SPD by construction
    val (evals, evecs) = Covariance.jacobiEigen(c)
    for (i <- 0 until n; j <- 0 until n) {
      val rec = (0 until n).map(k => evecs(k)(i) * evals(k) * evecs(k)(j)).sum
      assert(math.abs(rec - c(i)(j)) < 1e-9, s"cell ($i,$j)")
    }
    // descending eigenvalues
    assert(evals.toSeq === evals.sortBy(-_).toSeq)
  }

  test("whiten: whitened covariance is the identity on a correlated " +
      "2-D cloud") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // strongly correlated pairs (x, 0.9x + noise)
    val rows = (0L until 400L).map { i =>
      val x = rnd.nextGaussian()
      (i, Seq(x, 0.9 * x + 0.1 * rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "v")
    val w = Covariance.whiten(df, "id", "v", dim = 2)
    val cov = Covariance.covarianceMatrix(w, "whitened", 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(6))).toMap
    assert(math.abs(cov((0, 0)) - 1.0) < 0.05, s"var0 ${cov((0, 0))}")
    assert(math.abs(cov((1, 1)) - 1.0) < 0.05, s"var1 ${cov((1, 1))}")
    assert(math.abs(cov((0, 1))) < 0.05, s"cross ${cov((0, 1))}")
  }

  test("grid flush: a single partition crossing the 64k-row flush " +
      "boundary sums exactly (the flushed partials recombine losslessly)") {
    val n = 70000
    val df = spark.range(n).select(
      typedLit(Seq(1.5, -2.0)).as("v")).repartition(1)
    val cells = Covariance.covarianceMatrix(df, "v", 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getString(5), r.getDouble(6)))).toMap
    // identical rows: n exact, s_i = n·q_i, s_ij = n·q_i·q_j, cov = 0
    val q0 = 1500000L; val q1 = -2000000L
    assert(cells((0, 0)) === ((n.toLong, n * q0, (BigInt(n) * q0 * q0).toString, 0.0)))
    assert(cells((0, 1)) === ((n.toLong, n * q0, (BigInt(n) * q0 * q1).toString, 0.0)))
    assert(cells((1, 1)) === ((n.toLong, n * q1, (BigInt(n) * q1 * q1).toString, 0.0)))
  }

  test("pathological magnitudes fail LOUDLY (exact arithmetic) instead " +
      "of silently wrapping the Long grid") {
    val df = Seq(Tuple1(Seq(4.0e12, 0.0))).toDF("v")
    val e = intercept[Exception] {
      Covariance.covarianceMatrix(df, "v", 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $e")
  }
}
