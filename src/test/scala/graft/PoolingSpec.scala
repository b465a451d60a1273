package graft

class PoolingSpec extends SparkSpec {

  test("meanPool: hand-computed group means") {
    import spark.implicits._
    val emb = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)), ("b", Seq(10.0, 20.0)))
      .toDF("label", "embedding")
    val got = graft.operators.Pooling.meanPool(emb, "label", "embedding")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Double](2))))
      .toMap
    assert(got === Map("a" -> ((2L, Seq(2.0, 3.0))),
      "b" -> ((1L, Seq(10.0, 20.0)))))
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("meanPool: ragged, null, or empty dimensions fail loudly") {
    import spark.implicits._
    // ragged across rows: caught IN the aggregation pass (raise_error)
    val ragged = Seq(("a", Seq(1.0)), ("a", Seq(1.0, 2.0)))
      .toDF("label", "embedding").repartition(1)
    val e = intercept[Exception] {
      graft.operators.Pooling.meanPool(ragged, "label", "embedding")
        .collect()
    }
    assert(msgs(e).exists(_.contains("meanPool")), msgs(e).mkString("|"))
    // a NULL vector must hit the same loud path, not an NPE
    val withNull = Seq(("a", Seq(1.0, 2.0)), ("a", null))
      .toDF("label", "embedding").repartition(1)
    val e2 = intercept[Exception] {
      graft.operators.Pooling.meanPool(withNull, "label", "embedding")
        .collect()
    }
    assert(msgs(e2).exists(_.contains("meanPool")), msgs(e2).mkString("|"))
    // all-empty group: _dmin = 0 fails the > 0 branch in-aggregation
    val empty = Seq(("a", Seq.empty[Double])).toDF("label", "embedding")
    val e3 = intercept[Exception] {
      graft.operators.Pooling.meanPool(empty, "label", "embedding")
        .collect()
    }
    assert(msgs(e3).exists(_.contains("meanPool")), msgs(e3).mkString("|"))
    // with an explicit expectedDim the check is global, not per-group:
    // internally-consistent groups of the WRONG dim still fail
    val mixed = Seq(("a", Seq(1.0, 2.0)), ("b", Seq(1.0)))
      .toDF("label", "embedding")
    val e4 = intercept[Exception] {
      graft.operators.Pooling.meanPool(mixed, "label", "embedding",
          expectedDim = Some(2))
        .collect()
    }
    assert(msgs(e4).exists(_.contains("meanPool")), msgs(e4).mkString("|"))
  }

  test("randomProject: deterministic across layouts, preserves pairwise " +
      "distances roughly (JL sanity), rejects ragged rows loudly") {
    import spark.implicits._
    import graft.operators.Projection
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian())))
    val df = vecs.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Projection.randomProject(d, "vec_id", "embedding", 64, 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val got = run(df)
    assert(got === run(df.repartition(5)))
    assert(got.values.forall(_.length == 16))
    // JL sanity on one pair: projected distance within a loose factor of
    // the original (k=16 is coarse; this catches sign/scale bugs, like a
    // missing 1/sqrt(k), not fine distortion)
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val d0 = dist(vecs(0)._2, vecs(1)._2)
    val dp = dist(got(0L), got(1L))
    assert(dp > 0.3 * d0 && dp < 3.0 * d0, s"orig=$d0 proj=$dp")
    val ragged = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Projection.randomProject(ragged, "vec_id", "embedding", 64, 16)
        .collect()
    }
    assert(msgs(e).exists(_.contains("randomProject")), msgs(e).mkString("|"))
  }

  test("meanPool is layout-independent") {
    import spark.implicits._
    val emb = (1 to 40).map(i =>
      (s"g${i % 3}", Seq(i.toDouble, (i * 2).toDouble)))
      .toDF("label", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Pooling.meanPool(df, "label", "embedding")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Double](2))).toSet
    assert(run(emb) === run(emb.repartition(7)))
  }
}
