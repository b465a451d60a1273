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
    // empty FIRST vector: rejected before the plan runs
    val empty = Seq(("a", Seq.empty[Double])).toDF("label", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Pooling.meanPool(empty, "label", "embedding")
    }
    assert(e3.getMessage.contains("dimension"))
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
