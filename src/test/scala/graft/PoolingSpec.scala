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

  test("meanPool: ragged or empty dimensions fail loudly") {
    import spark.implicits._
    val ragged = Seq(("a", Seq(1.0)), ("a", Seq(1.0, 2.0)))
      .toDF("label", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Pooling.meanPool(ragged, "label", "embedding")
    }
    assert(e.getMessage.contains("dimension"))
    val empty = Seq(("a", Seq.empty[Double])).toDF("label", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Pooling.meanPool(empty, "label", "embedding")
    }
    assert(e2.getMessage.contains("dimension"))
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
