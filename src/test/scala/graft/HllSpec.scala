package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  test("estimate accuracy across magnitudes (p=11 → ~2.3% stderr)") {
    import spark.implicits._
    for (n <- Seq(100, 1000, 20000)) {
      val df = (0 until n).map(i => s"user-$i").toDF("v")
      val regs = Hll.groupSketches(df.withColumn("g", lit(1)), col("v"),
        Seq("g"), p = 11).select("hll").first().getAs[Array[Byte]](0)
      val est = Hll.estimate(regs)
      assert(math.abs(est - n) <= math.max(n * 0.05, 2.0),
        s"n=$n est=$est")
    }
  }

  test("duplicates do not move the estimate") {
    import spark.implicits._
    val base = (0 until 500).map(i => s"u$i")
    val dup = base ++ base ++ base
    def sketch(vs: Seq[String]) =
      Hll.groupSketches(vs.toDF("v").withColumn("g", lit(1)), col("v"),
        Seq("g"), p = 11).select("hll").first().getAs[Array[Byte]](0)
    assert(sketch(base).toSeq === sketch(dup).toSeq)
  }

  test("union law: merge of disjoint sketches estimates the union") {
    import spark.implicits._
    def sketch(vs: Seq[String]) =
      Hll.groupSketches(vs.toDF("v").withColumn("g", lit(1)), col("v"),
        Seq("g"), p = 11).select("hll").first().getAs[Array[Byte]](0)
    val a = sketch((0 until 800).map(i => s"a$i"))
    val b = sketch((0 until 600).map(i => s"b$i"))
    val overlap = sketch((400 until 800).map(i => s"a$i")) // ⊂ a
    val estU = Hll.estimate(Hll.union(a, b))
    assert(math.abs(estU - 1400) <= 1400 * 0.05, s"disjoint union $estU")
    // union with a subset changes nothing
    assert(Hll.union(a, overlap).toSeq === a.toSeq)
  }

  test("sketches are partitioning-invariant (register max is " +
      "commutative)") {
    import spark.implicits._
    val df = (0 until 3000).map(i => s"v$i").toDF("v")
      .withColumn("g", lit(1))
    val one = Hll.groupSketches(df.coalesce(1), col("v"), Seq("g"))
      .select("hll").first().getAs[Array[Byte]](0)
    val many = Hll.groupSketches(df.repartition(13), col("v"), Seq("g"))
      .select("hll").first().getAs[Array[Byte]](0)
    assert(one.toSeq === many.toSeq)
  }

  test("auditedEstimates: every group within tolerance on the testdata") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001",
        "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
    val out = Hll.auditedEstimates(ev, col("user_id"), Seq("day"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_tol"),
        s"day ${r.getAs[String]("day")}: est ${r.getAs[Long]("hll_est")} " +
          s"vs exact ${r.getAs[Long]("exact_distinct")}")
    }
  }
}
