package graft

import graft.functions.TopKRows
import org.apache.spark.sql.functions._

class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("topKRows equals the window row_number form (score DESC, id ASC), " +
      "invariant to partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { i =>
      (s"g${i % 4}", rnd.nextInt(40).toDouble, i.toLong) // many score ties
    }
    def expected(k: Int) = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, sc, id) => (-sc, id) }.take(k).zipWithIndex
        .map { case ((_, sc, id), r) => (g, r + 1, id, sc) }
    }.toSet
    for (parts <- Seq(1, 4); k <- Seq(1, 5)) {
      val df = rows.toDF("g", "score", "id").repartition(parts)
      val got = df.groupBy($"g")
        .agg(TopKRows.topKRows($"score", $"id", k).as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "row")))
        .select($"g", ($"pos" + 1).as("rank"), $"row._2".as("id"),
          $"row._1".as("score"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === expected(k), s"parts=$parts k=$k")
    }
  }

  test("NaN and signed-zero scores: equals the Spark window form " +
      "(NaN above +inf, -0.0 ties 0.0) regardless of arrival order") {
    val base = Seq(("g", Double.NaN, 1L), ("g", Double.PositiveInfinity, 2L),
      ("g", 0.0, 3L), ("g", -0.0, 4L), ("g", 5.0, 5L))
    for (rows <- Seq(base, base.reverse); parts <- Seq(1, 3)) {
      val df = rows.toDF("g", "score", "id").repartition(parts)
      val windowForm = df.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"g")
            .orderBy(desc("score"), $"id")))
        .filter($"rk" <= 3).orderBy($"rk")
        .collect().map(_.getLong(2)).toSeq
      val got = df.groupBy($"g")
        .agg(TopKRows.topKRows($"score", $"id", 3).as("top"))
        .select(posexplode($"top").as(Seq("pos", "row")))
        .orderBy($"pos")
        .collect().map(_.getStruct(1).getLong(1)).toSeq
      assert(got === windowForm, s"parts=$parts rows=${rows.take(2)}")
      assert(got === Seq(1L, 2L, 5L)) // NaN first, then +inf, then 5.0
    }
    // -0.0 vs 0.0 tie falls through to the id
    val z = Seq(("g", 0.0, 9L), ("g", -0.0, 3L)).toDF("g", "score", "id")
    val got = z.groupBy($"g")
      .agg(TopKRows.topKRows($"score", $"id", 2).as("top"))
      .select(posexplode($"top").as(Seq("pos", "row")))
      .orderBy($"pos").collect().map(_.getStruct(1).getLong(1)).toSeq
    assert(got === Seq(3L, 9L))
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L)).toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKRows.topKRows($"score", $"id", 5).as("top"))
      .select(posexplode($"top").as(Seq("pos", "row")))
      .select($"row._2").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(11L, 10L))
  }
}
