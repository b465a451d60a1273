package graft

import graft.operators.{GraphOps, RetrievalMetrics}
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── pageRankInt ────────────────────────────────────────────────────────

  test("pageRankInt: hand-computed 2 iterations on a 3-node graph") {
    // edges 1→2, 1→3, 2→3, 3→1; scale 1e6, damping 85/100.
    // r0 = 333333 each, base = 15e6/300 = 50000.
    // iter1: inbox 1←333333, 2←166666, 3←166666+333333
    //   → (333333, 191666, 474999)
    // iter2: inbox 1←474999, 2←166666, 3←166666+191666
    //   → (453749, 191666, 354582)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRankInt(e, "src", "dst", iters = 2,
        scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 453749L, 2L -> 191666L, 3L -> 354582L))
  }

  test("pageRankInt: dangling node receives mass but sends none; " +
      "partitioning never changes a bit (integer sums)") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 4L)).toDF("src", "dst")
    val a = GraphOps.pageRankInt(e, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keySet === Set(1L, 2L, 4L))
    assert(a(4L) > 0L)
    val b = GraphOps.pageRankInt(e.repartition(7), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    intercept[IllegalArgumentException] {
      GraphOps.pageRankInt(e, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankInt(e, "src", "dst", iters = 1, dampNum = 101)
    }
  }

  // ── labelPropagate ─────────────────────────────────────────────────────

  test("labelPropagate: majority spreads, null seeds fill in, " +
      "count ties break to the smallest label") {
    // 1→2, 2→1, 3→1, 3→2; seeds 1:10, others null. After one round
    // node 2 and 3 both see label 10; node 1's only neighbor (2) is
    // unlabeled, so it keeps 10.
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, Some(10L)), (2L, None), (3L, None))
      .toDF("id", "label")
    val got = GraphOps.labelPropagate(e, "src", "dst", seeds, "id",
        "label", iters = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(10L), 2L -> Some(10L), 3L -> Some(10L)))
    // tie: node 5's two neighbors carry labels 2 and 1 (one vote each)
    // → smallest label wins.
    val e2 = Seq((5L, 6L), (5L, 7L)).toDF("src", "dst")
    val seeds2 = Seq((5L, None), (6L, Some(2L)), (7L, Some(1L)))
      .toDF("id", "label")
    val got2 = GraphOps.labelPropagate(e2, "src", "dst", seeds2, "id",
        "label", iters = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got2(5L) === Some(1L))
    // isolated unlabeled node stays null
    assert(got2(6L) === Some(2L) && got2(7L) === Some(1L))
  }

  // ── rankedEval / macroEval ─────────────────────────────────────────────

  private def discount(r: Int): Double = 1.0 / (math.log(r + 1.0) / math.log(2.0))
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rankedEval: hand-checked metrics; zero-relevant query scores 0") {
    val ranked = ((1 to 5).map(r => (1L, r.toLong, r)) ++
      (1 to 5).map(r => (2L, (100 + r).toLong, r)))
      .toDF("query_id", "id", "rank")
    // query 1: relevant {2, 5, 9} → hits at ranks 2 and 5
    val rel = Seq((1L, 2L), (1L, 5L), (1L, 9L)).toDF("query_id", "id")
    val got = RetrievalMetrics.rankedEval(ranked, rel, k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_rel") === 3L)
    assert(q1.getAs[Long]("hits") === 2L)
    assert(q1.getAs[Double]("rr") === 0.5)
    val dcg = discount(2) + discount(5)
    val idcg = discount(1) + discount(2) + discount(3)
    assert(q1.getAs[Double]("ndcg") === r4(dcg / idcg))
    assert(q1.getAs[Double]("recall_k") === r4(2.0 / 3.0))
    assert(q1.getAs[Double]("precision_k") === 0.4)
    val q2 = got(2L)
    assert(q2.getAs[Long]("n_rel") === 0L)
    assert(Seq("rr", "ndcg", "recall_k", "precision_k")
      .forall(c => q2.getAs[Double](c) === 0.0))
    intercept[IllegalArgumentException] {
      RetrievalMetrics.rankedEval(ranked, rel, k = 0)
    }
  }

  test("macroEval: averages the per-query metrics") {
    val perQuery = Seq(
      (1L, 3L, 2L, 0.5, 0.4, 0.6667, 0.4),
      (2L, 0L, 0L, 0.0, 0.0, 0.0, 0.0))
      .toDF("query_id", "n_rel", "hits", "rr", "ndcg", "recall_k",
        "precision_k")
    val m = RetrievalMetrics.macroEval(perQuery).collect()(0)
    assert(m.getAs[Long]("n_queries") === 2L)
    assert(m.getAs[Double]("mrr") === 0.25)
    assert(m.getAs[Double]("mean_ndcg") === 0.2)
    assert(m.getAs[Double]("mean_recall") === r4(0.6667 / 2))
    assert(m.getAs[Double]("mean_precision") === 0.2)
  }

  // ── beamSearchGraph ────────────────────────────────────────────────────

  test("beamSearchGraph: pinned hits@10 vs exact search at sf0.001 " +
      "(backs the graph_beam_recall floor), and guards fire") {
    val sf = "/root/testdata/sf0.001"
    // the gate query with its floor removed: per-query overlap between
    // beam top-10 and exact top-10
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val edges = graft.operators.SimilaritySearch.knnGraph(emb, "vec_id",
      "embedding", k = 8)
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id"), col("embedding"))
    val entries = emb.filter(col("vec_id") < 16).select(col("vec_id"))
    val beam = GraphOps.beamSearchGraph(emb, "vec_id", "embedding",
        edges, "src", "dst", queries, "vec_id", "embedding",
        entries, "vec_id", k = 11, beamWidth = 32, hops = 5)
      .filter(col("id") =!= col("query_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("score"), col("id").asc)
    val beamTop = beam.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 10).select(col("query_id"), col("id"))
    val exact = graft.operators.SimilaritySearch.knnGraphForSources(emb,
        "vec_id", "embedding", 10, queries, "vec_id")
      .select(col("src").as("query_id"), col("dst").as("id"))
    val hits = beamTop.join(exact, Seq("query_id", "id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(100L -> 10L, 101L -> 10L, 102L -> 10L,
      103L -> 10L, 104L -> 10L, 105L -> 10L, 106L -> 10L, 107L -> 9L,
      108L -> 10L, 109L -> 9L)
    assert(hits === expected)
    intercept[IllegalArgumentException] {
      GraphOps.beamSearchGraph(emb, "vec_id", "embedding", edges, "src",
        "dst", queries, "vec_id", "embedding", entries, "vec_id",
        k = 0, beamWidth = 1, hops = 1)
    }
  }

  // ── triangleStats ──────────────────────────────────────────────────────

  test("triangleStats: hand graph — triangle, pendant, triangle-free " +
      "cycle; duplicates/reversals/self-loops ignored") {
    // triangle {1,2,3}, pendant 4–1, square 5-6-7-8 (no triangle);
    // (2,1) duplicates the reversed edge, (3,3) is a self-loop.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 6L),
        (6L, 7L), (7L, 8L), (8L, 5L), (2L, 1L), (3L, 3L))
      .toDF("src", "dst")
    val got = GraphOps.triangleStats(e, "src", "dst").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 0.333333)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0)), 4L -> ((1L, 0L, 0.0)),
      5L -> ((2L, 0L, 0.0)), 6L -> ((2L, 0L, 0.0)),
      7L -> ((2L, 0L, 0.0)), 8L -> ((2L, 0L, 0.0))))
  }

  test("triangleStats: K4 — every node in 3 triangles, coefficient 1") {
    val nodes = (1L to 4L)
    val e = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = GraphOps.triangleStats(e, "src", "dst").collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getLong(1) === 3L && r.getLong(2) === 3L &&
        r.getDouble(3) === 1.0)
    }
  }

  test("triangleStats matches naive a<b<c enumeration on a random graph " +
      "and is partitioning-independent") {
    val rnd = new scala.util.Random(42)
    val e = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .toDF("src", "dst")
    val got = GraphOps.triangleStats(e, "src", "dst")
    // naive: canonical pairs joined three ways with a<b<c built in.
    val und = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val tri = und.as("e1")
      .join(und.as("e2"), col("e2.a") === col("e1.b"))
      .join(und.as("e3"), col("e3.a") === col("e1.a") &&
        col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val naive = tri.select(col("x").as("id"))
      .union(tri.select(col("y")))
      .union(tri.select(col("z")))
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotTri = got.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotTri.filter(_._2 > 0) === naive)
    val repart = GraphOps.triangleStats(e.repartition(7), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(repart === got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).sortBy(_._1))
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int = 12): Map[Long, Long] =
    GraphOps.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: K4 with a pendant tail — the 3-core is exactly the K4") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = k4 ++ Seq((3L, 4L), (4L, 5L)) // tail 3-4-5
    val got = core(edges, 3)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.toSet === Set(3L)) // within-core degree
  }

  test("kCore: simultaneous-removal semantics — a path fully peels, " +
      "a cycle fully survives at k=2") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(core(path, 2) === Map.empty)
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(core(cycle, 2) ===
      Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: duplicate edges, self-loops, and direction do not " +
      "change the core") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val noisy = cycle ++ cycle.map(_.swap) ++ Seq((1L, 1L), (2L, 2L))
    assert(core(noisy, 2) === core(cycle, 2))
  }

  test("kCore matches iterative-peeling reference on random graphs " +
      "and is partitioning-independent") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val edges = Seq.fill(40)(
        (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
        .filter { case (a, b) => a != b }
      val k = 2 + trial % 3
      // reference: sequential fixpoint peeling over an adjacency map
      var adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .distinct.groupBy(_._1).map { case (n, es) =>
          n -> es.map(_._2).toSet }
      var changed = true
      while (changed) {
        val doomed = adj.collect {
          case (n, nbs) if nbs.size < k => n }.toSet
        changed = doomed.nonEmpty
        adj = (adj -- doomed).map { case (n, nbs) =>
          n -> (nbs -- doomed) }
      }
      val expect = adj.map { case (n, nbs) => n -> nbs.size.toLong }
      assert(core(edges, k) === expect, s"trial $trial k=$k")
      val repart = GraphOps.kCore(edges.toDF("src", "dst")
          .repartition(7), "src", "dst", k, 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(repart === expect, s"repartition trial $trial")
    }
  }

  test("kCore bounded rounds: maxRounds = 1 returns the round-1 " +
      "survivor set (the oracle's unrolled contract)") {
    // path 0-1-2-3 at k=2: round 1 removes endpoints only
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = core(path, 2, rounds = 1)
    assert(got.keySet === Set(1L, 2L))
    // within-survivor degrees after the bounded peel: 1 each (not yet
    // a fixpoint — exactly what the audit query would surface)
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }
}
