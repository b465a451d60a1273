package graft

import graft.operators.RetrievalMetrics
import org.apache.spark.sql.functions._

/** Rank-biased overlap: identical/disjoint/known-swap hand cases against
  * an independent driver-side replay of the rational weight table,
  * zero-agreement queries still emit rows, guards fire, and the result
  * is partitioning-invariant. The gate query `eval_rbo_matryoshka`
  * value-checks the full pipeline against DuckDB at sf0.01. */
class RboSpec extends SparkSpec {

  import spark.implicits._

  private val K = 10

  /** Independent replay: rbo_micro = Σ_d round(1e6·ov(d)·wNum/wDen). */
  private def expectedMicro(ms: Seq[Int]): Long =
    (1 to K).map { d =>
      val ov = ms.count(_ <= d).toLong
      val wNum = BigInt(9).pow(d - 1).toLong // (10-9)·9^(d-1)
      val wDen = BigInt(10).pow(d).toLong * d
      BigDecimal((ov * wNum).toDouble / wDen * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum

  private def ranking(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("qid", "id", "rank")

  private def rbo(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)]) =
    RetrievalMetrics.rboAtK(ranking(a), ranking(b), "qid", "id", "rank", K)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("identical rankings score 1−p^k (micro-rounded); disjoint " +
      "rankings score 0 but still emit a row") {
    val idsA = (1 to K).map(r => (0L, r.toLong, r))
    val idsB = (1 to K).map(r => (0L, (100 + r).toLong, r))
    val out = rbo(idsA ++ idsB.map { case (_, id, r) => (1L, id, r) },
      idsA ++ idsB.map { case (_, id, r) => (1L, id, r) }
        .map { case (q, id, r) => (q, id, r) })
    assert(out(0L) === ((K.toLong, expectedMicro((1 to K).map(d => d)))))
    // ~0.651321 at p = 0.9, k = 10
    assert(math.abs(out(0L)._2 - 651322L) <= K)
    val disjoint = rbo(idsA, idsB)
    assert(disjoint(0L) === ((0L, 0L)))
  }

  test("a swap of ranks 1 and 2 on one side costs only the depth-1 " +
      "term (hand case)") {
    val a = (1 to K).map(r => (0L, r.toLong, r))
    val swapped = a.map {
      case (q, id, 1) => (q, 2L, 1)
      case (q, id, 2) => (q, 1L, 2)
      case x => x
    }
    val out = rbo(a, swapped)
    // common ids with m = max(ra, rb): ids 1 and 2 both have m = 2,
    // everything else m = d
    val ms = Seq(2, 2) ++ (3 to K)
    assert(out(0L) === ((K.toLong, expectedMicro(ms))))
    assert(out(0L)._2 < expectedMicro((1 to K)))
  }

  test("rows beyond k are ignored and the result is " +
      "partitioning-invariant") {
    val a = (1 to 15).map(r => (0L, r.toLong, r))
    val b = (1 to 15).map(r => (0L, (if (r <= 5) r else 50 + r).toLong, r))
    val plain = RetrievalMetrics.rboAtK(ranking(a), ranking(b),
      "qid", "id", "rank", K).collect().toSet
    val parts = RetrievalMetrics.rboAtK(ranking(a).repartition(7),
      ranking(b).repartition(3), "qid", "id", "rank", K).collect().toSet
    assert(plain === parts)
    val (_, ovAndMicro) = plain.head.getLong(0) -> plain.head
    assert(ovAndMicro.getLong(1) === 5L)
    assert(ovAndMicro.getLong(2) === expectedMicro(1 to 5))
  }

  test("the long-overflow guard fires loudly") {
    val a = ranking(Seq((0L, 1L, 1)))
    intercept[IllegalArgumentException] {
      RetrievalMetrics.rboAtK(a, a, "qid", "id", "rank", k = 25)
    }
  }
}
