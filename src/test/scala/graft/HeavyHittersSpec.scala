package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(k: Int) = new HeavyHitters.MisraGries(k)

  test("MG guarantee: every item with count > n/(k+1) is in the summary, " +
      "and estimates undercount by at most n/(k+1)") {
    val rnd = new scala.util.Random(7)
    // adversarial-ish stream: two genuine heavies drowned in noise
    val stream = (Seq.fill(400)("heavy1") ++ Seq.fill(250)("heavy2") ++
      Seq.fill(1000)(s"noise${rnd.nextInt(500)}"))
    val shuffled = rnd.shuffle(stream)
    val n = shuffled.size
    val k = 8
    val agg = mg(k)
    val summary = shuffled.foldLeft(agg.zero)(agg.reduce)
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = n.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound)
        assert(summary.contains(item), s"guaranteed heavy $item missing")
    }
    summary.foreach { case (item, est) =>
      val c = exact(item)
      assert(est <= c && c - est <= bound,
        s"$item est=$est exact=$c bound=$bound")
    }
    assert(summary.size <= k)
  }

  test("MG merge preserves the guarantee (mergeable-summaries law)") {
    val rnd = new scala.util.Random(11)
    val stream = (Seq.fill(300)("big") ++
      Seq.fill(900)(s"n${rnd.nextInt(300)}"))
    val shuffled = rnd.shuffle(stream)
    val k = 8
    val agg = mg(k)
    // split into 4 'partitions', reduce each, merge pairwise
    val parts = shuffled.grouped((shuffled.size + 3) / 4).toSeq
    val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val bound = shuffled.size.toDouble / (k + 1)
    val exactBig = shuffled.count(_ == "big").toLong
    assert(exactBig > bound, "fixture: big must be guaranteed")
    assert(merged.contains("big"))
    assert(merged.size <= k)
    merged.foreach { case (item, est) =>
      val c = shuffled.count(_ == item).toLong
      assert(est <= c && c - est <= bound)
    }
  }

  test("frequentItems: deterministic {count > n/k} set with exact counts, " +
      "invariant to partitioning") {
    val rows = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      (0 until 120).map(i => s"tail$i"))
    val expected = {
      val n = rows.size
      rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 8 > n }.toMap
    }
    assert(expected.keySet === Set("alpha", "beta"), "fixture drifted")
    for (parts <- Seq(1, 3, 7)) {
      val df = spark.createDataset(rows).toDF("item").repartition(parts)
      val got = HeavyHitters.frequentItems(df, "item", k = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, s"partitions=$parts")
    }
  }

  test("frequentItems: empty input and all-unique input both yield no rows") {
    val empty = spark.emptyDataset[String].toDF("item")
    assert(HeavyHitters.frequentItems(empty, "item", 4).count() === 0L)
    val uniq = spark.createDataset((0 until 50).map(i => s"u$i")).toDF("item")
    assert(HeavyHitters.frequentItems(uniq, "item", 4).count() === 0L)
  }
}
