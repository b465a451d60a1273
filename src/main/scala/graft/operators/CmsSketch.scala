package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch heavy-hitter estimation — the third member of the
  * engine's bounded-memory sketch family (HLL++ distinct counts, GK
  * quantiles, CMS frequencies). One aggregation pass builds a fixed-size
  * sketch (depth × width counters, independent of cardinality); point
  * estimates then answer "how often does term X occur?" without a
  * per-term shuffle. CMS guarantees are one-sided and auditable:
  * estimate ≥ true count ALWAYS, and ≤ true count + ε·N with confidence
  * 1−δ — `estimateFor` exposes both so the gate can check them as a
  * value contract (query `vocab_cms_audit`). */
object CmsSketch {

  /** Build a CMS over a string column in one pass (deterministic seed →
    * replayable estimates). */
  def build(df: DataFrame, column: Column, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = df.select(
        count_min_sketch(column, lit(eps), lit(confidence), lit(seed))
          .as("cms"))
      .first().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Point estimates for a set of items (driver-side reads of the
    * broadcast-sized sketch). */
  def estimateFor(cms: CountMinSketch, items: Seq[String]): Map[String, Long] =
    items.map(t => t -> cms.estimateCount(t)).toMap
}
