package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-distribution drift detection between two corpus snapshots —
  * the data-quality monitor a continuously-ingesting pipeline needs: has
  * this week's crawl (or a new embedder version) shifted the embedding
  * distribution the indexes and dedup thresholds were tuned on? The
  * reference has no monitoring story at all (one-shot scripts); this is
  * the engine-native form of the standard population-stability-index
  * (PSI) check, applied to embeddings via a deterministic 1-D probe.
  *
  * Method: project every vector onto a fixed md5-parity ±1 probe axis
  * (the `Projection` sign convention — derived independently on every
  * executor AND by the DuckDB oracle), histogram the projection into
  * fixed-width bins, and compare snapshot histograms with smoothed
  * per-bin PSI contributions: (p_a − p_b)·ln(p_a / p_b) ≥ 0, large when
  * a bin's mass moved. Engine-portable numerics, same discipline as
  * `Dsir`: the projection is an IN-ORDER dot product (bit-identical
  * across engines — no reassociation anywhere), bins are exact
  * integers, and the only transcendental (one ln per bin) happens once
  * on driver-sized data, quantized to integer micro-nats.
  *
  * 100 TB posture: one typed-kernel pass per snapshot (sign row built
  * per partition, nothing on the wire) feeding a map-side-combinable
  * bin count — the exchange carries ≤ bins rows per task; the PSI table
  * itself is bins-sized driver work. Comparing week-over-week snapshots
  * never rescans more than the two snapshots' vector columns. */
object Drift {

  /** Exact two-sample Kolmogorov-Smirnov distance between two groups'
    * INTEGER-valued distributions — the nonparametric drift test
    * complementing [[psiReport]] (PSI needs binning; KS does not). On an
    * integer domain the statistic is exact rational arithmetic:
    * KS = max_v |c_a(v)·n_b − c_b(v)·n_a| / (n_a·n_b), with cumulative
    * counts over the merged value domain — every comparison happens in
    * cross-multiplied INTEGER space, and the single division at the end
    * is the only fp op (the [[EventAnalytics.linearTrend]] contract).
    *
    * Scale shape: one map-side-combinable count keyed by value, then
    * one window + max over DISTINCT VALUES — value-domain-sized, not
    * corpus-sized (doc lengths, scores: thousands of rows), so the
    * unpartitioned window is deliberate, same as trailingZScore's.
    * Output: one row (n_a, n_b, ks); null ks when either group is
    * empty — no silent zeros. */
  /** Pairwise centroid-cosine between segment embedding means — the
    * SEMANTIC drift monitor complementing the scalar PSI/KS/chi² legs:
    * a data source whose centroid swings away from its reference
    * segment has changed meaning even if every scalar feature looks
    * stable. Exactness discipline: components quantize to integer
    * micro-units IN-PLAN (one round per value — retry/partitioning
    * deterministic), per-(segment, dim) sums are exact BIGINTs, and
    * the pairwise algebra runs in BigInt on the collected
    * (segments × dim) sidecar — the only fp is the final
    * dot/(√n2a·√n2b) tree, one per pair, identical on any engine
    * replaying the same integers (centroid cosine = cosine of the raw
    * sums; the /n factors cancel). Scale shape: ONE map-side-combinable
    * (segment, dim) aggregation over the exploded corpus; everything
    * after is segments²-sized. */
  def centroidCosine(df: DataFrame, segCol: Column, vecCol: Column,
      scale: Long = 1000000L, maxSidecarRows: Int = 262144): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // a null segment would NPE the driver-side grouping — fail loudly
    // (the Isotonic.fit input discipline)
    val checkedSeg = when(segCol.isNotNull, segCol.cast("string"))
      .otherwise(raise_error(
        lit("Drift.centroidCosine: segment must not be NULL")))
    // ONE corpus pass: the per-(seg, dim) row count rides the same
    // aggregation, and n(seg) reads off the dim-0 group (every decoded
    // vector contributes exactly one dim-0 element; rows with a null
    // vector explode to nothing and are excluded from sums AND counts)
    // the collect is a (segments × dim) sidecar ONLY when segCol is a
    // genuine segment key; a mistaken data-grain key (doc_id) would pull
    // the corpus to the driver — cap the pull and fail loudly BEFORE
    // OOM (the Isotonic.fit cardinality-guard discipline)
    val rows = df
      .select(checkedSeg.as("seg"), posexplode(vecCol).as(Seq("pos", "v")))
      .select(col("seg"), col("pos"),
        round(col("v").cast("double") * scale).cast("long").as("qv"))
      .groupBy(col("seg"), col("pos"))
      .agg(sum(col("qv")).as("sv"), count(lit(1)).as("cnt"))
      .limit(maxSidecarRows + 1)
      .collect()
    require(rows.length <= maxSidecarRows,
      s"Drift.centroidCosine: over $maxSidecarRows (segment, dim) rows — " +
        "the segment column looks data-grained, not segment-grained")
    val sums = rows.groupBy(_.getAs[String]("seg"))
      .map { case (seg, rs) =>
        seg -> rs.map(r => r.getAs[Int]("pos") -> r.getAs[Long]("sv")).toMap
      }
    val counts = rows.filter(_.getAs[Int]("pos") == 0)
      .map(r => r.getAs[String]("seg") -> r.getAs[Long]("cnt")).toMap
    // UTF-8 byte order, not String.compareTo: pair ORIENTATION must
    // match the oracle's (and Spark's) binary '<' on the same strings
    // — see Utf8Order's scaladoc for the code-point range that diverges
    val segs = sums.keys.toSeq.sorted(graft.functions.Utf8Order.ordering)
    val out = segs.combinations(2).map { c =>
      val (a, b) = (c(0), c(1))
      val (sa, sb) = (sums(a), sums(b))
      val dims = (sa.keySet ++ sb.keySet).toSeq
      var dot = BigInt(0); var n2a = BigInt(0); var n2b = BigInt(0)
      dims.foreach { d =>
        val x = BigInt(sa.getOrElse(d, 0L))
        val y = BigInt(sb.getOrElse(d, 0L))
        dot += x * y; n2a += x * x; n2b += y * y
      }
      val cos =
        if (n2a == 0 || n2b == 0) 0.0
        else dot.toDouble /
          (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))
      (a, b, counts(a), counts(b), cos)
    }.toSeq
    out.toDF("seg_a", "seg_b", "n_a", "n_b", "cos_centroid")
  }

  def ksDistance(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, decimals: Int = 6): DataFrame = {
    val pts = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("da"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("db"))
    // explicit single-partition spec on the distinct-value sidecar:
    // same execution as the implied global window, no warning noise
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = pts.agg(sum(col("da")).as("n_a"), sum(col("db")).as("n_b"))
    pts
      .withColumn("ca", sum(col("da")).over(w))
      .withColumn("cb", sum(col("db")).over(w))
      .crossJoin(broadcast(tot))
      .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
        max(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))).as("_num"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          col("_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double")), decimals).as("ks"))
  }

  /** (bin INT, cnt LONG): histogram of floor(dot(v, sign_probe) ·
    * invWidth). The probe axis is column `probe` of the
    * `Projection.sign` matrix; the dot runs in index order so every
    * engine computes the identical double, making the floor exact. */
  def projectionHistogram(df: DataFrame, vecCol: String, dim: Int,
      probe: Int, invWidth: Int): DataFrame = {
    require(dim > 0 && invWidth > 0, "dim and invWidth must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df)
      .select(col(vecCol).cast("array<double>").as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val signs = Array.tabulate(dim)(i => Projection.sign(i, probe))
        it.map { v =>
          require(v.length == dim,
            s"projectionHistogram: row has dim ${v.length}, expected $dim")
          var f = 0.0
          var i = 0
          while (i < dim) { f += v(i) * signs(i); i += 1 }
          math.floor(f * invWidth).toInt
        }
      }
      .toDF("bin")
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Per-bin smoothed PSI contributions between two snapshot histograms,
    * in integer micro-nats: for each bin in either histogram,
    * p_x = (cnt_x + 1) / (n_x + nbins) (add-one smoothing over the UNION
    * bin set, so one-sided bins contribute finitely), psi_micro =
    * floor(1e6·(p_a − p_b)·ln(p_a / p_b) + 0.5). Output is bins-sized:
    * (bin, cnt_a, cnt_b, psi_micro), built on the driver BY DESIGN (two
    * ≤-bins-sized collects — model-sized work, not a data collect).
    * Σ psi_micro / 1e6 is the PSI; every term is ≥ 0, so any bin with
    * psi_micro above a threshold names WHERE the distribution moved.
    * Fails loudly on an empty snapshot (PSI of nothing is undefined —
    * a silent 0 would read as "no drift"). */
  def psiContributions(spark: SparkSession, histA: DataFrame,
      histB: DataFrame): DataFrame = {
    import spark.implicits._
    def collectHist(h: DataFrame): Map[Int, Long] =
      h.select(col("bin").cast("int"), col("cnt").cast("long"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val a = collectHist(histA)
    val b = collectHist(histB)
    val na = a.values.sum
    val nb = b.values.sum
    require(na > 0, "snapshot A is empty")
    require(nb > 0, "snapshot B is empty")
    val bins = (a.keySet ++ b.keySet).toSeq.sorted
    val nbins = bins.size
    bins.map { bin =>
      val ca = a.getOrElse(bin, 0L)
      val cb = b.getOrElse(bin, 0L)
      val pa = (ca + 1.0) / (na.toDouble + nbins)
      val pb = (cb + 1.0) / (nb.toDouble + nbins)
      val psi = math.floor(1e6 * ((pa - pb) * math.log(pa / pb)) + 0.5).toLong
      (bin, ca, cb, psi)
    }.toDF("bin", "cnt_a", "cnt_b", "psi_micro")
  }

  /** End-to-end drift report between two snapshots of a vector column. */
  def psiReport(snapA: DataFrame, snapB: DataFrame, vecCol: String,
      dim: Int, probe: Int = 0, invWidth: Int = 4): DataFrame =
    psiContributions(snapA.sparkSession,
      projectionHistogram(snapA, vecCol, dim, probe, invWidth),
      projectionHistogram(snapB, vecCol, dim, probe, invWidth))

  /** Pearson chi-square drift table between two snapshots of a
    * CATEGORICAL column (language mix, source mix, license tags) — the
    * third leg of the monitoring stack: [[psiReport]] for embeddings,
    * [[ksDistance]] for integer measures, this for category counts.
    * Emits one row per category with both observed counts, the expected
    * count under homogeneity, and each snapshot's chi-square
    * contribution (o−e)²/e — the per-category attribution IS the
    * actionable output ("pt fell, ru appeared"), not just the scalar.
    *
    * Numerics: counts and both totals are exact integers; every
    * expected value e = Tsnap·(o_a+o_b)/N is exact integer arithmetic
    * into ONE fp division, and each contribution is the identical
    * 4-op double tree in both engines ([[ksDistance]] discipline). No
    * cross-row fp sum exists in the gate output; the scalar statistic
    * (for threshold alerting) is exposed by [[chiSquareStat]], which
    * folds the contributions in category order — a defined-order sum
    * over a categories-sized frame.
    *
    * Scale: one map-side-combinable count per snapshot keyed by
    * category; everything after is categories-sized. Zero-count
    * categories (present in only one snapshot) contribute their full
    * expected mass — the "new language appeared" alarm. */
  def categoricalDrift(cur: DataFrame, ref: DataFrame, catCol: String,
      decimals: Int = 6): DataFrame = {
    val counts = cur.select(col(catCol).as("category"), lit(1L).as("_a"),
        lit(0L).as("_b"))
      .union(ref.select(col(catCol).as("category"), lit(0L).as("_a"),
        lit(1L).as("_b")))
      .groupBy("category")
      .agg(sum(col("_a")).as("n_cur"), sum(col("_b")).as("n_ref"))
    // an EMPTY snapshot makes every expected value 0 and the
    // contributions NaN/Infinity — fail loudly like psiContributions
    // does (drift against nothing is undefined, and a NaN row would
    // poison any downstream threshold silently). The when() also traps
    // the both-empty case, where the sums are NULL.
    val tot = counts.agg(sum(col("n_cur")).as("t_cur"),
        sum(col("n_ref")).as("t_ref"))
      .select(
        when(col("t_cur") > 0 && col("t_ref") > 0, col("t_cur"))
          .otherwise(raise_error(lit(
            "categoricalDrift: a snapshot is empty"))).as("t_cur"),
        col("t_ref"))
    def contrib(o: Column, tSnap: Column): Column = {
      // e = tSnap·rowTotal/N: integer product, one division.
      val e = (tSnap * (col("n_cur") + col("n_ref"))).cast("double") /
        (col("t_cur") + col("t_ref")).cast("double")
      round((o.cast("double") - e) * (o.cast("double") - e) / e, decimals)
    }
    counts.crossJoin(broadcast(tot))
      .select(col("category"), col("n_cur"), col("n_ref"),
        round((col("t_cur") * (col("n_cur") + col("n_ref"))).cast("double") /
          (col("t_cur") + col("t_ref")).cast("double"), decimals)
          .as("e_cur"),
        contrib(col("n_cur"), col("t_cur")).as("contrib_cur"),
        contrib(col("n_ref"), col("t_ref")).as("contrib_ref"))
  }

  /** Scalar chi-square statistic over a [[categoricalDrift]] table:
    * category-ordered in-row fold (defined addition order), df =
    * categories − 1. One row: (n_categories, df, chi2). */
  def chiSquareStat(drift: DataFrame, decimals: Int = 6): DataFrame =
    drift
      .agg(sort_array(collect_list(struct(col("category"),
        (col("contrib_cur") + col("contrib_ref")).as("c")))).as("_cs"))
      .select(size(col("_cs")).cast("long").as("n_categories"),
        (size(col("_cs")) - 1).cast("long").as("df"),
        round(aggregate(col("_cs"), lit(0.0), (acc, x) =>
          acc + x.getField("c")), decimals).as("chi2"))
}
