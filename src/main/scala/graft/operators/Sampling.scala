package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here derives from a content hash, never from `rand()`:
  *  - re-runs, task retries, and different cluster layouts produce the
  *    SAME split (a training pipeline must never leak val rows into train
  *    because a stage got recomputed);
  *  - the split is reproducible from the data alone — no seed files, no
  *    persisted row tags;
  *  - md5 is available in every engine, so splits taken here agree with
  *    splits audited elsewhere (the DuckDB oracles check exactly that).
  *
  * The hash space is the first two hex chars of md5 → 256 buckets; split
  * fractions quantize to 1/256 (±0.4%), which is the documented contract
  * (at training scale the per-bucket population is millions of rows, so
  * the quantization is the only error — there is no sampling variance).
  */
object Sampling {

  /** 256-bucket deterministic bucket id from the row's key content. */
  def hashBucket(key: Column): Column = substring(md5(key), 1, 2)

  /** Every operator here that adds working/output columns guards them:
    * `withColumn` silently REPLACES an existing column, so a caller's
    * own `_rk`/`split`/… would be overwritten and (for working columns)
    * then dropped — data loss with no error. */
  private def requireFresh(df: DataFrame, op: String,
      cols: String*): Unit =
    cols.foreach(c => require(!df.columns.contains(c),
      s"$op writes column '$c' — the input already has one"))

  /** The bucket as an INT in [0, 256) — thresholds compare numerically.
    * (A lexicographic compare against a formatted hex threshold breaks at
    * frac = 1.0, where round(256) formats as the 3-char '100' and the
    * 2-char-vs-3-char string compare is almost always false — silently
    * emptying the val split of hashSplit(0.9, 0.1) and keeping ~6.6% for
    * deterministicSample(_, 1.0).) */
  private def bucketInt(key: Column): Column =
    conv(hashBucket(key), 16, 10).cast("int")

  private def threshold(frac: Double): Int =
    math.round(frac * 256).toInt.min(256).max(0)

  /** Add a `fold` column ∈ [0, k): deterministic k-fold assignment for
    * cross-validation, keyed on content like [[hashSplit]] — identical
    * keys always share a fold, so exact duplicates can never straddle a
    * train/eval boundary, and re-runs reproduce every fold bit-for-bit.
    * Uses 4 md5 hex chars (65536 buckets) so fold sizes stay within
    * ~1/256 of uniform for any k ≤ ~100. */
  def kFold(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 256, s"k must be in [2, 256], got $k")
    requireFresh(df, "kFold", "fold")
    df.withColumn("fold",
      pmod(conv(substring(md5(key), 1, 4), 16, 10).cast("int"), lit(k)))
  }

  /** Add a `split` column ∈ {train, val, test}: trainFrac/valFrac quantized
    * to 1/256; the remainder is test. Keyed on `key` (typically the text or
    * a stable id) so identical content always lands in the same split —
    * which also means exact duplicates can never straddle train/val. */
  def hashSplit(df: DataFrame, key: Column, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to at most 1")
    requireFresh(df, "hashSplit", "split")
    val b = bucketInt(key)
    df.withColumn("split",
      when(b < lit(threshold(trainFrac)), "train")
        .when(b < lit(threshold(trainFrac + valFrac)), "val")
        .otherwise(lit("test")))
  }

  /** Leakage-safe train/val/test split: the split UNIT is the near-dup
    * CLUSTER, not the document — a near-duplicate pair straddling
    * train/test silently leaks evaluation data into training, the
    * classic corpus-split bug (`hashSplit` on text only protects EXACT
    * duplicates). Pair generator → `Dedup.connectedComponents` labels →
    * every member splits by its component's min-id key; documents in no
    * pair key by their own id. Rides the audited CC plan ((long, long)
    * label rows only) plus one broadcast-able label join; the split
    * itself stays the content-hash `hashSplit`, so it is deterministic
    * across retries and engines. The no-straddle guarantee is exact for
    * ANY pair generator — `split_leakage_safe` gates it with a 0-row
    * oracle. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(!docs.columns.contains("split") &&
      !docs.columns.contains("_group_key"),
      "leakageSafeSplit writes 'split' and '_group_key' — input already " +
        "has one of them")
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as("_cc_id"), col("comp").as("_cc_comp"))
    val keyed = docs
      .join(labels, docs(idCol).cast("long") === col("_cc_id"), "left")
      .withColumn("_group_key",
        coalesce(col("_cc_comp"), docs(idCol).cast("long")))
      .drop("_cc_id", "_cc_comp")
    hashSplit(keyed, col("_group_key").cast("string"), trainFrac, valFrac)
      .drop("_group_key")
  }

  /** UniMax-style language-balanced token-budget allocation (Chung et
    * al. 2023, public algorithm): split a total token `budget` across
    * groups as uniformly as possible, capping every group at
    * `maxEpochs` × its corpus tokens and redistributing the capped
    * surplus among the rest. Groups are processed in ASCENDING corpus
    * size (ties by group name): each takes
    * min(maxEpochs · tokens, remaining / groupsLeft) — small languages
    * hit the epoch cap, large ones end up share-bound. All arithmetic
    * is integer (Long floor division), so the allocation is
    * bit-reproducible across engines — the DuckDB oracle replays the
    * same loop as a recursive CTE.
    *
    * Scale: one map-side-combinable aggregation to one row per group;
    * the collect is a bounded sidecar (languages/sources, not data) and
    * the sequential loop is O(groups) on the driver — capped at
    * `maxGroups` so a mistakenly data-grained `groupCol` (doc_id) fails
    * loudly BEFORE pulling the corpus to the driver (the
    * Drift/KmvSketch cardinality-guard discipline). Output: one row
    * per group — (groupCol, tokens, alloc). `alloc > tokens` means the
    * group upsamples (epochs > 1); pair with [[tokenBudgetSampleBy]]
    * for the ≤ 1-epoch admission side. */
  def unimaxAllocation(df: DataFrame, groupCol: String, tokensCol: Column,
      budget: Long, maxEpochs: Int, maxGroups: Int = 65536): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df.groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(coalesce(sum(tokensCol).cast("long"), lit(0L)).as("tokens"))
      .limit(maxGroups + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (g, tok) => (tok, g) }
    require(totals.length <= maxGroups,
      s"Sampling.unimaxAllocation: over $maxGroups groups — the group " +
        "column looks data-grained, not segment-grained")
    val n = totals.length
    var rem = budget
    val rows = totals.zipWithIndex.map { case ((g, tok), i) =>
      val cap = if (tok > Long.MaxValue / maxEpochs) Long.MaxValue
                else tok * maxEpochs
      val a = math.min(cap, rem / (n - i))
      rem -= a
      (g, tok, a)
    }
    rows.toSeq.toDF(groupCol, "tokens", "alloc")
  }

  /** Per-group-budget form of [[tokenBudgetSample]]: each group admits
    * rows in md5(key) order while its running token total stays within
    * ITS budget from the `budgets` frame — the apply side of
    * [[unimaxAllocation]]. `budgets` must hold one row per group with an
    * `alloc` column (duplicate group keys would multiply rows); it is
    * allocation-sized, so it broadcasts. Groups absent from `budgets`
    * are dropped (budget 0); a budget ≥ the group's tokens admits the
    * whole group. */
  def tokenBudgetSampleBy(df: DataFrame, groupCol: String, key: Column,
      tokensCol: Column, budgets: DataFrame): DataFrame = {
    require(budgets.columns.contains(groupCol) &&
      budgets.columns.contains("alloc"),
      s"budgets must have columns '$groupCol' and 'alloc'")
    Seq("_cum", "_alloc").foreach { c =>
      require(!df.columns.contains(c),
        s"tokenBudgetSampleBy: input already has reserved column '$c'")
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(md5(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(tokensCol).over(w))
      .join(broadcast(budgets.select(col(groupCol),
        col("alloc").as("_alloc"))), Seq(groupCol))
      .filter(col("_cum") <= col("_alloc"))
      .drop("_cum", "_alloc")
  }

  /** Keep a deterministic ~`frac` of rows (quantized to 1/256), keyed on
    * content. One narrow filter — no shuffle, no state. */
  def deterministicSample(df: DataFrame, key: Column,
      frac: Double): DataFrame =
    df.filter(bucketInt(key) < lit(threshold(frac)))

  /** Exact integer square root (Newton), any magnitude. */
  private[graft] def isqrt(x: BigInt): BigInt = {
    require(x >= 0, "isqrt of negative")
    if (x < 2) x
    else {
      var s = BigInt(1) << ((x.bitLength + 1) / 2)
      var t = (s + x / s) >> 1
      while (t < s) { s = t; t = (s + x / s) >> 1 }
      s
    }
  }

  /** Temperature-balanced budget allocation at τ = 2 (weights ∝
    * tokens^(1/2)) — the square-root flattening between proportional
    * (τ=1) and uniform (τ→∞) mixing, the standard multilingual
    * rebalancing knob. The whole computation is EXACT integer
    * arithmetic so any engine reproduces it bit-for-bit: weights are
    * isqrt(tokens · 10^(2·precisionDigits)) (an integer carrying
    * `precisionDigits` fractional digits of √tokens), base shares are
    * floor(budget·w/Σw), and the floor leftover is apportioned by
    * largest remainder (ties → group name asc) — Hamilton's method, so
    * Σ alloc = budget exactly whenever any group has tokens. Groups
    * with zero tokens get zero (they hold no mass to sample).
    *
    * Same scale shape as [[unimaxAllocation]]: one map-side-combinable
    * aggregation to a bounded per-group sidecar (`maxGroups`-capped
    * with a loud failure, same discipline), O(groups) driver loop,
    * BigInt internally (no overflow at any corpus size). Output:
    * (groupCol, tokens, alloc); pair with [[tokenBudgetSampleBy]]. */
  def sqrtTemperatureAllocation(df: DataFrame, groupCol: String,
      tokensCol: Column, budget: Long,
      precisionDigits: Int = 8, maxGroups: Int = 65536): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(precisionDigits >= 0 && precisionDigits <= 18,
      "precisionDigits must be in [0, 18]")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df.groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(coalesce(sum(tokensCol).cast("long"), lit(0L)).as("tokens"))
      .limit(maxGroups + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(totals.length <= maxGroups,
      s"Sampling.sqrtTemperatureAllocation: over $maxGroups groups — " +
        "the group column looks data-grained, not segment-grained")
    val prec = BigInt(10).pow(2 * precisionDigits)
    val weights = totals.map { case (g, tok) =>
      (g, tok, isqrt(BigInt(tok) * prec))
    }
    val z = weights.map(_._3).sum
    val rows =
      if (z == 0) weights.map { case (g, tok, _) => (g, tok, 0L) }
      else {
        val based = weights.map { case (g, tok, w) =>
          val num = BigInt(budget) * w
          (g, tok, num / z, num % z)
        }
        val leftover = (budget - based.map(_._3).sum).toLong
        // +1 to the `leftover` eligible groups with the largest floor
        // remainders (never to zero-weight groups — no mass to sample).
        val bonus = based.filter { case (g, tok, _, _) => tok > 0 }
          .sortBy { case (g, _, _, rem) => (-rem, g) }
          .take(leftover.toInt).map(_._1).toSet
        based.map { case (g, tok, base, _) =>
          (g, tok, base.toLong + (if (bonus(g)) 1L else 0L))
        }
      }
    rows.toSeq.toDF(groupCol, "tokens", "alloc")
  }

  /** Freshness-decayed deterministic thinning: a row of age `a` days at
    * `anchorDate` survives with probability 2^(-floor(a / halflifeDays))
    * — full retention inside the first half-life window, then halving
    * per window. The survival test is the usual content-hash admission
    * (first 5 md5 hex chars, a 20-bit bucket, compared against the
    * power-of-two threshold as an equal-length hex string), so re-runs,
    * retries, and other engines keep the exact same rows. The decay
    * exponent is floor-bucketed INTEGER arithmetic — no pow(), whose
    * last-ulp behavior differs across engines. Negative ages (rows
    * newer than the anchor) are kept; NULL or unparseable timestamps
    * fail LOUDLY (a row whose age cannot be computed must not silently
    * vanish). One narrow filter — no shuffle. */
  def freshnessSample(df: DataFrame, key: Column, tsCol: Column,
      anchorDate: String, halflifeDays: Int,
      maxShift: Int = 20): DataFrame = {
    require(halflifeDays >= 1, "halflifeDays must be >= 1")
    require(maxShift >= 1 && maxShift <= 20, "maxShift must be in [1, 20]")
    // a NULL/unparseable timestamp makes every admission branch NULL and
    // the filter would drop the row SILENTLY — inconsistent with the
    // loud-failure contract the weight-driven samplers keep, so fail
    // with the offending value instead
    val age0 = datediff(lit(anchorDate), to_date(tsCol))
    val age = when(age0.isNotNull, age0).otherwise(raise_error(concat(
      lit("freshnessSample: NULL or unparseable timestamp "),
      coalesce(tsCol.cast("string"), lit("NULL")))))
    val shift = least(greatest(
        floor(age / lit(halflifeDays)).cast("int"), lit(0)),
      lit(maxShift))
    // thresholds as 5-char lowercase hex: 2^(20-k); k=0 admits all
    // (2^20 needs 6 digits, so it is its own branch, not a compare).
    val hex5 = (k: Int) =>
      String.format("%05x", Long.box(1L << (20 - k)))
    val admitted = (1 to maxShift).foldLeft(
      when(shift === 0, lit(true))) { (acc, k) =>
      acc.when(shift === k, substring(md5(key), 1, 5) < lit(hex5(k)))
    }
    df.filter(admitted)
  }

  /** Deterministic source-mixing resample — the data-mixing step of a
    * pretraining pipeline ("wiki ×2.5, common-crawl ×0.25"): each row of
    * group g appears floor(w_g) times, plus once more with probability
    * frac(w_g) quantized to 1/256 and keyed on content hash (same
    * determinism contract as hashSplit: re-runs, retries and other
    * engines reproduce the exact row multiset). Pure narrow ops — a
    * per-row copies expression and one explode; no shuffle, no state.
    * Downsampling is the w < 1 case (floor 0 + fractional keep);
    * `copy_id` (1-based) distinguishes the duplicates downstream. */
  def weightedMix(df: DataFrame, groupCol: String, key: Column,
      weights: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0),
      "weights must be non-negative")
    weightedMixByCol(df, key,
      coalesce(element_at(typedLit(weights), col(groupCol)), lit(default)))
  }

  /** [[weightedMix]] with a per-ROW weight expression instead of a static
    * per-group map — e.g. upsample by a quality score ("weight =
    * min(3, quality·2)"). Same contract: floor(w) guaranteed copies plus
    * one more with probability frac(w) quantized to 1/256, keyed on the
    * content hash — deterministic across runs, retries, and engines.
    * Negative, null, or NaN weights are a caller bug and fail the query
    * loudly (NaN needs its own check: Spark orders NaN above every
    * number, so `w >= 0` alone would wave it through as ~1 copy). */
  def weightedMixByCol(df: DataFrame, key: Column, w: Column): DataFrame = {
    requireFresh(df, "weightedMixByCol", "copy_id")
    val wchk = when(w >= 0 && !isnan(w), w).otherwise(raise_error(
      concat(lit("weightedMixByCol: negative, null, or NaN weight "),
        coalesce(w.cast("string"), lit("NULL")))))
    val copies = (floor(wchk).cast("int") +
      when(bucketInt(key) < round((wchk - floor(wchk)) * 256), 1).otherwise(0))
    // sequence(1, 0) would generate the DESCENDING [1, 0] — guard the
    // zero-copies case with an explicit empty array so explode drops it.
    df.withColumn("copy_id",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Exactly `n` rows per group, chosen by hash order (deterministic
    * reservoir): one shuffle on the group key; rank by md5(key) so the
    * choice is stable across runs and machines. */
  def perGroupSample(df: DataFrame, groupCol: String, key: Column,
      n: Int): DataFrame = {
    requireFresh(df, "perGroupSample", "_rk")
    val w = Window.partitionBy(col(groupCol)).orderBy(md5(key), key)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Per-group token-budget cap — "take at most `budget` tokens from each
    * source", the data-mixing primitive that bounds a dominant source by
    * VOLUME rather than document count. Rows are admitted in md5(key)
    * order (deterministic across runs/engines) while the group's running
    * token total stays within budget; the first row that would overflow is
    * dropped, along with everything after it in hash order. A document
    * larger than the whole budget can therefore never enter. One shuffle
    * keyed on the group; the running sum is a per-group window, so skew
    * concentrates in the biggest source — at corpus scale cap per
    * (source, shard-of-hash) and budget/shards per shard instead. */
  def tokenBudgetSample(df: DataFrame, groupCol: String, key: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    requireFresh(df, "tokenBudgetSample", "_cum")
    val w = Window.partitionBy(col(groupCol)).orderBy(md5(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(tokensCol).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** EXACT-proportion stratified split: within every stratum, precisely
    * floor(n_stratum · trainFrac) rows go to train (the rest to test),
    * chosen by md5 hash order so the choice is deterministic across runs,
    * retries, and engines. The floor is evaluated in IEEE-double
    * arithmetic (so every engine reproduces it bit-for-bit); for
    * non-representable fractions it can sit one below the rational floor
    * at exact-integer products (e.g. 10 · 0.7 → 6.99…9 → 6) — the
    * cross-engine determinism is the contract, the rational value is not. This is the eval-set form of hashSplit: when
    * strata are small (per-language or per-source eval slices), hashSplit's
    * ±0.4% binomial scatter can leave a rare stratum with zero test rows —
    * here the per-stratum proportion is exact by construction.
    *
    * Scale: one shuffle keyed on the stratum (a window per stratum, NOT a
    * global window); a pathologically dominant stratum serializes into one
    * task — for corpus-sized strata use hashSplit, whose quantized
    * proportions are indistinguishable at that population. */
  def stratifiedSplit(df: DataFrame, strataCol: String, key: Column,
      trainFrac: Double = 0.8): DataFrame = {
    require(trainFrac >= 0 && trainFrac <= 1.0, "trainFrac must be in [0,1]")
    requireFresh(df, "stratifiedSplit", "split", "_rk", "_n")
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(key), key)
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(strataCol))))
      .withColumn("split",
        when(col("_rk") <= floor(col("_n") * lit(trainFrac)), "train")
          .otherwise(lit("test")))
      .drop("_rk", "_n")
  }

  /** Weighted sampling WITHOUT replacement, deterministic: exactly `n`
    * rows per group, inclusion probability ∝ weight, via
    * Efraimidis–Spirakis priorities (public algorithm) — priority =
    * u^(1/w) with u a content-keyed uniform in (0, 1], keep the top-n
    * priorities per group. Where `perGroupSample` treats every row
    * equally, this is the curation form: upweight high-quality docs in
    * the eval slice without a second pass.
    *
    * Determinism across engines AND retries: u derives from md5(key)
    * (48 hash bits → exact in a double), never rand(); the RANK compares
    * priorities ROUNDED to 6 decimals (tie → key) so both engines order
    * identical values and a last-ulp pow() divergence cannot flip the
    * sample (same rounded-boundary discipline as a_outliers). One
    * group-keyed window shuffle carrying (group, key-hash, weight).
    * Weights must be > 0 — null/NaN/0 fail loudly (a weight that failed
    * to compute must not silently become "never sampled"). */
  def weightedPrioritySample(df: DataFrame, groupCol: String, key: Column,
      w: Column, n: Int): DataFrame = {
    // 'priority' is part of the output contract; '_rk' is internal —
    // either pre-existing on the input would be silently overwritten
    Seq("priority", "_rk").foreach { c =>
      require(!df.columns.contains(c),
        s"weightedPrioritySample: input already has a '$c' column " +
          "(reserved for the sample's working/output columns)")
    }
    // 12 hex chars = 48 bits; (v + 1) / (2^48 + 1) ∈ (0, 1] exactly
    val u = (conv(substring(md5(key), 1, 12), 16, 10).cast("double") + 1.0) /
      lit(281474976710657.0)
    val priority = when(w.isNotNull && !isnan(w) && w > 0,
        round(pow(u, lit(1.0) / w), 6))
      .otherwise(raise_error(concat(
        lit("weightedPrioritySample: weight must be > 0, got "),
        coalesce(w.cast("string"), lit("NULL")))))
    val win = Window.partitionBy(col(groupCol))
      .orderBy(desc("priority"), key)
    df.withColumn("priority", priority)
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Round-robin source interleaving: assign every row a global shard
    * position such that the first |sources| positions hold one row of
    * each source, the next |sources| the second of each, … — the
    * training-mix assembly that keeps any prefix of the shard balanced
    * across sources (a sorted-by-source layout would train on one
    * source for hours before seeing the next).
    *
    * pos = (rank_in_source − 1)·S + source_index, with rank ordered by
    * `idCol` and source_index the source's alphabetical rank — pure
    * arithmetic, collision-free, no global window. Scale shape: one
    * source-keyed rank window + a broadcast join against the distinct-
    * source sidecar frame (S and the index both come from that tiny
    * frame — nothing collects to the driver). Output: (pos, source,
    * id) — callers range-partition on pos to write shards. */
  def interleaveRoundRobin(df: DataFrame, sourceCol: String,
      idCol: String): DataFrame = {
    // the select below narrows to (sourceCol, idCol), so only a NAME
    // COLLISION with a working/output column can corrupt the result
    Seq("_rk", "_si", "_ns", "pos").foreach(c =>
      require(sourceCol != c && idCol != c,
        s"interleaveRoundRobin reserves column name '$c'"))
    // the distinct-source frame is small by definition (a corpus has
    // dozens of sources, not millions); the unpartitioned window runs
    // over that sidecar only, never over data.
    val srcs = df.select(col(sourceCol)).distinct()
      .withColumn("_si",
        // partitionBy(lit(1)): same single-partition execution the
        // global window already implied, but EXPLICIT — silences the
        // WindowExec no-partition warning on this sidecar-sized frame
        row_number().over(
          Window.partitionBy(lit(1)).orderBy(col(sourceCol))) - 1)
      .withColumn("_ns", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    df.select(col(sourceCol), col(idCol))
      .withColumn("_rk", row_number().over(w))
      .join(broadcast(srcs), Seq(sourceCol))
      .select(((col("_rk") - 1).cast("long") * col("_ns") + col("_si"))
        .as("pos"), col(sourceCol), col(idCol))
  }
}
