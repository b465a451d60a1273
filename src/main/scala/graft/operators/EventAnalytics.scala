package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequential / cohort analytics over an event stream — the classic OLAP
  * companions to the engine's windowed aggregations (events_hourly /
  * events_sessionize). Both operators reduce to per-user aggregations and
  * tiny result tables, so their scale shape is "shuffle keyed by user_id,
  * then counts": no event-level data ever converges on the driver.
  */
object EventAnalytics {

  /** Ordered funnel: how many users reached stage i by performing
    * `stages(0)`, then `stages(1)` STRICTLY LATER, and so on. One
    * conditional-aggregation pass per user computes the earliest
    * qualifying timestamp of each stage (min(ts of stage i after the
    * stage-i−1 timestamp)); a user counts toward stage i only if the
    * whole chain is non-null. Implementation: one groupBy(user) with a
    * per-stage chained min — stage timestamps are columns of ONE
    * aggregated row per user, so the sequential dependency costs one
    * shuffle total, not one per stage.
    *
    * Returns (stage INT, stage_name STRING, users BIGINT), stages
    * 1-indexed, monotonically non-increasing in `users`. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // t1: earliest first-stage event per user (one event-scale shuffle).
    var chain = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("t1"))
    // t_i: earliest stage-i event AFTER t_{i-1}. The stage's global min
    // per user is not enough — the qualifying min depends on the
    // previous timestamp — so each later stage re-aggregates its events
    // constrained by the (tiny, one-row-per-user) chain frame; AQE
    // broadcasts the chain side. LEFT joins keep users who stalled at an
    // earlier stage counted there.
    for ((stage, idx) <- stages.tail.zipWithIndex) {
      val i = idx + 2
      val prevT = s"t${i - 1}"
      val qualified = events.filter(col(typeCol) === stage)
        .join(chain.select(col("u").as("_u"), col(prevT)),
          events(userCol) === col("_u") && col(tsCol) > col(prevT))
        .groupBy(col("_u").as("u2"))
        .agg(min(col(tsCol)).as(s"t$i"))
      chain = chain.join(qualified, chain("u") === qualified("u2"), "left")
        .drop("u2")
    }
    // one action over the per-user chain: non-null t_i = reached stage i.
    val aggs = (1 to stages.length).map(s => count(col(s"t$s")).as(s"c$s"))
    val row = chain.agg(aggs.head, aggs.tail: _*).first()
    (1 to stages.length).map(s => (s, stages(s - 1), row.getLong(s - 1)))
      .toDF("stage", "stage_name", "users")
  }

  /** [[funnel]] with a conversion window: stage i counts only when it
    * happens STRICTLY after stage i−1 AND within `windowSeconds` of it
    * ("purchase within 24 h of the click") — the form product funnels
    * are actually quoted in. Attribution is GREEDY first-match (each
    * stage anchors at its earliest qualifying event — the product-
    * analytics convention), not an exists-any-chain search: a user whose
    * only conversion path runs through a later anchor is counted where
    * the greedy chain stalls. Same chain shape and scale posture as
    * [[funnel]] (per-stage re-aggregation against the one-row-per-user
    * chain frame, AQE broadcasts the chain side); the window bound rides
    * the join predicate, so out-of-window events never reach the
    * aggregation. */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnelWithin needs at least one stage")
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    var chain = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("t1"))
    for ((stage, idx) <- stages.tail.zipWithIndex) {
      val i = idx + 2
      val prevT = s"t${i - 1}"
      val qualified = events.filter(col(typeCol) === stage)
        .join(chain.select(col("u").as("_u"), col(prevT)),
          events(userCol) === col("_u") && col(tsCol) > col(prevT) &&
            col(tsCol) <= col(prevT) + expr(s"INTERVAL $windowSeconds SECOND"))
        .groupBy(col("_u").as("u2"))
        .agg(min(col(tsCol)).as(s"t$i"))
      chain = chain.join(qualified, chain("u") === qualified("u2"), "left")
        .drop("u2")
    }
    val aggs = (1 to stages.length).map(s => count(col(s"t$s")).as(s"c$s"))
    val row = chain.agg(aggs.head, aggs.tail: _*).first()
    (1 to stages.length).map(s => (s, stages(s - 1), row.getLong(s - 1)))
      .toDF("stage", "stage_name", "users")
  }

  /** Cohort retention: users grouped by first-seen day; for each (cohort
    * day, day offset ≥ 0) the number of DISTINCT cohort users active that
    * day. Two user-keyed shuffles (first-seen, then distinct activity) —
    * both partial-aggregable. Returns
    * (cohort_day STRING, day_offset INT, users BIGINT). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol).as("u"))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    events.select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
      .join(firstSeen, "u")
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** CDC-style latest-state compaction: the single newest row per key by
    * (tsCol, tieCol) — the "current snapshot" primitive that collapses an
    * append-only change log. One key-partitioned window (single shuffle);
    * the explicit tie column makes equal-timestamp re-sends deterministic
    * (bare max-by-ts would keep a partition-order-dependent row). */
  def latestPerKey(events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    // unlike the narrow-selecting operators below, this keeps the FULL
    // frame — withColumn would silently replace (and then drop) a
    // caller's own _rk column
    require(!events.columns.contains("_rk"),
      "latestPerKey writes working column '_rk' — input already has one")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    events.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }

  /** Trailing-window anomaly score per hour: each hour's event count
    * z-scored against the [baselineSecs, gapSecs] seconds BEFORE it (a
    * RANGE frame over the epoch, so irregular / missing hours do not
    * shift the baseline the way a row frame would). gapSecs excludes the
    * current hour from its own baseline. Hours whose baseline frame is
    * empty or constant emit null z — no silent zeros.
    *
    * Scale shape: the hourly rollup is one map-side-combinable groupBy;
    * the single global-ordered window runs over HOURS, not events —
    * thousands of rows regardless of corpus size, so the unpartitioned
    * window is driver-era-sized and deliberate, not a scale hazard. */
  def trailingZScore(events: DataFrame, tsCol: String,
      baselineSecs: Long = 72 * 3600L, gapSecs: Long = 3600L): DataFrame = {
    // gapSecs = 0 would put the current hour inside its own baseline
    // (RANGE upper bound 0 is inclusive), silently damping the very
    // signal the caller asked for — reject it.
    require(baselineSecs > gapSecs && gapSecs > 0,
      "need baselineSecs > gapSecs > 0")
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
      .withColumn("epoch", unix_timestamp(col("hour_ts")))
    // explicit single-partition spec on the hourly sidecar frame (a
    // year is ~9k rows): same execution, no WindowExec warning noise
    val w = Window.partitionBy(lit(1)).orderBy(col("epoch"))
      .rangeBetween(-baselineSecs, -gapSecs)
    val a = avg(col("n")).over(w)
    val s = stddev_samp(col("n")).over(w)
    hourly.select(
      date_format(col("hour_ts"), "yyyy-MM-dd HH:mm").as("hour"),
      col("n"),
      round(a, 4).as("base_avg"),
      round(s, 4).as("base_std"),
      when(s > 0, round((col("n") - a) / s, 4)).as("z"))
  }

  /** Dense per-type hourly series with gaps ZERO-FILLED between the
    * stream's first and last hour — the time-series resample/gap-fill
    * primitive (a downstream moving average or z-score over a series
    * with silent holes is simply wrong: missing hours are data, reading
    * "no events", not absence of data).
    *
    * Scale shape: the spine is hours × types (thousands of rows per year
    * regardless of corpus size) built from a broadcast 1-row bounds
    * frame; the corpus contributes one map-side-combinable aggregation.
    * Both join sides are post-aggregation small. */
  def gapFillHourly(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(typeCol))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(
      date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val spine = events.select(col(typeCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(typeCol),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    spine.join(hourly, Seq(typeCol, "hour_ts"), "left")
      .select(date_format(col("hour_ts"), "yyyy-MM-dd HH:mm").as("hour"),
        col(typeCol), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Apply a CDC delta to a base snapshot (the MERGE INTO primitive):
    * the delta is first compacted to its newest row per key
    * (`latestPerKey` — intermediate upserts of the same key collapse),
    * then base rows with no delta survive, delta upserts (op ≠ 'D')
    * replace, and delta deletes drop the key. `base` must not contain
    * `opCol`. Two key-equi shuffles (anti-join + union), no row ever
    * compared by payload — the snapshot-maintenance shape that scales
    * with |delta| + |base|, not their product. */
  def applyDelta(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, opCol: String): DataFrame = {
    require(!base.columns.contains(opCol),
      s"applyDelta: base already has a '$opCol' column")
    val latest = latestPerKey(delta, keyCols, tsCol, tieCol)
    val kept = base.join(latest.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    kept.unionByName(latest.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** First-order behavior transition matrix: counts of consecutive
    * (from_type → to_type) event pairs within each user's time-ordered
    * stream — the Markov-chain view of user journeys (and the building
    * block for next-event prediction features). `tieCol` breaks equal
    * timestamps deterministically. One user-keyed window shuffle (the
    * lead() pass) feeding a map-side-combinable pair aggregation; a user's
    * history length never matters to the shuffle, only their event count. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exponentially-weighted moving average per key over an ordered
    * series — the smoothing/trend primitive (rate dashboards, drift
    * baselines, anomaly thresholds). s₁ = x₁; sₜ = α·xₜ + (1−α)·sₜ₋₁.
    *
    * The recursion is evaluated as an explicit LEFT FOLD over each
    * key's series (collect_list → sort_array → running `aggregate`
    * lambda), not as a closed-form Σ α(1−α)^(t−k)xₖ window: the fold
    * performs the same IEEE operations in the same order on every
    * engine, so with a dyadic α (0.25, 0.5 — exactly representable)
    * a DuckDB recursive CTE reproduces every intermediate bit-for-bit,
    * while pow()-based forms drift in the last ulp. Output values are
    * additionally rounded to `decimals` in-plan.
    *
    * Scale: one key-keyed shuffle; each key's whole series must fit in
    * one aggregation buffer (it is a per-key time series — thousands of
    * points, not corpus-sized). The quadratic array-append in the fold
    * is bounded by series length; for the billion-point-per-key case
    * use a streaming stateful form instead. Output: (key, ord, value,
    * ewma). */
  def ewma(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, alpha: Double, decimals: Int = 6): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val folded = series
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("ord"), col(valCol).cast("double").as("x"))))
        .as("pts"))
      .withColumn("sm", aggregate(col("pts"),
        array().cast("array<double>"),
        (acc, p) => concat(acc, array(
          when(size(acc) === 0, p.getField("x"))
            .otherwise(lit(alpha) * p.getField("x") +
              lit(1.0 - alpha) * element_at(acc, -1))))))
    folded
      .select(col("key"), posexplode(arrays_zip(col("pts"), col("sm"))))
      .select(col("key").as(keyCol),
        col("col.pts.ord").as(ordCol),
        col("col.pts.x").as(valCol),
        round(col("col.sm"), decimals).as("ewma"))
  }

  /** Type-2 slowly-changing-dimension history from a change stream: one
    * validity interval per (key, consecutive run of equal attribute
    * values) — the dimension-table build every warehouse load performs.
    * A change event opens a new version only when its attribute DIFFERS
    * from the key's previous event (runs of the same value collapse);
    * each version's `valid_to` is the next version's `valid_from`, the
    * open version carries null.
    *
    * Null-safe: the run comparison uses `<=>`, so a null attribute is a
    * legal value that opens/extends its own run rather than vanishing
    * from history (a bare `=!=` filter would silently drop every
    * null-attribute change point).
    *
    * Scale shape: both windows share one partitioning (key) and one
    * ordering (ts, tie) — a single exchange + sort serves the run
    * detection AND the interval stitch; nothing leaves its key
    * partition. Ties on ts are broken by `tieCol`, so replays are
    * deterministic. Output: (key, version, attr, valid_from, valid_to,
    * is_current), versions 1-indexed per key. */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(attrCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_rn") === 1 || !(col(attrCol) <=> col("_prev")))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** SFT transcript assembly: per key, the time-ordered event lines
    * joined into one training string — the conversation/session →
    * sample step of a fine-tuning pipeline. Ordering is pinned inside
    * the aggregation (sort_array over (ts, tie, line) structs), NOT by
    * collect_list order — collect_list is partition-order-dependent and
    * would make the transcript nondeterministic under retries/AQE.
    *
    * Scale shape: one key-partitioned aggregation; each group's state
    * is its own line list (a transcript is session-sized by
    * construction — callers chunk pathological keys upstream). Output:
    * (key, n_turns, transcript). */
  def assembleTranscripts(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, lineCol: Column, sep: String = "\n"): DataFrame =
    events
      .select(col(keyCol), struct(col(tsCol), col(tieCol),
        lineCol.as("line")).as("_item"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("_item"))).as("_items"))
      .select(col(keyCol), size(col("_items")).as("n_turns"),
        array_join(transform(col("_items"), i => i.getField("line")), sep)
          .as("transcript"))

  /** Exact trailing-window distinct actives per day — "7-day active
    * users" without sketches: each (user, active-day) pair CONTRIBUTES
    * FORWARD to the `windowDays` output days it falls inside, so the
    * rolling distinct reduces to one explode (bounded ×windowDays on
    * per-(user, day) DISTINCT rows, not raw events) + one
    * count_distinct keyed by day. No per-day range self-join, no
    * quadratic window frame. Output days clip to the data's [min, max]
    * day span (a 1-row broadcast bound, the gapFill pattern); days
    * whose trailing window is empty are absent, not zero-filled.
    * Output: (day, actives). */
  def rollingDistinct(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val acts = events.select(col(userCol).as("u"),
        (unix_timestamp(col(tsCol)) / 86400).cast("long").as("day"))
      .distinct()
    val bounds = acts.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    acts
      .select(col("u"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
          .as("day_w"))
      .crossJoin(broadcast(bounds))
      .filter(col("day_w").between(col("lo"), col("hi")))
      .groupBy(col("day_w").as("day"))
      .agg(countDistinct(col("u")).as("actives"))
  }

  /** Per-key OLS trend over an INTEGER (ord, value) series — "is this
    * source's daily volume rising?" without a modeling library. slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept = (Σy − slope·Σx)/n.
    * Both x and y are integers, so every Σ is an exact integer
    * aggregate (order-independent — a double Σxy would make the result
    * partition-order dependent); the two divisions at the end are the
    * only fp, the same single-fp-op contract as [[ewma]]'s oracle.
    * Keys with fewer than 2 points or a constant x emit null slope —
    * no silent zeros. One map-side-combinable aggregation. Output:
    * (key, n, slope, intercept). */
  def linearTrend(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, decimals: Int = 6): DataFrame = {
    val x = col(ordCol).cast("long")
    val y = col(valCol).cast("long")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") / den.cast("double")
    series
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .select(col(keyCol), col("n"),
        round(when(den > 0, slope), decimals).as("slope"),
        round(when(den > 0,
          (col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double")), decimals).as("intercept"))
  }

  /** Time-weighted average of an irregular series per key — the
    * sensor/price/metric summary where arithmetic mean is simply wrong
    * (a value that held for an hour must outweigh one that held for a
    * second): TWAP = Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δtᵢ the MICROSECOND gap to
    * the next observation (last point carries no weight — the value's
    * holding period is unobserved; a key with one event emits null, not
    * a silent zero).
    *
    * Numerics: Δt are exact integers; the numerator Σ v·Δt is fp, so it
    * accumulates as a (tsCol, tieCol)-ORDERED running window sum — the
    * rankedEval discipline: defined addition order, byte-reproducible
    * across engines and partitionings, never a shuffle-order-dependent
    * agg sum. The denominator is an integer sum. One division at the
    * end, rounded in-plan.
    *
    * Scale: ONE key-partitioned exchange + sort serves the lead()
    * duration, the running sums, and the last-row selection — a key's
    * history length inflates its partition, never the number of
    * passes. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, decimals: Int = 6): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("_us").asc, col(tieCol).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("_us"),
        col(valCol).cast("double").as("_v"))
      .withColumn("_dur", lead(col("_us"), 1).over(ord) - col("_us"))
      .withColumn("_num", sum(col("_v") * col("_dur")).over(run))
      .withColumn("_den", sum(col("_dur")).over(run))
      .withColumn("_n", count(lit(1)).over(run))
      // the last row per key is the ONLY one whose lead() is null — no
      // second window ordering needed to select it
      .filter(col("_dur").isNull)
      .select(col(keyCol), col("_n").as("n_points"),
        col("_den").as("span_us"),
        round(when(col("_den") > 0, col("_num") / col("_den")), decimals)
          .as("twap"))
  }

  /** Exponentially time-decayed value per key — the recency-weighted
    * engagement/affinity score feature stores serve: each event
    * contributes value·2^(−age/halflife), ages measured in exact
    * integer micros against the stream's own max timestamp (a
    * data-defined anchor, so the score is a pure function of the data —
    * no wall clock). Per-event contributions micro-round in-plan →
    * the per-key sum runs over longs (order-free, the termEntropy
    * discipline); one keyed exchange, map-side combinable. */
  def decayedValue(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, halflifeHours: Double,
      decimals: Int = 6): DataFrame = {
    require(halflifeHours > 0, "halflife must be positive")
    val hlMicros = halflifeHours * 3600.0 * 1e6
    val anchor = events.agg(max(unix_micros(col(tsCol))).as("_t0"))
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("_us"),
        col(valCol).cast("double").as("_v"))
      .crossJoin(broadcast(anchor))
      .select(col(keyCol),
        (round(col("_v") *
            pow(lit(2.0), -(col("_t0") - col("_us")).cast("double") /
              lit(hlMicros)) * lit(1e6))
          .cast("long")).as("_c_micro"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("_c_micro")).as("_sm"))
      .select(col(keyCol), col("n_events"),
        (round(col("_sm") / lit(1e6), decimals) + lit(0.0))
          .as("decayed_value"))
  }
}
