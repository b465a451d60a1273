package graft.queries

import graft.operators.{Bpe, Dedup, FuzzyJoin, SimilaritySearch, TextAnalysis, UnigramLm, WordPiece}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Data-curation and data-management operators: edit-distance record
  * linkage (recall-1 deletion-neighborhood blocking), distributed BPE
  * tokenizer training, inverted-index postings, text normalization,
  * keyword tagging, weighted priority sampling, embedding mean pooling,
  * quality-policy dedup, time-series gap-fill, Merkle replica
  * reconciliation, CDC merge, and user-journey transitions. Same
  * contract as the other query modules: every entry value-checks
  * against a DuckDB oracle. */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed WordPiece vocab for the `vocab_wordpiece_encode` gate — ONE
    * literal shared by the Spark encoder and the DuckDB recursive-CTE
    * oracle (interpolated into the SQL below), so the two sides cannot
    * drift. All 26 letters in both plain and `##` form (total coverage
    * → no [UNK]) plus corpus-relevant multi-char pieces so the greedy
    * longest-match is exercised at every length. */
  private[graft] val WpVocab: Seq[String] = {
    val letters = ('a' to 'z').map(_.toString)
    letters ++ letters.map("##" + _) ++ Seq(
      "join", "the", "key", "row", "agg", "batch", "small", "fast",
      "slow", "big", "part", "ha", "##sh", "sc", "##an", "cus",
      "##tomer", "col", "##umn", "fil", "##ter", "mer", "##ge", "or",
      "##der", "vec", "##tor", "ta", "##ble", "st", "##ream", "wind",
      "##ow", "sp", "##ark", "gr", "##oup", "qu", "##ery", "da", "##ta",
      "li", "##ne", "va", "##lue", "so", "##rt")
  }

  val queries: Map[String, Q] = Map(
    // ── fuzzy self-join: supplier names within edit distance 1. The
    //    oracle is the EXHAUSTIVE theta-join, so the gate certifies the
    //    deletion-neighborhood blocking's recall end to end, not just the
    //    verify step's precision. ───────────────────────────────────────
    "j_fuzzy_names" -> ((s, d) => {
      FuzzyJoin.editDistancePairs(t(s, d, "supplier"), "s_suppkey",
          "s_name", maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── fuzzy two-table linkage: even-key suppliers matched against
    //    odd-key suppliers (the record-linkage shape — two sources, no
    //    shared key, join on a noisy name) ────────────────────────────────
    "j_fuzzy_linkage" -> ((s, d) => {
      val sup = t(s, d, "supplier")
      FuzzyJoin.linkage(
          sup.filter(col("s_suppkey") % 2 === 0), "s_suppkey", "s_name",
          sup.filter(col("s_suppkey") % 2 === 1), "s_suppkey", "s_name",
          maxDist = 1)
        .orderBy(col("left_id"), col("right_id"))
    }),

    // ── sorted-neighborhood linkage: prefix-key sort, each row vs its
    //    ≤ 5 sort successors, banded-levenshtein verify — the cost-
    //    bounded blocking complementing the recall-certified deletion
    //    neighborhood; no global window (range partitions + broadcast
    //    boundary heads) ─────────────────────────────────────────────────
    "j_sorted_neighborhood" -> ((s, d) => {
      FuzzyJoin.sortedNeighborhoodPairs(t(s, d, "supplier"),
          "s_suppkey", "s_name", substring(col("s_name"), 1, 4),
          window = 6, maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── BPE round-0 statistics: the top-20 adjacent character pairs over
    //    all word occurrences (what the first merge maximizes) ────────────
    "vocab_bpe_pairs" -> ((s, d) => {
      Bpe.pairFrequencies(t(s, d, "documents"), "text")
        .orderBy(desc("cnt"), col("sym_l"), col("sym_r"))
        .limit(20)
    }),

    // ── BPE round-trip audit: train 8 merges, encode every word
    //    occurrence, reassemble each word from its symbols — mismatches
    //    are emitted, so the contract is a 0-row oracle. Certifies that
    //    merging is a pure re-segmentation (no character created, lost,
    //    or reordered) for ANY merge list the trainer produces. The merge
    //    list itself is deterministic and pinned in BpeSpec. ──────────────
    "vocab_bpe_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = Bpe.train(docs, "text", rounds = 8)
      val enc = Bpe.encode(docs, "doc_id", "text", merges)
      val rebuilt = enc.groupBy(col("doc_id"), col("word_pos"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("sym_pos"), col("symbol")))),
          x => x.getField("symbol")), "").as("rebuilt"))
      val words = docs.select(col("doc_id").cast("long").as("doc_id"),
          posexplode(graft.functions.Fingerprints.tokens(col("text")))
            .as(Seq("word_pos", "word")))
      // FULL OUTER join: an occurrence encode DROPPED surfaces as a null
      // `rebuilt`, and an occurrence encode INVENTED (kernel-vs-column
      // tokenizer drift emitting an extra word_pos) surfaces as a null
      // `word` — either direction of disagreement fails the 0-row audit
      words.join(rebuilt, Seq("doc_id", "word_pos"), "full_outer")
        .filter(col("rebuilt").isNull || col("word").isNull ||
          col("rebuilt") =!= col("word"))
        .select(col("doc_id"), col("word_pos"), col("word"), col("rebuilt"))
        .orderBy(col("doc_id"), col("word_pos"))
    }),

    // ── unigram-LM (SentencePiece-family) roundtrip audit: train the
    //    piece vocab (frequency-seeded, 1 EM round), Viterbi-segment
    //    every word, reassemble — any disagreement with the original
    //    word table is emitted (0-row oracle, the BPE pattern). This
    //    certifies segmentation is a pure re-segmentation for ANY vocab
    //    the trainer produces; the vocab itself is pinned in
    //    UnigramLmSpec. ─────────────────────────────────────────────────
    "vocab_unigram_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val vocab = UnigramLm.train(docs, "text", vocabSize = 200,
        emRounds = 1)
      val seg = UnigramLm.segment(docs, "doc_id", "text", vocab)
      val rebuilt = seg.groupBy(col("doc_id"), col("word_pos"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("piece_pos"), col("piece")))),
          x => x.getField("piece")), "").as("rebuilt"))
      val words = docs.select(col("doc_id").cast("long").as("doc_id"),
          posexplode(graft.functions.Fingerprints.tokens(col("text")))
            .as(Seq("word_pos", "word")))
      words.join(rebuilt, Seq("doc_id", "word_pos"), "full_outer")
        .filter(col("rebuilt").isNull || col("word").isNull ||
          col("rebuilt") =!= col("word"))
        .select(col("doc_id"), col("word_pos"), col("word"), col("rebuilt"))
        .orderBy(col("doc_id"), col("word_pos"))
    }),

    // ── unigram-LM top pieces by segmentation usage: multi-char pieces
    //    the EM actually selects (Viterbi/DP-defined values → DigestGate
    //    constant at sf0.01; exact values pinned in UnigramLmSpec) ────────
    "vocab_unigram_top" -> ((s, d) =>
      DigestGate.digestRow(vocabUnigramTopFull(s, d))),

    // ── WordPiece greedy encode against the FIXED shared vocab: one row
    //    per distinct [a-z]+ word — (word, pieces, n_pieces). FULL-value
    //    oracle: DuckDB replays the greedy longest-match-first walk with
    //    a recursive longest-prefix CTE over the SAME vocab literal, so
    //    the BERT-style encoder semantics (## continuations, longest
    //    match at every cursor) are driver-gated end to end. ────────────
    "vocab_wordpiece_encode" -> ((s, d) => {
      WordPiece.encodeWords(t(s, d, "documents"), "text", WpVocab.toSet)
        .filter(col("word").rlike("^[a-z]+$"))
        .orderBy(col("word"))
    }),

    // ── WordPiece round-trip audit with a TRAINED vocab (12 PMI-scored
    //    merges): stripping the ## continuations and concatenating the
    //    pieces must rebuild every corpus word, and no word may fall to
    //    [UNK] (the trainer's alphabet covers the corpus by
    //    construction) — violations are emitted, 0-row oracle. The
    //    learned pieces themselves are argmax/decimal-defined and pinned
    //    in WordPieceSpec (the vocab_bpe_roundtrip pattern). ────────────
    "vocab_wordpiece_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val vocab = WordPiece.train(docs, "text", rounds = 12).toSet
      WordPiece.encodeWords(docs, "text", vocab)
        .withColumn("rebuilt", array_join(transform(
          split(col("pieces"), " "),
          p => regexp_replace(p, "^##", "")), ""))
        .filter(col("pieces") === WordPiece.Unk ||
          col("rebuilt") =!= col("word"))
        .select(col("word"), col("pieces"), col("rebuilt"))
        .orderBy(col("word"))
    }),

    // ── inverted-index postings for the top-10 document-frequency terms:
    //    (term, df, doc_id, pos) — the retrieval index-build primitive ────
    "docs_postings" -> ((s, d) => {
      TextAnalysis.postings(t(s, d, "documents"), "doc_id", "text",
          topN = 10)
        .orderBy(col("term"), col("doc_id"), col("pos"))
    }),

    // ── canonical text normalization: NFD accent fold → lowercase →
    //    whitespace collapse → trim. The pass every dedup/quality pipeline
    //    runs first; unicode specifics pinned in TextAnalysisSpec ──────────
    "docs_normalize" -> ((s, d) => {
      TextAnalysis.normalizeFrame(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ── tokenize→pack composition: learned vocab → token-id encode →
    //    fixed-length training windows (16 ids per sequence, per doc).
    //    Proves vocab/encode/window compose under one oracle. ──────────────
    "pipeline_tokenize_pack" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text", topN = 20)
      TextAnalysis.encodeWithVocab(docs, "doc_id", "text", vocab)
        .select(col("doc_id"), (col("pos") / 16).cast("int").as("seq_id"),
          (col("pos") % 16).as("pos_in_seq"), col("token_id"))
        .orderBy(col("doc_id"), col("seq_id"), col("pos_in_seq"))
    }),

    // ── weighted sampling without replacement: 5 docs per source,
    //    inclusion ∝ length-derived weight, Efraimidis–Spirakis priorities
    //    from content-keyed uniforms — deterministic across engines and
    //    retries (rounded-priority rank) ───────────────────────────────────
    "sample_weighted_priority" -> ((s, d) => {
      graft.operators.Sampling.weightedPrioritySample(t(s, d, "documents"),
          "source", concat_ws("|", col("text"), col("doc_id")),
          (col("n_chars") + 1) / lit(200.0), n = 5)
        .select(col("doc_id"), col("source"), col("priority"))
        .orderBy(col("doc_id"))
    }),

    // ── broadcast-dictionary keyword tagging: per-doc occurrence counts
    //    of a 5-term dictionary (blocklist/PII/topic scan shape) ───────────
    "docs_keyword_hits" -> ((s, d) => {
      TextAnalysis.keywordHits(t(s, d, "documents"), "doc_id", "text",
          Seq("hash", "join", "sort", "spark", "window"))
        .orderBy(col("doc_id"), col("keyword"))
    }),

    // ── user-journey transition matrix: consecutive event-type pairs per
    //    user's time-ordered stream, counted corpus-wide ───────────────────
    "events_transitions" -> ((s, d) => {
      graft.operators.EventAnalytics.transitions(t(s, d, "events"),
          "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    }),

    // ── time-series gap-fill: dense per-type hourly series, missing
    //    hours ZERO-filled between the stream's first and last hour (the
    //    resample primitive a moving average needs to be correct) ──────────
    "events_gapfill" -> ((s, d) => {
      graft.operators.EventAnalytics.gapFillHourly(t(s, d, "events"),
          "ts", "event_type")
        .orderBy(col("hour"), col("event_type"))
    }),

    // ── PMI term co-occurrence over the top-100 df vocabulary: the
    //    collocation signal for query expansion / taxonomy seeding.
    //    Integer document frequencies, one ln on an exact ratio. ─────────
    "docs_pmi_pairs" -> ((s, d) => {
      graft.operators.TextAnalysis.pmiPairs(t(s, d, "documents"),
        "doc_id", "text", vocabTop = 100, minPairCount = 2L, topN = 50)
    }),

    // ── per-source Gini concentration of document sizes: the corpus-
    //    balance audit (is one source dominated by a few giant docs?).
    //    Exact integer rank-weighted sums; fp only in the final tree. ────
    "source_gini" -> ((s, d) => {
      graft.operators.TextAnalysis.giniByGroup(t(s, d, "documents"),
          "source", "doc_id", col("n_chars"))
        .orderBy(col("source"))
    }),

    // ── SCD2 dimension history: per user, one validity interval per run
    //    of equal event_type — run detection and interval stitch share a
    //    single (user)-keyed exchange + (ts, event_id) sort ────────────────
    "events_scd2" -> ((s, d) => {
      graft.operators.EventAnalytics.scd2History(t(s, d, "events"),
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("version"), col("attr"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss")
            .as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    // ── nearest-in-time join: the click closest to each purchase in
    //    EITHER direction (ties → the earlier/backward click). Two as-of
    //    merges + a left-row-sized stitch — no range probe ─────────────────
    "j_asof_nearest" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOfNearest(purchases, clicks,
          "user_id", "ts", "event_id", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("near_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          col("near_dir").as("dir"),
          round(col("near_click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // ── DPO preference pairs: per source, rank-i longest doc paired with
    //    rank-i shortest (i ≤ 3) — max-margin pairs first; equal-score
    //    and self pairs carry no signal and are dropped ────────────────────
    "pref_pairs" -> ((s, d) => {
      graft.operators.Preference.preferencePairs(t(s, d, "documents"),
          "source", "doc_id", "n_chars", maxPairs = 3)
        .orderBy(col("source"), col("pair_rank"))
    }),

    // ── majority-vote consensus: per user, the most frequent event_type
    //    (ties → lexicographically smallest) with agreement ratio ──────────
    "labels_majority" -> ((s, d) => {
      graft.operators.Preference.majorityVote(t(s, d, "events"),
          "user_id", "event_type")
        .orderBy(col("user_id"))
    }),

    // ── inter-annotator agreement: Cohen's κ between the even- and
    //    odd-event "raters" of each user's label (majority event_type
    //    per side, ties → smallest) — the labeling-QA gate before
    //    consensus labels are trusted. Exact integer marginals. ─────────
    "labels_kappa" -> ((s, d) => {
      graft.operators.Preference.cohenKappa(t(s, d, "events"),
        "user_id", pmod(col("event_id"), lit(2)) === 0, "event_type")
    }),

    // ── SFT transcript assembly: per user, time-ordered event lines
    //    joined into one sample string; ordering pinned INSIDE the
    //    aggregation (sort_array), not by collect order ─────────────────────
    "sft_transcripts" -> ((s, d) => {
      graft.operators.EventAnalytics.assembleTranscripts(t(s, d, "events"),
          "user_id", "ts", "event_id",
          concat(col("event_type"), lit("#"), col("event_id")))
        .orderBy(col("user_id"))
    }),

    // ── tokenizer-coverage audit: per source, the token-occurrence
    //    fraction outside the corpus top-1000 tf vocabulary ────────────────
    "vocab_oov_rate" -> ((s, d) => {
      graft.operators.TextAnalysis.oovRate(t(s, d, "documents"),
          "source", "text", vocabTop = 1000)
        .orderBy(col("source"))
    }),

    // ── round-robin source interleaving: any prefix of the assembled
    //    shard is balanced across sources; pure arithmetic positions ───────
    "sample_interleave" -> ((s, d) => {
      graft.operators.Sampling.interleaveRoundRobin(t(s, d, "documents"),
          "source", "doc_id")
        .orderBy(col("pos")).limit(500)
    }),

    // ── declarative DQ expectations: row-local checks fold into ONE
    //    aggregation over one scan; uniqueness adds a keyed agg; the FK
    //    check is a broadcast anti-join — the snapshot admission gate ──────
    "dq_report" -> ((s, d) => {
      import graft.operators.DataQuality._
      checkReport(t(s, d, "lineitem"), Seq(
        NotNull("l_orderkey"),
        InRange("l_discount", 0.0, 0.1),
        InRange("l_quantity", 1.0, 49.0),   // deliberately tight: the 50s fail
        Matches("l_returnflag", "^[ANR]$"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        ForeignKey("l_orderkey", t(s, d, "orders"), "o_orderkey")))
    }),

    // ── audience overlap: pairwise Jaccard of event types' user sets —
    //    distinct (type, user) pairs self-join on user (the bounded
    //    type-pair fan-out), exact integer intersections/unions ───────────
    "events_type_overlap" -> ((s, d) => {
      val tu = t(s, d, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val sizes = tu.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nu"))
      val inter = tu.as("a").join(tu.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("event_type").as("type_a"),
          col("nu").as("na")), "type_a")
        .join(sizes.select(col("event_type").as("type_b"),
          col("nu").as("nb")), "type_b")
        .select(col("type_a"), col("type_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("union_size"),
          (round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 6) + lit(0.0))
            .as("jaccard"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // ── Herfindahl concentration of the corpus source mix: HHI =
    //    Σ share² computed as Σcs²/N² — the squared-count sum is an
    //    exact INTEGER aggregation (order-free), fp only in the final
    //    division ─────────────────────────────────────────────────────────
    "a_hhi" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("cs"))
        .agg(count(lit(1)).as("n_sources"),
          sum(col("cs")).as("n_docs"),
          sum(col("cs") * col("cs")).as("_ss"))
        .select(col("n_sources"), col("n_docs"),
          (round(col("_ss").cast("double") /
            (col("n_docs") * col("n_docs")), 6) + lit(0.0)).as("hhi"))
    }),

    // ── cohort LTV curves: per first-seen-day cohort, cumulative value
    //    by day offset (exact DECIMAL sums; the cumulative is a rank-
    //    ordered window accumulation). The retention table's revenue
    //    sibling. ───────────────────────────────────────────────────────
    "events_cohort_ltv" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("value").cast("decimal(18,2)").as("v"))
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val daily = ev.join(firstDay, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(sum(col("v")).as("day_value"),
          countDistinct(col("user_id")).as("active_users"))
      val run = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      daily
        .withColumn("cum_value", sum(col("day_value")).over(run))
        .select(col("cohort_day").cast("string").as("cohort_day"),
          col("day_offset"), col("active_users"),
          col("day_value").cast("string").as("day_value"),
          col("cum_value").cast("string").as("cum_value"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // ── contingency association audit: order priority × status cell
    //    counts vs independence expectations, per-cell chi-square
    //    contributions as ROWS (no cross-cell fp sum to order) ────────────
    "a_contingency" -> ((s, d) => {
      val o = t(s, d, "orders")
      val cells = o.groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("observed"))
      val rows = o.groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("rn"))
      val cols = o.groupBy(col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("cn"))
      val n = o.agg(count(lit(1)).as("n"))
      val exp = col("rn").cast("double") * col("cn") / col("n")
      cells.join(rows, "pri").join(cols, "st").crossJoin(broadcast(n))
        .select(col("pri"), col("st"), col("observed"),
          round(exp, 4).as("expected"),
          (round(pow(col("observed") - exp, 2.0) / exp, 6) + lit(0.0))
            .as("chi2_contrib"))
        .orderBy(col("pri"), col("st"))
    }),

    // ── RFM segmentation: recency (days vs the dataset's own max
    //    order date — data-defined anchor), frequency, monetary (exact
    //    DECIMAL) per customer, quartile-scored by ntile over a fully
    //    tie-broken order — every score is a deterministic integer ───────
    // ── RFM quartile scoring: exact ntile(4) is a global order by
    //    definition (gate form, matches the oracle exactly). The frame is
    //    the per-customer AGGREGATE, not raw orders; at 100 TB the
    //    production form computes approx-quantile cutpoints (3 doubles per
    //    dimension, one pass) and assigns scores by comparison — same
    //    buckets up to boundary ties, no global sort. Allowlisted in
    //    GlobalWindowSpec. ─────────────────────────────────────────────────
    "a_rfm" -> ((s, d) => {
      val anchor = t(s, d, "orders")
        .agg(max(col("o_orderdate")).as("maxd"))
      val base = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("lastd"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
        .crossJoin(broadcast(anchor))
        .select(col("o_custkey").as("custkey"),
          datediff(col("maxd"), col("lastd")).cast("long").as("recency_days"),
          col("frequency"), col("monetary"))
      def score(orderCols: Seq[org.apache.spark.sql.Column]) =
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy(orderCols: _*))
      base
        .withColumn("r_score",
          score(Seq(col("recency_days").asc, col("custkey").asc)))
        .withColumn("f_score",
          score(Seq(col("frequency").desc, col("custkey").asc)))
        .withColumn("m_score",
          score(Seq(col("monetary").desc, col("custkey").asc)))
        .select(col("custkey"), col("recency_days"), col("frequency"),
          col("monetary").cast("string").as("monetary"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .as("rfm_code"))
        .orderBy(col("custkey"))
    }),

    // ── the a_rfm PRODUCTION form: order-statistic cutpoint scoring
    //    (Quantiles.cutpointScores) instead of the global-sort ntile —
    //    distinct-value histogram → ceil(p·n)-th order statistics →
    //    broadcast comparison, no data-sized single partition. Buckets
    //    are tie-STABLE (equal values share a bucket where ntile splits
    //    by sort position), so the codes differ from a_rfm exactly at
    //    tied quartile boundaries; the oracle replays the same
    //    order-statistic definition, making this a FULL value gate of
    //    the scale path itself. ────────────────────────────────────────────
    "a_rfm_cutpoints" -> ((s, d) => {
      val anchor = t(s, d, "orders")
        .agg(max(col("o_orderdate")).as("maxd"))
      val base = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("lastd"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
        .crossJoin(broadcast(anchor))
        .select(col("o_custkey").as("custkey"),
          datediff(col("maxd"), col("lastd")).cast("long")
            .as("recency_days"),
          col("frequency"), col("monetary"))
      import graft.operators.Quantiles
      val scored = Quantiles.cutpointScoresMulti(base, Seq(
        Quantiles.Dim("recency_days", 4, "r_score"),
        Quantiles.Dim("frequency", 4, "f_score", ascending = false),
        Quantiles.Dim("monetary", 4, "m_score", ascending = false)))
      scored.select(col("custkey"), col("recency_days"), col("frequency"),
          col("monetary").cast("string").as("monetary"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .as("rfm_code"))
        .orderBy(col("custkey"))
    }),

    // ── market-basket association: part pairs co-purchased in ≥ 3
    //    orders, with support counts, confidence and lift. Scale shape:
    //    one DISTINCT (order, part) shuffle, a self-join keyed on the
    //    ORDER (never all part pairs — only within-basket pairs
    //    enumerate), per-part counts broadcast back. All counts exact
    //    integers; confidence/lift are single divisions of exact ints —
    //    identical IEEE doubles on both engines, no rounding anywhere. ──────
    "basket_lift" -> ((s, d) => {
      val op = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pc = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val n = op.agg(countDistinct(col("l_orderkey")).as("n"))
      val pairs = op.as("a").join(op.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
      pairs
        .join(broadcast(pc.select(col("l_partkey").as("part_a"),
          col("c").as("c_a"))), "part_a")
        .join(broadcast(pc.select(col("l_partkey").as("part_b"),
          col("c").as("c_b"))), "part_b")
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("c_a"), col("c_b"),
          col("c_ab"),
          (col("c_ab").cast("double") / col("c_a")).as("confidence"),
          ((col("n") * col("c_ab")).cast("double") /
            (col("c_a") * col("c_b"))).as("lift"))
        .orderBy(desc("lift"), col("part_a"), col("part_b"))
    }),

    // ── engagement concentration (Pareto point): per event type, how
    //    many top users cover 80% of total value. Per-user totals in
    //    exact DECIMAL (order-free), the cumulative share as a
    //    rank-ordered window accumulation — deterministic boundary. ──────
    "events_pareto" -> ((s, d) => {
      val perUser = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("sv").desc, col("user_id"))
      val run = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      perUser
        .withColumn("rk", row_number().over(w))
        .withColumn("csum", sum(col("sv")).over(run))
        .withColumn("total", sum(col("sv")).over(wt))
        .withColumn("nu", count(lit(1)).over(wt))
        .filter(col("csum").cast("double") >=
          col("total").cast("double") * 0.8)
        .groupBy(col("event_type"))
        .agg(min(col("rk")).as("users_to_80pct"),
          max(col("nu")).cast("long").as("n_users"))
        .select(col("event_type"), col("n_users"), col("users_to_80pct"),
          round(col("users_to_80pct").cast("double") / col("n_users"), 4)
            .as("pareto_ratio"))
        .orderBy(col("event_type"))
    }),

    // ── Benford first-digit audit (fraud/synthetic-data DQ): observed
    //    leading-digit counts of order totals vs log10(1+1/d) expected,
    //    with per-digit chi-square contributions. The digit derives
    //    NUMERICALLY (x / 10^floor(log10 x)) — no string formatting to
    //    diverge between engines; counts exact, one fixed tree per row. ──
    "a_benford" -> ((s, d) => {
      val x = col("o_totalprice")
      val digit = floor(x / pow(lit(10.0), floor(log10(x)))).cast("int")
      val counts = t(s, d, "orders")
        .filter(x > 0)
        .select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
      val total = t(s, d, "orders").filter(x > 0)
        .agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(total))
        .select(col("digit"), col("observed"),
          round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6)
            .as("expected_p"),
          (round(
            pow(col("observed") -
              col("n") * log(10.0, lit(1.0) + lit(1.0) / col("digit")),
              2.0) /
            (col("n") * log(10.0, lit(1.0) + lit(1.0) / col("digit"))),
            6) + lit(0.0)).as("chi2_contrib"))
        .orderBy(col("digit"))
    }),

    // ── mutual information between two categorical columns (feature-
    //    association audit: does source determine language?): exact
    //    integer cell/marginal counts; each cell's c·ln(c·N/(cs·cl))
    //    micro-rounds in-plan → order-free integer sum (termEntropy
    //    discipline), one fixed tree at the end ──────────────────────────
    "a_mutual_info" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cells = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val ms = docs.groupBy(col("source")).agg(count(lit(1)).as("cs"))
      val ml = docs.groupBy(col("lang")).agg(count(lit(1)).as("cl"))
      val n = docs.agg(count(lit(1)).as("n"))
      cells.join(ms, "source").join(ml, "lang").crossJoin(broadcast(n))
        .select((round(col("c") *
            log(col("c").cast("double") * col("n") /
              (col("cs").cast("double") * col("cl"))) * lit(1e6))
          .cast("long")).as("_term_micro"), col("n"))
        .groupBy(col("n"))
        .agg(sum(col("_term_micro")).as("_sm"), count(lit(1)).as("n_cells"))
        .select(col("n"), col("n_cells"),
          (round(col("_sm") / (col("n") * lit(1e6)), 6) + lit(0.0))
            .as("mi_nats"))
    }),

    // ── k-anonymity audit (privacy DQ): quasi-identifier combos with
    //    fewer than k carriers re-identify — emit every violating combo
    //    with its size. One keyed aggregation; length buckets coarsen
    //    the continuous column the standard way. ───────────────────────
    "dq_k_anonymity" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("lang"), col("source"),
          (floor(col("n_chars") / 100) * 100).cast("long").as("len_bucket"))
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("group_size"))
        .filter(col("group_size") < 5)
        .orderBy(col("lang"), col("source"), col("len_bucket"))
    }),

    // ── Spearman rank correlation between document length and quality
    //    per source: rank both metrics (average-rank ties via the
    //    standard two-window form), then Pearson over ranks — the
    //    robust association check behind "does length proxy quality?".
    //    Exact integer rank sums; fp only in the final fixed tree. ──────
    "a_spearman" -> ((s, d) => {
      val q = TextAnalysis.qualityFrame(t(s, d, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .join(q, "doc_id")
      def avgRank(c: String) = {
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col(c), col("doc_id"))
        // average rank over ties of the VALUE: (min_rank + max_rank)/2
        // via two value-keyed windows (rank + count)
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col(c))
        (min(row_number().over(w1)).over(wv).cast("double") +
          max(row_number().over(w1)).over(wv).cast("double")) / 2.0
      }
      docs
        .withColumn("rx", avgRank("n_chars"))
        .withColumn("ry", avgRank("quality"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        .select(col("source"), col("n").cast("long").as("n"),
          (round(
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))),
            6) + lit(0.0)).as("spearman"))
        .orderBy(col("source"))
    }),

    // ── row-level snapshot diff: added/removed/changed with per-column
    //    change attribution; unchanged keys dropped (diff-sized output) ────
    "snapshot_diff" -> ((s, d) => {
      val ev = t(s, d, "events")
      val before = graft.operators.EventAnalytics.latestPerKey(
        ev.filter(col("event_id") % 2 === 0), Seq("user_id"), "ts",
        "event_id")
      val after = graft.operators.EventAnalytics.latestPerKey(
        ev, Seq("user_id"), "ts", "event_id")
      graft.operators.Sync.snapshotDiff(before, after, Seq("user_id"),
          Seq("event_type", "value"))
        .select(col("user_id"), col("status"),
          array_join(col("changed_cols"), ",").as("changed"))
        .orderBy(col("user_id"))
    }),

    // ── exact trailing 7-day distinct actives: contribute-forward
    //    explode on per-(user, day) DISTINCT rows + one count_distinct —
    //    no range self-join, no quadratic frame ────────────────────────────
    "events_rolling_actives" -> ((s, d) => {
      graft.operators.EventAnalytics.rollingDistinct(t(s, d, "events"),
          "user_id", "ts", windowDays = 7)
        .orderBy(col("day"))
    }),

    // ── exact two-sample KS distance between source doc-length
    //    distributions: cross-multiplied integer CDF comparison, one
    //    division at the end — the binning-free drift test ─────────────────
    "docs_ks_drift" -> ((s, d) => {
      graft.operators.Drift.ksDistance(t(s, d, "documents"),
        "source", "n_chars", "src0", "src1")
    }),

    // ── per-source Shannon entropy of the term distribution: c·ln c
    //    quantized to integer micro-nats in-plan, so the cross-term sum
    //    is order-free; fp only in the final fixed tree ──────────────────
    "docs_term_entropy" -> ((s, d) => {
      graft.operators.TextAnalysis.termEntropy(t(s, d, "documents"),
          "source", "text")
        .orderBy(col("source"))
    }),

    // ── chi-square language-mix drift between the odd/even doc_id
    //    snapshots: per-category (o−e)²/e attribution, exact integer
    //    counts into one fp tree per cell — the categorical leg of the
    //    PSI/KS monitoring stack ─────────────────────────────────────────
    "docs_chi2_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Drift.categoricalDrift(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0), "lang")
        .orderBy(col("category"))
    }),

    // ── per-type OLS trend of DAILY volumes: every Σ is an exact integer
    //    (x = epoch day, y = count), the two divisions are the only fp —
    //    order-independent where a double Σxy would not be ─────────────────
    "events_trend" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          (unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.EventAnalytics.linearTrend(daily, "event_type",
          "day", "cnt")
        .orderBy(col("event_type"))
    }),

    // ── winsorized mean: per return flag, l_quantity clipped at the
    //    exact p10/p90 before averaging — integer-valued domain keeps
    //    the percentile interpolation and the clipped sum engine-exact ─────
    "a_winsorized_mean" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      val bounds = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(q, 0.1)").as("p10"),
          expr("percentile(q, 0.9)").as("p90"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          least(greatest(col("q"), col("p10")), col("p90")).as("w"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(avg(col("w")), 6).as("wmean"))
        .orderBy(col("l_returnflag"))
    }),

    // ── native Damerau-Levenshtein (full Lowrance-Wagner, byte-grain —
    //    the transposition-aware linkage distance Spark lacks) over
    //    brand-blocked part-name pairs; integer output → hash-exact ────────
    "j_fuzzy_dl" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      // The build side broadcasts (part is dim-sized), so the probe
      // side's task count IS the parallelism of the whole pair-verify
      // stage — and a small parquet lands in ONE input split, serializing
      // every DP onto one core (measured: the spread alone is a 7× wall
      // cut at local[32]). At cluster scale a big probe has many splits
      // naturally and Dedup.spread no-ops; on an under-partitioned one
      // it costs a narrow shuffle of the dim-sized probe.
      val probe = graft.operators.Dedup.spread(p)
      // Predicate-order discipline: a trailing .filter(dist <= 2) gets
      // pushed into the join condition AND PREPENDED, so the DP would
      // run first on every brand pair. Author the full conjunction
      // here, cheap → expensive (short-circuit AND evaluates in order):
      // key order, then the lossless length prune (DL ≥ |len(a)−len(b)|),
      // then the BANDED thresholded verdict (damerauLevAtMost — exact
      // ≤2 decision at O(|a|·5) per pair instead of the full O(m·n)
      // matrix, see its band-safety proof) only on pairs that survive
      // both. The projection recomputes the full DP for the few
      // survivors — the exact distance the output carries.
      probe.as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey") &&
            abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 2 &&
            graft.functions.StringDistances
              .damerauLevAtMost(col("a.p_name"), col("b.p_name"), 2))
        .select(col("a.p_brand").as("p_brand"),
          col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          graft.functions.StringDistances
            .damerauLev(col("a.p_name"), col("b.p_name")).as("dist"))
        .orderBy(col("p_brand"), col("key_a"), col("key_b"))
    }),

    // ── native Jaro-Winkler (byte grain, >0.7 boost gate, prefix cap 4
    //    — semantics pinned to DuckDB over 5000 random cases) over the
    //    same brand-blocked pairs; RAW doubles, bit-identical across
    //    engines, so no rounding is needed anywhere ──────────────────────
    "j_fuzzy_jw" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      // Same predicate-order discipline as j_fuzzy_dl: full conjunction
      // authored cheap → expensive. Lossless prune: sim ≥ 0.9 ⟹ jaro ≥
      // 5/6 (JW ≤ 0.4 + 0.6·jaro at prefix cap 4, p = 0.1), and jaro ≤
      // (2 + min/max)/3, so the longer name is at most 2× the shorter.
      // Probe-side repartition for the same single-split-serialization
      // reason as j_fuzzy_dl (the verify stage's parallelism is the
      // probe's task count under a broadcast build).
      graft.operators.Dedup.spread(p).as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey") &&
            greatest(length(col("a.p_name")), length(col("b.p_name"))) <=
              least(length(col("a.p_name")), length(col("b.p_name"))) * 2 &&
            graft.functions.StringDistances
              .jaroWinklerCol(col("a.p_name"), col("b.p_name")) >= 0.9)
        .select(col("a.p_brand").as("p_brand"),
          col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          graft.functions.StringDistances
            .jaroWinklerCol(col("a.p_name"), col("b.p_name")).as("sim"))
        .orderBy(col("p_brand"), col("key_a"), col("key_b"))
    }),

    // ── time-weighted average of `value` per event type: Δt in exact
    //    integer micros, the fp numerator accumulates as a (ts, id)-
    //    ordered running window sum — defined addition order, so the
    //    oracle replays it byte-for-byte ─────────────────────────────────
    "events_twap" -> ((s, d) => {
      graft.operators.EventAnalytics.timeWeightedAvg(t(s, d, "events"),
          "event_type", "ts", "event_id", "value")
        .orderBy(col("event_type"))
    }),

    // ── EWMA smoothing (α = 1/4, dyadic → exact binary scaling) of the
    //    per-type DAILY event counts: the recursion runs as an explicit
    //    left fold, so every engine performs the identical IEEE ops in
    //    the identical order — the oracle's recursive CTE reproduces
    //    each sₜ bit-for-bit before the in-plan round. ───────────────────
    // ── recency-weighted engagement: per-user Σ value·2^(−age/24h),
    //    ages in exact micros against the stream's max ts (data-defined
    //    anchor); per-event terms micro-round in-plan → order-free ───────
    "events_decayed_value" -> ((s, d) => {
      graft.operators.EventAnalytics.decayedValue(t(s, d, "events"),
          "user_id", "ts", "value", halflifeHours = 24.0)
        .orderBy(col("user_id"))
    }),

    "events_ewma" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.EventAnalytics.ewma(daily, "event_type", "day",
          "n", alpha = 0.25)
        .orderBy(col("event_type"), col("day"))
    }),

    // ── replica reconciliation: Merkle-style bucket checksums of two
    //    copies of the documents table (right is missing every 97th doc);
    //    only buckets containing drift emit ────────────────────────────────
    "sync_bucket_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Sync.bucketDiff(
          docs, docs.filter(col("doc_id") % 97 =!= 0),
          col("doc_id").cast("string"), col("text"), nBuckets = 16)
        .orderBy(col("bucket"))
    }),

    // ── CDC MERGE: base snapshot (events before Jan 20, compacted to
    //    latest per key) + a delta with upserts and deletes (op derived
    //    from value) → the post-merge current state ─────────────────────────
    "cdc_apply_delta" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value"))
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val base = graft.operators.EventAnalytics.latestPerKey(
        ev.filter(col("ts") < cutoff), Seq("user_id", "event_type"),
        "ts", "event_id")
      val delta = ev.filter(col("ts") >= cutoff)
        .withColumn("op", when(col("value") < 50, "D").otherwise("U"))
      graft.operators.EventAnalytics.applyDelta(base, delta,
          Seq("user_id", "event_type"), "ts", "event_id", "op")
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          round(col("value"), 4).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ── mean pooling: one prototype vector per label (chunk→doc
    //    embedding / class-anchor step); exploded to scalar rows so every
    //    element is value-checked ──────────────────────────────────────────
    "emb_mean_pool" -> ((s, d) => {
      graft.operators.Pooling.meanPool(t(s, d, "embeddings"),
          "label", "embedding")
        .select(col("label"), col("n"),
          posexplode(transform(col("mean_vec"), x => round(x, 6)))
            .as(Seq("pos", "x")))
        .orderBy(col("label"), col("pos"))
    }),

    // ── margin-based bitext mining (Artetxe-Schwenk): label<5 as the
    //    source corpus, label≥5 as the target — pairs whose cosine
    //    stands out against BOTH sides' k-NN neighborhoods. Exact
    //    integer micro-cosines, exact k-NN sums, margin = ONE division
    //    of exact integers → identical doubles + threshold decisions on
    //    both engines (35 mined pairs at sf0.01). ──────────────────────
    "emb_bitext_margin" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.operators.Bitext.marginPairs(
          emb.filter(col("label") < 5),
          emb.filter(col("label") >= 5),
          "vec_id", "embedding", k = 4, minMargin = 1.2)
        .orderBy(col("src_id"), col("tgt_id"))
    }),

    // ── cell-restricted bitext audit (0-row, the ann_ivf_dominance
    //    pattern — centroids are k-means/engine-defined, so the oracle
    //    cannot replay them): in the mining regime (cos > 0, positive
    //    margins) candidate k-NN sums are SUBSETS of exact sums, so a
    //    candidate margin can never undercut its exact margin
    //    (dominance), and an exact-mined pair that shares a cell can
    //    never land in (0, 1.2] under the candidate form (recall) —
    //    either violation is emitted. Negative-cosine pairs are out of
    //    scope by the operator's documented regime. ──────────────────
    "emb_bitext_cells_audit" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val srcE = emb.filter(col("label") < 5)
      val tgtE = emb.filter(col("label") >= 5)
      // independent eager builds (each checkpoints its own pair table;
      // the cells side also runs the centroid fit) — overlapped from
      // two driver threads (guide §2.6), results unchanged
      val (exact, cells) = graft.operators.Overlap.inParallel(
        graft.operators.Bitext.marginPairs(srcE, tgtE,
          "vec_id", "embedding", k = 4, minMargin = Double.MinValue),
        graft.operators.Bitext.marginPairsCells(srcE, tgtE,
          "vec_id", "embedding", k = 4, minMargin = Double.MinValue,
          ncells = 8))
      // materialized ONCE (r17): `shared` feeds BOTH violation branches
      // (dominance + recall), so un-materialized the exact-vs-cells
      // join — and both miners' TopKSum/join tails above their internal
      // pair-table checkpoints — ran twice per audit
      val shared = cells.select(col("src_id"), col("tgt_id"),
          col("cos_micro"), col("margin").as("margin_cells"))
        .join(exact.select(col("src_id"), col("tgt_id"),
          col("margin").as("margin_exact")), Seq("src_id", "tgt_id"))
        .localCheckpoint()
      val v1 = shared.filter(col("cos_micro") > 0 &&
          col("margin_exact") > 0 && col("margin_cells") > 0 &&
          col("margin_cells") < col("margin_exact"))
        .select(lit("dominance").as("kind"), col("src_id"),
          col("tgt_id"), col("margin_exact"), col("margin_cells"))
      val v2 = shared.filter(col("cos_micro") > 0 &&
          col("margin_exact") > 1.2 && col("margin_cells") > 0 &&
          col("margin_cells") <= 1.2)
        .select(lit("recall").as("kind"), col("src_id"), col("tgt_id"),
          col("margin_exact"), col("margin_cells"))
      v1.unionByName(v2).orderBy(col("kind"), col("src_id"),
        col("tgt_id"))
    }),

    // ── cell-restricted bitext mining, POSITIVE gate: sign-bit cells
    //    (hyperplane LSH with basis hyperplanes — oracle-replayable,
    //    unlike k-means centroids), per-cell cross join, candidate-
    //    neighborhood margins, regime gate. FULL-VALUE oracle replays
    //    cells, sums, margins end-to-end; a recall-1 cells≡exact gate is
    //    impossible on these gap-less synthetic embeddings (see
    //    marginPairsSignCells scaladoc), so this pins the scale path's
    //    own semantics and emb_bitext_cells_audit pins its relationship
    //    to the exact miner. ───────────────────────────────────────────
    "emb_bitext_cells" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.operators.Bitext.marginPairsSignCells(
          emb.filter(col("label") < 5),
          emb.filter(col("label") >= 5),
          "vec_id", "embedding", k = 4, minMargin = 1.2, bits = 3)
        .orderBy(col("src_id"), col("tgt_id"))
    }),

    // ── mutual-argmax bitext mining (the CCMatrix selection rule):
    //    keep (x, y) iff each is the other's best margin — the
    //    high-precision one-candidate-per-sentence form of
    //    emb_bitext_margin. Same exact-integer margins; argmax order
    //    (margin DESC, id) is engine-independent because the doubles
    //    are identical. ─────────────────────────────────────────────────
    "emb_bitext_mutual" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.operators.Bitext.mutualTopPairs(
          emb.filter(col("label") < 5),
          emb.filter(col("label") >= 5),
          "vec_id", "embedding", k = 4)
        .orderBy(col("src_id"))
    }),

    // ── the CCMatrix pipeline end-to-end: mutual-argmax MINED pairs go
    //    through the BLEU-2 surface-overlap quality gate (the filter
    //    CCMatrix applies before a mined pair may train) — embedding
    //    ids key the documents table for the text leg. Oracle =
    //    composition of the two shared oracle chains. ───────────────────
    "emb_bitext_bleu" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val mined = graft.operators.Bitext.mutualTopPairs(
          emb.filter(col("label") < 5),
          emb.filter(col("label") >= 5),
          "vec_id", "embedding", k = 4)
        .select(col("src_id").as("ref_id"), col("tgt_id").as("cand_id"))
      graft.operators.Bitext.bleuPairs(mined, t(s, d, "documents"),
          "doc_id", "text")
        .orderBy(col("ref_id"), col("cand_id"))
    }),

    // ── semantic drift: pairwise centroid cosine between label
    //    segments — integer micro-unit quantization in-plan, exact
    //    BIGINT (segment, dim) sums, BigInt pair algebra on the
    //    sidecar, ONE fp tree per pair (identical on both engines:
    //    correctly-rounded casts of the same integers). Pair order is
    //    lexical on the segment's string form in both engines. ──────────
    "emb_centroid_drift" -> ((s, d) => {
      graft.operators.Drift.centroidCosine(t(s, d, "embeddings"),
          col("label"), col("embedding"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    // ── two-table interval overlap: per user, view-windows × click-
    //    windows that intersect (stream-vs-stream shape; same binned
    //    equi-key plan as the self-join form) ───────────────────────────────
    "j_interval_two_table" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"),
        (unix_timestamp(col("ts")) / 3600).cast("long").as("start_h"),
        ((unix_timestamp(col("ts")) / 3600).cast("long")
          + col("event_id") % 5).as("end_h"))
      graft.operators.Intervals.overlapJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          "user_id", "event_id", "event_id", "start_h", "end_h",
          binWidth = 12)
        .orderBy(col("user_id"), col("left_id"), col("right_id"))
    }),

    // ── TPC-H Q10 shape: returned-item revenue ranking — two broadcast
    //    dims into the fact join, top-20 via TakeOrderedAndProject ──────────
    "q10_returned_revenue" -> ((s, d) => {
      val cust = broadcast(t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")))
      val nation = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      // DECIMAL accumulation AND decimal-space rounding: a double sum's
      // last-ulp difference between engines can straddle round()'s half
      // boundary, and even on the SAME double the engines round
      // differently (Spark rounds the shortest decimal representation,
      // DuckDB the binary value — seen live: 307843.595 → .60 vs .59).
      // Exact decimal terms sum exactly, the decimal→decimal cast rounds
      // HALF_UP identically, and only the final already-rounded value is
      // cast to double.
      val term = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), term.as("term"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("term")).cast("decimal(38,2)").cast("double")
          .as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // ── percent-of-total share (ratio_to_report): each event type's
    //    slice of the total value — post-aggregation window over 5 rows.
    //    DECIMAL sums (exact on both engines) divide as identical doubles,
    //    so NO rounding is needed anywhere — the whole double-rounding
    //    trap class (PLANS.md "oracle discipline") never applies ──────────
    "events_share" -> ((s, d) => {
      val agg = t(s, d, "events").groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
      agg.select(col("event_type"),
          col("sv").cast("double").as("sum_value"),
          (col("sv").cast("double") /
            sum(col("sv")).over(
              org.apache.spark.sql.expressions.Window.partitionBy())
              .cast("double")).as("share"))
        .orderBy(col("event_type"))
    }),

    // ── NATIVE session windows: Spark's session_window aggregation (the
    //    Structured-Streaming-ready form of events_sessionize; batch here,
    //    same operator streams with a watermark). Boundary convention
    //    differs from the hand-rolled form: a gap of EXACTLY 30min starts
    //    a new session (windows are [start, last+gap)), so the oracle
    //    splits on >= rather than >. ─────────────────────────────────────
    "events_session_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ── incremental aggregate maintenance (materialized-view refresh):
    //    a stored per-user (count, sum) state absorbs the post-cutoff
    //    delta WITHOUT rescanning the base; the oracle recomputes from
    //    scratch over the full table, so the gate certifies
    //    merge(state, delta) == recompute(base ∪ delta) exactly ────────────
    "agg_incremental" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("value"), col("ts"))
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val base = graft.operators.IncrementalAgg.countSumState(
        ev.filter(col("ts") < cutoff), Seq("user_id"), "value")
      // null-ts rows (none in this data, but the split must be TOTAL to
      // match the unfiltered oracle) fall to the delta side, not nowhere
      graft.operators.IncrementalAgg.mergeCountSum(base,
          ev.filter(col("ts") >= cutoff || col("ts").isNull),
          Seq("user_id"), "value")
        .select(col("user_id"), col("n"),
          col("sv").cast("double").as("sum_value"),
          (col("sv").cast("double") / col("n")).as("avg_value"))
        .orderBy(col("user_id"))
    }),

    // ── JL random projection: 64-dim embeddings → 16 pseudo-random ±1/√k
    //    axes (the cheap shrink before ANN/pair sweeps). The hash-derived
    //    matrix is engine-reproducible, so the projected VALUES are
    //    value-checked against DuckDB recomputing the same projection ──────
    "emb_random_project" -> ((s, d) => {
      graft.operators.Projection.randomProject(t(s, d, "embeddings"),
          "vec_id", "embedding", inDim = 64, outDim = 16)
        .select(col("vec_id"),
          posexplode(transform(col("projected"), x => round(x, 4)))
            .as(Seq("j", "x")))
        .orderBy(col("vec_id"), col("j"))
    }),

    // ── two-stage retrieval certificate: coarse top-50 in the PROJECTED
    //    space → exact re-rank of those candidates → the re-ranked rank-r
    //    score can never exceed the exact search's rank-r score, for ANY
    //    projection (the candidates are a subset). 0-row oracle — the
    //    composition contract of emb_random_project + k1 search. ───────────
    "emb_project_rerank" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).first()
        .getSeq[Double](0).toArray
      val proj = graft.operators.Projection.randomProject(emb,
        "vec_id", "embedding", inDim = 64, outDim = 16)
      val qProj = graft.operators.Projection.projectOne(query, 64, 16)
      val k = 10
      val cands = SimilaritySearch.topK(proj, "vec_id", "projected",
          qProj.toSeq, k = 50)
        .select(col("vec_id"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("score"), col("vec_id"))
      val reranked = SimilaritySearch.topK(
          emb.join(cands, Seq("vec_id"), "left_semi"),
          "vec_id", "embedding", query.toSeq, k)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("rerank_score"))
      val exact = SimilaritySearch.topK(emb, "vec_id", "embedding",
          query.toSeq, k)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("exact_score"))
      reranked.join(exact, Seq("rank"))
        .filter(col("rerank_score") > col("exact_score"))
        .orderBy(col("rank"))
    }),

    // ── dedup ACTION, quality policy: per near-dup cluster keep the
    //    highest-quality member (ties → smallest id) instead of the
    //    smallest id — "keep the best copy". Oracle re-derives clusters
    //    (recursive CTE) AND the quality scores, so policy + signal are
    //    checked together. ─────────────────────────────────────────────────
    "dedup_apply_best" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // prefix-filtered generator — identical pair set (theorem); same
      // clusters, same policy outcome, same oracle.
      val pairs = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      val weights = TextAnalysis.qualityFrame(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      Dedup.dropNearDuplicatesBest(docs, "doc_id", pairs, weights, "quality")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    })
  )

  /** Full (undigested) output of `vocab_unigram_top` — the form
    * UnigramLmSpec pins; the gate entry wraps it in
    * [[DigestGate.digestRow]]. */
  def vocabUnigramTopFull(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 200,
      emRounds = 1)
    UnigramLm.segment(docs, "doc_id", "text", vocab)
      .filter(length(col("piece")) >= 2)
      .groupBy(col("piece")).agg(count(lit(1)).as("uses"))
      .orderBy(desc("uses"), col("piece")).limit(20)
  }

  private val fuzzyPairsOracle: String =
    """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
      |CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
      |FROM supplier a JOIN supplier b
      |ON a.s_suppkey < b.s_suppkey
      |AND levenshtein(a.s_name, b.s_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  // quality formula: must stay in lockstep with the docs_quality oracle
  // (ExtensionQueries) and TextAnalysis.qualityOf
  private val qualityCte: String =
    """qf AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |  [x FOR x IN string_split_regex(lower(text), '\s+') IF len(x) > 0]
      |    AS tk,
      |  length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS punct
      |  FROM documents),
      |qg AS (
      |  SELECT doc_id, n_chars, punct, len(tk) AS n_tok,
      |  len([t FOR t IN tk
      |    IF t IN ('the','and','of','to','in','is','a')]) AS stop
      |  FROM qf),
      |qual AS (
      |  SELECT doc_id,
      |  round((least(n_tok / 100.0, 1.0)
      |    + least((CASE WHEN n_tok > 0 THEN stop * 1.0 / n_tok
      |             ELSE 0.0 END) * 5.0, 1.0)
      |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars
      |                    ELSE 0.0 END) * 10.0, 1.0))) / 3.0, 4) AS quality
      |  FROM qg)""".stripMargin

  /** Mutual-argmax bitext mining CTE chain through `mut (sid, tid,
    * cosu, margin)` — shared by the emb_bitext_mutual oracle and the
    * emb_bitext_bleu composition so the two replays cannot drift. */
  private val bitextMutualCtes: String =
    """src AS (SELECT vec_id, embedding FROM embeddings
      |  WHERE label < 5),
      |tgt AS (SELECT vec_id, embedding FROM embeddings
      |  WHERE label >= 5),
      |p AS (SELECT s.vec_id AS sid, t.vec_id AS tid,
      |  CAST(round(list_cosine_similarity(s.embedding::DOUBLE[],
      |    t.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosu
      |  FROM src s CROSS JOIN tgt t),
      |kx AS (SELECT sid, CAST(sum(cosu) AS BIGINT) AS sx FROM (
      |  SELECT sid, cosu, row_number() OVER (PARTITION BY sid
      |    ORDER BY cosu DESC, tid) AS rk FROM p)
      |  WHERE rk <= 4 GROUP BY 1),
      |ky AS (SELECT tid, CAST(sum(cosu) AS BIGINT) AS sy FROM (
      |  SELECT tid, cosu, row_number() OVER (PARTITION BY tid
      |    ORDER BY cosu DESC, sid) AS rk FROM p)
      |  WHERE rk <= 4 GROUP BY 1),
      |m AS (SELECT p.sid, p.tid, p.cosu,
      |  CAST(8 * p.cosu AS DOUBLE) / (kx.sx + ky.sy) AS margin
      |  FROM p JOIN kx USING (sid) JOIN ky USING (tid)),
      |bt AS (SELECT sid, tid FROM (SELECT sid, tid,
      |  row_number() OVER (PARTITION BY sid
      |    ORDER BY margin DESC, tid) AS rk FROM m) WHERE rk = 1),
      |bs AS (SELECT sid, tid FROM (SELECT sid, tid,
      |  row_number() OVER (PARTITION BY tid
      |    ORDER BY margin DESC, sid) AS rk FROM m) WHERE rk = 1),
      |mut AS (SELECT m.sid, m.tid, m.cosu, m.margin
      |  FROM m JOIN bt ON m.sid = bt.sid AND m.tid = bt.tid
      |  JOIN bs ON m.sid = bs.sid AND m.tid = bs.tid)""".stripMargin

  val oracles: Map[String, String] = Map(
    "j_fuzzy_names" -> fuzzyPairsOracle,

    "events_type_overlap" ->
      """WITH tu AS (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
        |  FROM tu GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS inter
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, inter,
        |CAST(sa.nu + sb.nu - inter AS BIGINT) AS union_size,
        |round(CAST(inter AS DOUBLE) / (sa.nu + sb.nu - inter), 6) + 0.0
        |  AS jaccard
        |FROM i JOIN s sa ON i.type_a = sa.event_type
        |JOIN s sb ON i.type_b = sb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    "a_hhi" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS cs
        |  FROM documents GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |CAST(sum(cs) AS BIGINT) AS n_docs,
        |round(CAST(sum(cs * cs) AS DOUBLE) / (sum(cs) * sum(cs)), 6)
        |  + 0.0 AS hhi
        |FROM c""".stripMargin,

    "events_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |  CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        |daily AS (
        |  SELECT fd.cohort_day,
        |  CAST(ev.day - fd.cohort_day AS INT) AS day_offset,
        |  sum(ev.v) AS day_value,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
        |  FROM ev JOIN fd ON ev.user_id = fd.user_id
        |  GROUP BY 1, 2)
        |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset,
        |active_users,
        |CAST(day_value AS VARCHAR) AS day_value,
        |CAST(sum(day_value) OVER (PARTITION BY cohort_day
        |  ORDER BY day_offset ROWS UNBOUNDED PRECEDING) AS VARCHAR)
        |  AS cum_value
        |FROM daily ORDER BY cohort_day, day_offset""".stripMargin,

    "a_contingency" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |  CAST(count(*) AS BIGINT) AS observed
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS rn
        |  FROM orders GROUP BY 1),
        |c AS (SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS cn
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
        |SELECT pri, st, observed,
        |round(CAST(rn AS DOUBLE) * cn / n.n, 4) AS expected,
        |round(pow(observed - CAST(rn AS DOUBLE) * cn / n.n, 2.0)
        |  / (CAST(rn AS DOUBLE) * cn / n.n), 6) + 0.0 AS chi2_contrib
        |FROM cells JOIN r USING (pri) JOIN c USING (st) CROSS JOIN n
        |ORDER BY pri, st""".stripMargin,

    "a_rfm" ->
      """WITH a AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |b AS (
        |  SELECT o_custkey AS custkey,
        |  date_diff('day', max(o_orderdate), (SELECT maxd FROM a))
        |    AS recency_days,
        |  count(*) AS frequency,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1)
        |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |CAST(frequency AS BIGINT) AS frequency,
        |CAST(monetary AS VARCHAR) AS monetary,
        |CAST(ntile(4) OVER (ORDER BY recency_days, custkey) * 100
        | + ntile(4) OVER (ORDER BY frequency DESC, custkey) * 10
        | + ntile(4) OVER (ORDER BY monetary DESC, custkey) AS INT)
        |  AS rfm_code
        |FROM b ORDER BY custkey""".stripMargin,

    // cutpoint scoring replayed with the SAME order-statistic definition:
    // cut_p = min v with cumcount >= ceil(p*n/4); score = 1 + #{cuts < v}
    // (descending dims negate v). list(... ORDER BY ...) keeps the cut
    // order deterministic.
    "a_rfm_cutpoints" ->
      """WITH a AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |b AS (
        |  SELECT o_custkey AS custkey,
        |  CAST(date_diff('day', max(o_orderdate), (SELECT maxd FROM a))
        |    AS BIGINT) AS recency_days,
        |  count(*) AS frequency,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |hr AS (SELECT CAST(recency_days AS DOUBLE) AS v, count(*) AS c
        |  FROM b GROUP BY 1),
        |cr AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
        |  sum(c) OVER () AS n FROM hr),
        |kr AS (SELECT list(cut ORDER BY cut) AS cuts FROM (
        |  SELECT p, min(v) AS cut FROM cr, (SELECT unnest([1,2,3]) AS p)
        |  WHERE cum >= ceil(p * n / 4.0) GROUP BY p)),
        |hf AS (SELECT -CAST(frequency AS DOUBLE) AS v, count(*) AS c
        |  FROM b GROUP BY 1),
        |cf AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
        |  sum(c) OVER () AS n FROM hf),
        |kf AS (SELECT list(cut ORDER BY cut) AS cuts FROM (
        |  SELECT p, min(v) AS cut FROM cf, (SELECT unnest([1,2,3]) AS p)
        |  WHERE cum >= ceil(p * n / 4.0) GROUP BY p)),
        |hm AS (SELECT -CAST(monetary AS DOUBLE) AS v, count(*) AS c
        |  FROM b GROUP BY 1),
        |cm AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
        |  sum(c) OVER () AS n FROM hm),
        |km AS (SELECT list(cut ORDER BY cut) AS cuts FROM (
        |  SELECT p, min(v) AS cut FROM cm, (SELECT unnest([1,2,3]) AS p)
        |  WHERE cum >= ceil(p * n / 4.0) GROUP BY p))
        |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |CAST(frequency AS BIGINT) AS frequency,
        |CAST(monetary AS VARCHAR) AS monetary,
        |CAST(
        |  (1 + len([c FOR c IN kr.cuts
        |    IF CAST(recency_days AS DOUBLE) > c])) * 100
        |  + (1 + len([c FOR c IN kf.cuts
        |    IF -CAST(frequency AS DOUBLE) > c])) * 10
        |  + (1 + len([c FOR c IN km.cuts
        |    IF -CAST(monetary AS DOUBLE) > c])) AS INT) AS rfm_code
        |FROM b, kr, kf, km ORDER BY custkey""".stripMargin,

    "basket_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT l_partkey, count(*) AS c FROM op GROUP BY 1),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  count(*) AS c_ab
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b,
        |ca.c AS c_a, cb.c AS c_b, CAST(c_ab AS BIGINT) AS c_ab,
        |CAST(c_ab AS DOUBLE) / ca.c AS confidence,
        |CAST(n.n * c_ab AS DOUBLE) / (ca.c * cb.c) AS lift
        |FROM pairs
        |JOIN pc ca ON ca.l_partkey = part_a
        |JOIN pc cb ON cb.l_partkey = part_b, n
        |ORDER BY lift DESC, part_a, part_b""".stripMargin,

    "events_pareto" ->
      """WITH pu AS (
        |  SELECT event_type, user_id,
        |  sum(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, sv,
        |  row_number() OVER w AS rk,
        |  sum(sv) OVER (w ROWS UNBOUNDED PRECEDING) AS csum,
        |  sum(sv) OVER (PARTITION BY event_type) AS total,
        |  count(*) OVER (PARTITION BY event_type) AS nu
        |  FROM pu
        |  WINDOW w AS (PARTITION BY event_type ORDER BY sv DESC, user_id))
        |SELECT event_type, CAST(max(nu) AS BIGINT) AS n_users,
        |CAST(min(rk) AS INT) AS users_to_80pct,
        |round(CAST(min(rk) AS DOUBLE) / max(nu), 4) AS pareto_ratio
        |FROM r
        |WHERE CAST(csum AS DOUBLE) >= CAST(total AS DOUBLE) * 0.8
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "a_benford" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice
        |    / pow(10.0, floor(log10(o_totalprice)))) AS INT) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed
        |  FROM b GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        |SELECT digit, observed,
        |round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected_p,
        |round(pow(observed - n.n * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2.0)
        |  / (n.n * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6) + 0.0
        |  AS chi2_contrib
        |FROM c CROSS JOIN n ORDER BY digit""".stripMargin,

    "a_mutual_info" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |ms AS (SELECT source, CAST(count(*) AS BIGINT) AS cs
        |  FROM documents GROUP BY 1),
        |ml AS (SELECT lang, CAST(count(*) AS BIGINT) AS cl
        |  FROM documents GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |terms AS (
        |  SELECT n.n,
        |  CAST(round(c * ln(CAST(c AS DOUBLE) * n.n
        |    / (CAST(cs AS DOUBLE) * CAST(cl AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS tm
        |  FROM cells JOIN ms USING (source) JOIN ml USING (lang)
        |  CROSS JOIN n)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
        |round(CAST(sum(tm) AS DOUBLE) / (n * 1e6), 6) + 0.0 AS mi_nats
        |FROM terms GROUP BY n""".stripMargin,

    "dq_k_anonymity" ->
      """SELECT lang, source,
        |CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket,
        |CAST(count(*) AS BIGINT) AS group_size
        |FROM documents GROUP BY 1, 2, 3
        |HAVING count(*) < 5
        |ORDER BY lang, source, len_bucket""".stripMargin,

    "a_spearman" ->
      s"""WITH $qualityCte,
        |j AS (
        |  SELECT d.doc_id, d.source, d.n_chars, q.quality
        |  FROM documents d JOIN qual q ON d.doc_id = q.doc_id),
        |rx AS (
        |  SELECT doc_id, source,
        |  (CAST(min(rn) OVER (PARTITION BY source, n_chars) AS DOUBLE)
        |   + CAST(max(rn) OVER (PARTITION BY source, n_chars) AS DOUBLE))
        |    / 2.0 AS rx
        |  FROM (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn FROM j)),
        |ry AS (
        |  SELECT doc_id,
        |  (CAST(min(rn) OVER (PARTITION BY source, quality) AS DOUBLE)
        |   + CAST(max(rn) OVER (PARTITION BY source, quality) AS DOUBLE))
        |    / 2.0 AS ry
        |  FROM (SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY quality, doc_id) AS rn FROM j)),
        |g AS (
        |  SELECT rx.source, rx.rx, ry.ry
        |  FROM rx JOIN ry ON rx.doc_id = ry.doc_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |round((count(*) * sum(rx * ry) - sum(rx) * sum(ry)) /
        |  (sqrt(count(*) * sum(rx * rx) - sum(rx) * sum(rx)) *
        |   sqrt(count(*) * sum(ry * ry) - sum(ry) * sum(ry))), 6) + 0.0
        |  AS spearman
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,

    "j_fuzzy_linkage" ->
      """SELECT a.s_suppkey AS left_id, b.s_suppkey AS right_id,
        |CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b
        |ON a.s_suppkey % 2 = 0 AND b.s_suppkey % 2 = 1
        |AND levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY left_id, right_id""".stripMargin,

    "vocab_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest([x FOR x IN string_split_regex(lower(text), '\s+')
        |    IF len(x) > 0]) AS w
        |  FROM documents),
        |prs AS (
        |  SELECT w[i] AS sym_l, w[i+1] AS sym_r
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i
        |        FROM toks WHERE len(w) >= 2))
        |SELECT sym_l, sym_r, count(*) AS cnt FROM prs
        |GROUP BY 1, 2 ORDER BY cnt DESC, sym_l, sym_r LIMIT 20""".stripMargin,

    "vocab_bpe_roundtrip" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS word_pos,
        |CAST(NULL AS VARCHAR) AS word, CAST(NULL AS VARCHAR) AS rebuilt
        |WHERE FALSE""".stripMargin,

    "vocab_unigram_roundtrip" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS word_pos,
        |CAST(NULL AS VARCHAR) AS word, CAST(NULL AS VARCHAR) AS rebuilt
        |WHERE FALSE""".stripMargin,

    // DigestGate constants (EM/Viterbi-defined output, deterministic —
    // captured per SF, each pin stability-checked across 4-way and
    // 32-way partitionings; exact sf0.001 pieces pinned in
    // UnigramLmSpec). Keyed by lineitem count — see DigestGate.oracleBySf.
    "vocab_unigram_top" ->
      DigestGate.oracleBySf(Map(
        6000L -> ("15884332258909225579", 20L),
        60000L -> ("1297060967614641321", 20L),
        600000L -> ("-15378278869380654775", 20L))),

    // the vocab literal is interpolated from WpVocab — one source of
    // truth for both engines. Greedy longest-match-first = at each
    // (word, pos) take the unique piece with no longer match (NOT
    // EXISTS), so each CTE row has exactly one successor.
    "vocab_wordpiece_encode" ->
      raw"""WITH RECURSIVE
        |v AS (SELECT piece,
        |  CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
        |       ELSE piece END AS txt,
        |  (piece LIKE '##%') AS cont,
        |  len(CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
        |      ELSE piece END) AS tl
        |  FROM (SELECT unnest([${WpVocab.map("'" + _ + "'").mkString(", ")}])
        |        AS piece)),
        |words AS (SELECT DISTINCT word FROM (
        |  SELECT unnest([x FOR x IN string_split_regex(lower(text), '\s+')
        |    IF len(x) > 0]) AS word FROM documents)
        |  WHERE regexp_full_match(word, '[a-z]+')),
        |step(word, pos, pieces, np) AS (
        |  SELECT word, 1, CAST('' AS VARCHAR), 0 FROM words
        |  UNION ALL
        |  SELECT st.word, st.pos + v.tl,
        |    CASE WHEN st.pieces = '' THEN v.piece
        |         ELSE st.pieces || ' ' || v.piece END,
        |    st.np + 1
        |  FROM step st JOIN v ON v.cont = (st.pos > 1)
        |    AND st.pos <= len(st.word)
        |    AND substr(st.word, st.pos, v.tl) = v.txt
        |    AND NOT EXISTS (SELECT 1 FROM v v2
        |      WHERE v2.cont = (st.pos > 1) AND v2.tl > v.tl
        |        AND substr(st.word, st.pos, v2.tl) = v2.txt))
        |SELECT word, pieces, CAST(np AS INT) AS n_pieces FROM step
        |WHERE pos = len(word) + 1 ORDER BY word""".stripMargin,

    "vocab_wordpiece_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS word,
        |CAST(NULL AS VARCHAR) AS pieces, CAST(NULL AS VARCHAR) AS rebuilt
        |WHERE FALSE""".stripMargin,

    "docs_postings" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(tk) AS term,
        |  unnest(range(0, len(tk))) AS pos
        |  FROM (SELECT doc_id,
        |        [x FOR x IN string_split_regex(lower(text), '\s+')
        |          IF len(x) > 0] AS tk
        |        FROM documents)),
        |bydf AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |top AS (SELECT term, df FROM bydf ORDER BY df DESC, term LIMIT 10)
        |SELECT t.term, top.df, t.doc_id, CAST(t.pos AS INT) AS pos
        |FROM toks t JOIN top ON t.term = top.term
        |ORDER BY t.term, t.doc_id, pos""".stripMargin,

    "sample_weighted_priority" ->
      """WITH p AS (
        |  SELECT doc_id, source, text || '|' || doc_id AS k,
        |  round(pow(
        |    (('0x' || substr(md5(text || '|' || doc_id), 1, 12))::BIGINT
        |      + 1) / 281474976710657.0,
        |    1.0 / ((n_chars + 1) / 200.0)), 6) AS priority
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, priority,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY priority DESC, k) AS rk
        |  FROM p)
        |SELECT doc_id, source, priority FROM r WHERE rk <= 5
        |ORDER BY doc_id""".stripMargin,

    "docs_keyword_hits" ->
      """WITH kws AS (
        |  SELECT unnest(['hash','join','sort','spark','window']) AS keyword)
        |SELECT doc_id, keyword,
        |CAST(len(string_split(lower(text), keyword)) - 1 AS INT) AS hits
        |FROM documents, kws
        |WHERE len(string_split(lower(text), keyword)) - 1 > 0
        |ORDER BY doc_id, keyword""".stripMargin,

    "events_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "docs_pmi_pairs" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest([x FOR x IN
        |    string_split_regex(lower(text), '\s+') IF len(x) > 0]) AS term
        |  FROM documents),
        |v AS (SELECT term, count(*) AS df FROM toks GROUP BY 1
        |  ORDER BY df DESC, term LIMIT 100),
        |vt AS (SELECT t.doc_id, t.term, v.df FROM toks t
        |  JOIN v ON t.term = v.term),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |p AS (
        |  SELECT a.term AS term_a, b.term AS term_b,
        |  a.df AS df_a, b.df AS df_b, count(*) AS df_ab
        |  FROM vt a JOIN vt b
        |    ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
        |SELECT term_a, term_b, df_a, df_b,
        |CAST(df_ab AS BIGINT) AS df_ab,
        |round(ln(CAST(df_ab AS DOUBLE) * CAST(n.n AS DOUBLE)
        |  / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE))), 6) AS pmi
        |FROM p, n
        |ORDER BY pmi DESC, term_a, term_b LIMIT 50""".stripMargin,

    // NO fp round(): half-up rounding done in exact HUGEINT arithmetic
    // (micro = (2·10⁶·num + den) // (2·den), num = 2·iwx − (n+1)·total ≥ 0,
    // den = n·total), then one exact int→DOUBLE conversion — the identical
    // integer discipline as graft.operators.TextAnalysis.giniByGroup, so
    // both engines produce bit-equal doubles regardless of their
    // round(DOUBLE, d) half-boundary semantics.
    "source_gini" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars AS x,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS i
        |  FROM documents),
        |g AS (SELECT source, count(*) AS n, sum(x) AS total,
        |  sum(i * x) AS iwx FROM r GROUP BY 1)
        |SELECT source, n, CAST(total AS BIGINT) AS total,
        |CASE WHEN total > 0 THEN
        |  CAST((2 * 1000000::HUGEINT * (2*iwx - (n+1)*total)::HUGEINT
        |        + (n::HUGEINT * total::HUGEINT))
        |       // (2 * n::HUGEINT * total::HUGEINT) AS DOUBLE) / 1000000.0
        |ELSE 0.0 END AS gini
        |FROM g ORDER BY source""".stripMargin,

    "events_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |  row_number() OVER w AS rn,
        |  lag(event_type) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, ts, event_type,
        |  row_number() OVER w2 AS version,
        |  lead(ts) OVER w2 AS valid_to
        |  FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(version AS INT) AS version,
        |event_type AS attr,
        |strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |valid_to IS NULL AS is_current
        |FROM c ORDER BY user_id, version""".stripMargin,

    "j_asof_nearest" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |CASE WHEN c.ts IS NULL THEN NULL
        |     WHEN c.ts <= p.ts THEN 'b' ELSE 'f' END AS dir,
        |round(c.click_value, 4) AS click_value
        |FROM purch p LEFT JOIN LATERAL (
        |  SELECT ts, click_value FROM clicks c
        |  WHERE c.user_id = p.user_id
        |  ORDER BY abs(epoch(p.ts) - epoch(c.ts)), c.ts LIMIT 1) c ON TRUE
        |ORDER BY p.event_id""".stripMargin,

    "pref_pairs" ->
      """WITH best AS (
        |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS s,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS pair_rank
        |  FROM documents),
        |worst AS (
        |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS s,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY CAST(n_chars AS DOUBLE) ASC, doc_id) AS pair_rank
        |  FROM documents)
        |SELECT b.source, CAST(b.pair_rank AS INT) AS pair_rank,
        |b.doc_id AS chosen_id, w.doc_id AS rejected_id,
        |round(b.s - w.s, 4) AS margin
        |FROM best b JOIN worst w
        |  ON b.source = w.source AND b.pair_rank = w.pair_rank
        |WHERE b.pair_rank <= 3 AND b.doc_id <> w.doc_id AND b.s > w.s
        |ORDER BY b.source, b.pair_rank""".stripMargin,

    "labels_majority" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS votes
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, votes,
        |  sum(votes) OVER (PARTITION BY user_id) AS total,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY votes DESC, event_type) AS rk
        |  FROM c)
        |SELECT user_id, event_type, votes, CAST(total AS BIGINT) AS total,
        |round(CAST(votes AS DOUBLE) / total, 4) AS agreement
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "j_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT s_suppkey AS id, s_name AS s,
        |  substr(s_name, 1, 4) AS k FROM supplier),
        |rk AS (
        |  SELECT id, s, row_number() OVER (ORDER BY k, id) AS rn FROM r)
        |SELECT a.id AS id_a, b.id AS id_b,
        |CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 5
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "labels_kappa" ->
      """WITH c AS (
        |  SELECT user_id, event_id % 2 = 0 AS rater, event_type,
        |  count(*) AS votes
        |  FROM events GROUP BY 1, 2, 3),
        |pr AS (
        |  SELECT user_id, rater, event_type FROM (
        |    SELECT user_id, rater, event_type,
        |    row_number() OVER (PARTITION BY user_id, rater
        |      ORDER BY votes DESC, event_type) AS rk
        |    FROM c) WHERE rk = 1),
        |paired AS (
        |  SELECT user_id,
        |  min(CASE WHEN rater THEN event_type END) AS la,
        |  min(CASE WHEN NOT rater THEN event_type END) AS lb
        |  FROM pr GROUP BY 1 HAVING count(*) = 2),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_agree
        |  FROM paired),
        |m AS (
        |  SELECT CAST(sum(coalesce(ca, 0) * coalesce(cb, 0)) AS BIGINT)
        |    AS crossm
        |  FROM (SELECT la AS l, count(*) AS ca FROM paired GROUP BY 1) a
        |  FULL OUTER JOIN
        |    (SELECT lb AS l, count(*) AS cb FROM paired GROUP BY 1) b
        |  USING (l))
        |SELECT n_items, n_agree,
        |round(CAST(n_agree AS DOUBLE) / n_items, 6) AS po,
        |round(CAST(crossm AS DOUBLE) / (n_items * n_items), 6) AS pe,
        |round(CASE WHEN crossm = n_items * n_items THEN 0.0
        |  ELSE (CAST(n_agree AS DOUBLE) / n_items
        |    - CAST(crossm AS DOUBLE) / (n_items * n_items))
        |    / (1.0 - CAST(crossm AS DOUBLE) / (n_items * n_items))
        |  END, 6) + 0.0 AS kappa
        |FROM agg, m""".stripMargin,

    "sft_transcripts" ->
      """SELECT user_id, CAST(count(*) AS INT) AS n_turns,
        |string_agg(event_type || '#' || event_id, chr(10)
        |  ORDER BY ts, event_id) AS transcript
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "vocab_oov_rate" ->
      """WITH toks AS (
        |  SELECT source, unnest([x FOR x IN
        |    string_split_regex(lower(text), '\s+') IF len(x) > 0]) AS term
        |  FROM documents),
        |v AS (SELECT term FROM toks GROUP BY term
        |  ORDER BY count(*) DESC, term LIMIT 1000)
        |SELECT t.source, count(*) AS n_tokens,
        |CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_oov,
        |round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |  AS DOUBLE) / count(*), 6) AS oov_rate
        |FROM toks t LEFT JOIN v ON t.term = v.term
        |GROUP BY t.source ORDER BY t.source""".stripMargin,

    "dq_report" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem),
        |v AS (
        |  SELECT 'foreign_key:l_orderkey' AS check,
        |  (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_orderkey = l.l_orderkey)) AS violations
        |  UNION ALL
        |  SELECT 'in_range:l_discount',
        |  (SELECT count(*) FROM lineitem WHERE l_discount IS NULL
        |    OR CAST(l_discount AS DOUBLE) < 0.0
        |    OR CAST(l_discount AS DOUBLE) > 0.1)
        |  UNION ALL
        |  SELECT 'in_range:l_quantity',
        |  (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL
        |    OR CAST(l_quantity AS DOUBLE) < 1.0
        |    OR CAST(l_quantity AS DOUBLE) > 49.0)
        |  UNION ALL
        |  SELECT 'matches:l_returnflag',
        |  (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL
        |    OR NOT regexp_matches(l_returnflag, '^[ANR]$'))
        |  UNION ALL
        |  SELECT 'not_null:l_orderkey',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber',
        |  (SELECT coalesce(sum(n - 1), 0) FROM (
        |    SELECT count(*) AS n FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber)))
        |SELECT v.check, CAST(v.violations AS BIGINT) AS violations,
        |t.total, v.violations = 0 AS pass
        |FROM v, t ORDER BY v.check""".stripMargin,

    "snapshot_diff" ->
      """WITH before AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events WHERE event_id % 2 = 0) WHERE rk = 1),
        |after AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT coalesce(b.user_id, a.user_id) AS user_id,
        |CASE WHEN b.user_id IS NULL THEN 'added'
        |     WHEN a.user_id IS NULL THEN 'removed'
        |     ELSE 'changed' END AS status,
        |CASE WHEN b.user_id IS NULL OR a.user_id IS NULL THEN ''
        |ELSE array_to_string([x FOR x IN [
        |  CASE WHEN b.event_type IS DISTINCT FROM a.event_type
        |    THEN 'event_type' END,
        |  CASE WHEN b.value IS DISTINCT FROM a.value THEN 'value' END]
        |  IF x IS NOT NULL], ',') END AS changed
        |FROM before b FULL OUTER JOIN after a ON b.user_id = a.user_id
        |WHERE b.user_id IS NULL OR a.user_id IS NULL
        |  OR b.event_type IS DISTINCT FROM a.event_type
        |  OR b.value IS DISTINCT FROM a.value
        |ORDER BY user_id""".stripMargin,

    "events_rolling_actives" ->
      """WITH acts AS (
        |  SELECT DISTINCT user_id AS u,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        |  FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM acts),
        |c AS (SELECT u, unnest(range(day, day + 7)) AS day_w FROM acts)
        |SELECT CAST(c.day_w AS BIGINT) AS day,
        |count(DISTINCT c.u) AS actives
        |FROM c, b WHERE c.day_w BETWEEN b.lo AND b.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "docs_ks_drift" ->
      """WITH pts AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |  sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS da,
        |  sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS db
        |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
        |c AS (
        |  SELECT v, sum(da) OVER w AS ca, sum(db) OVER w AS cb
        |  FROM pts WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(da) AS BIGINT) AS n_a,
        |  CAST(sum(db) AS BIGINT) AS n_b FROM pts)
        |SELECT t.n_a, t.n_b,
        |round(CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
        |  CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS DOUBLE)
        |    / CAST(t.n_a * t.n_b AS DOUBLE) END, 6) AS ks
        |FROM c, t GROUP BY t.n_a, t.n_b""".stripMargin,

    "docs_term_entropy" ->
      """WITH toks AS (
        |  SELECT source, unnest([x FOR x IN
        |    string_split_regex(lower(text), '\s+') IF len(x) > 0]) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
        |m AS (SELECT source, c,
        |  CAST(round(c * ln(c) * 1e6) AS BIGINT) AS clogc FROM tc),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(clogc) AS BIGINT) AS s_micro FROM m GROUP BY 1)
        |SELECT source, n_tokens, n_terms,
        |round(ln(n_tokens) - CAST(s_micro AS DOUBLE)
        |  / (CAST(n_tokens AS DOUBLE) * 1e6), 6) + 0.0 AS entropy
        |FROM g ORDER BY source""".stripMargin,

    "docs_chi2_drift" ->
      """WITH counts AS (
        |  SELECT lang AS category,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cur,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ref
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_cur) AS BIGINT) AS t_cur,
        |  CAST(sum(n_ref) AS BIGINT) AS t_ref FROM counts)
        |SELECT category, n_cur, n_ref,
        |round(CAST(t.t_cur * (n_cur + n_ref) AS DOUBLE)
        |  / CAST(t.t_cur + t.t_ref AS DOUBLE), 6) AS e_cur,
        |round((CAST(n_cur AS DOUBLE)
        |    - CAST(t.t_cur * (n_cur + n_ref) AS DOUBLE)
        |      / CAST(t.t_cur + t.t_ref AS DOUBLE))
        |  * (CAST(n_cur AS DOUBLE)
        |    - CAST(t.t_cur * (n_cur + n_ref) AS DOUBLE)
        |      / CAST(t.t_cur + t.t_ref AS DOUBLE))
        |  / (CAST(t.t_cur * (n_cur + n_ref) AS DOUBLE)
        |    / CAST(t.t_cur + t.t_ref AS DOUBLE)), 6) AS contrib_cur,
        |round((CAST(n_ref AS DOUBLE)
        |    - CAST(t.t_ref * (n_cur + n_ref) AS DOUBLE)
        |      / CAST(t.t_cur + t.t_ref AS DOUBLE))
        |  * (CAST(n_ref AS DOUBLE)
        |    - CAST(t.t_ref * (n_cur + n_ref) AS DOUBLE)
        |      / CAST(t.t_cur + t.t_ref AS DOUBLE))
        |  / (CAST(t.t_ref * (n_cur + n_ref) AS DOUBLE)
        |    / CAST(t.t_cur + t.t_ref AS DOUBLE)), 6) AS contrib_ref
        |FROM counts, t ORDER BY category""".stripMargin,

    "events_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |  count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |  CAST(sum(day) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
        |  CAST(sum(day * day) AS BIGINT) AS sxx,
        |  CAST(sum(day * cnt) AS BIGINT) AS sxy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n,
        |round(CASE WHEN n * sxx - sx * sx > 0 THEN
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS slope,
        |round(CASE WHEN n * sxx - sx * sx > 0 THEN
        |  (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) END, 6) AS intercept
        |FROM a ORDER BY event_type""".stripMargin,

    "a_winsorized_mean" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag, quantile_cont(q, 0.1) AS p10,
        |  quantile_cont(q, 0.9) AS p90
        |  FROM li GROUP BY 1)
        |SELECT li.l_returnflag, count(*) AS n,
        |round(avg(least(greatest(li.q, b.p10), b.p90)), 6) AS wmean
        |FROM li JOIN b ON li.l_returnflag = b.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j_fuzzy_dl" ->
      """SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        |CAST(damerau_levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE damerau_levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand, key_a, key_b""".stripMargin,

    "j_fuzzy_jw" ->
      """SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        |jaro_winkler_similarity(a.p_name, b.p_name) AS sim
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
        |ORDER BY a.p_brand, key_a, key_b""".stripMargin,

    "sample_interleave" ->
      """WITH s AS (
        |  SELECT source,
        |  CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS si,
        |  CAST(count(*) OVER () AS BIGINT) AS ns
        |  FROM (SELECT DISTINCT source FROM documents)),
        |r AS (
        |  SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents)
        |SELECT CAST((r.rk - 1) * s.ns + s.si AS BIGINT) AS pos,
        |r.source, r.doc_id
        |FROM r JOIN s ON r.source = s.source
        |ORDER BY pos LIMIT 500""".stripMargin,

    "events_twap" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us,
        |  CAST(value AS DOUBLE) AS v FROM events),
        |w AS (SELECT event_type, us, event_id, v,
        |  lead(us) OVER o - us AS dur
        |  FROM e WINDOW o AS (
        |    PARTITION BY event_type ORDER BY us, event_id)),
        |r AS (SELECT event_type, dur,
        |  sum(v * dur) OVER o2 AS num,
        |  sum(dur) OVER o2 AS den,
        |  count(*) OVER o2 AS n
        |  FROM w WINDOW o2 AS (
        |    PARTITION BY event_type ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, CAST(n AS BIGINT) AS n_points,
        |CAST(den AS BIGINT) AS span_us,
        |round(CASE WHEN den > 0 THEN num / den END, 6) AS twap
        |FROM r WHERE dur IS NULL ORDER BY event_type""".stripMargin,

    "events_decayed_value" ->
      """WITH t0 AS (
        |  SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t0 FROM events),
        |c AS (
        |  SELECT user_id,
        |  CAST(round(value * pow(2.0,
        |    -CAST(t0.t0 - epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |    * 1e6) AS BIGINT) AS cm
        |  FROM events CROSS JOIN t0)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |round(CAST(sum(cm) AS DOUBLE) / 1e6, 6) + 0.0 AS decayed_value
        |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin,

    "events_ewma" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |rr AS (
        |  SELECT event_type, day, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rk
        |  FROM daily),
        |e AS (
        |  SELECT event_type, day, x, rk, x AS s FROM rr WHERE rk = 1
        |  UNION ALL
        |  SELECT rr.event_type, rr.day, rr.x, rr.rk,
        |  0.25 * rr.x + 0.75 * e.s
        |  FROM rr JOIN e ON rr.event_type = e.event_type
        |    AND rr.rk = e.rk + 1)
        |SELECT event_type, day, x AS n, round(s, 6) AS ewma
        |FROM e ORDER BY event_type, day""".stripMargin,

    "events_gapfill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |    AS hour_ts FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |counts AS (
        |  SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        |  count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT strftime(h.hour_ts, '%Y-%m-%d %H:%M') AS hour,
        |t.event_type AS event_type, coalesce(c.n, 0) AS n
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN counts c
        |  ON c.hour_ts = h.hour_ts AND c.event_type = t.event_type
        |ORDER BY hour, t.event_type""".stripMargin,

    "sync_bucket_diff" ->
      """WITH l AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |    ::BIGINT % 16 AS bucket,
        |  count(*) AS left_cnt,
        |  bit_xor(('0x' || substr(md5(md5(CAST(doc_id AS VARCHAR))
        |    || md5(text)), 1, 12))::BIGINT) AS left_check
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |    ::BIGINT % 16 AS bucket,
        |  count(*) AS right_cnt,
        |  bit_xor(('0x' || substr(md5(md5(CAST(doc_id AS VARCHAR))
        |    || md5(text)), 1, 12))::BIGINT) AS right_check
        |  FROM documents WHERE doc_id % 97 <> 0 GROUP BY 1)
        |SELECT CAST(bucket AS INT) AS bucket, left_cnt, right_cnt,
        |left_check, right_check
        |FROM l FULL OUTER JOIN r USING (bucket)
        |WHERE left_cnt IS NULL OR right_cnt IS NULL
        |  OR left_cnt <> right_cnt OR left_check <> right_check
        |ORDER BY bucket""".stripMargin,

    "cdc_apply_delta" ->
      """WITH base AS (
        |  SELECT user_id, event_type, event_id, ts, value FROM (
        |    SELECT user_id, event_type, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rk = 1),
        |latest AS (
        |  SELECT user_id, event_type, event_id, ts, value,
        |  CASE WHEN value < 50 THEN 'D' ELSE 'U' END AS op FROM (
        |    SELECT user_id, event_type, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rk = 1),
        |merged AS (
        |  SELECT b.user_id, b.event_type, b.event_id, b.ts, b.value
        |  FROM base b ANTI JOIN latest d
        |    ON b.user_id = d.user_id AND b.event_type = d.event_type
        |  UNION ALL
        |  SELECT user_id, event_type, event_id, ts, value
        |  FROM latest WHERE op <> 'D')
        |SELECT user_id, event_type, event_id,
        |strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |round(value, 4) AS value
        |FROM merged ORDER BY user_id, event_type""".stripMargin,

    "emb_mean_pool" ->
      """WITH ex AS (
        |  SELECT label,
        |  CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |  unnest(embedding::DOUBLE[]) AS x
        |  FROM embeddings)
        |SELECT label, count(*) AS n, pos, round(avg(x), 6) AS x
        |FROM ex GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,

    "emb_bitext_margin" ->
      """WITH src AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE label < 5),
        |tgt AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE label >= 5),
        |p AS (SELECT s.vec_id AS sid, t.vec_id AS tid,
        |  CAST(round(list_cosine_similarity(s.embedding::DOUBLE[],
        |    t.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosu
        |  FROM src s CROSS JOIN tgt t),
        |kx AS (SELECT sid, CAST(sum(cosu) AS BIGINT) AS sx FROM (
        |  SELECT sid, cosu, row_number() OVER (PARTITION BY sid
        |    ORDER BY cosu DESC, tid) AS rk FROM p)
        |  WHERE rk <= 4 GROUP BY 1),
        |ky AS (SELECT tid, CAST(sum(cosu) AS BIGINT) AS sy FROM (
        |  SELECT tid, cosu, row_number() OVER (PARTITION BY tid
        |    ORDER BY cosu DESC, sid) AS rk FROM p)
        |  WHERE rk <= 4 GROUP BY 1),
        |m AS (SELECT p.sid, p.tid, p.cosu, kx.sx + ky.sy AS den,
        |  CAST(8 * p.cosu AS DOUBLE) / (kx.sx + ky.sy) AS margin
        |  FROM p JOIN kx USING (sid) JOIN ky USING (tid))
        |SELECT sid AS src_id, tid AS tgt_id, cosu AS cos_micro, margin
        |FROM m WHERE cosu > 0 AND den > 0 AND margin > 1.2
        |ORDER BY src_id, tgt_id""".stripMargin,

    "emb_bitext_cells" ->
      """WITH sc AS (SELECT vec_id, embedding,
        |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |   + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |   + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS cell
        |  FROM embeddings WHERE label < 5),
        |tc AS (SELECT vec_id, embedding,
        |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |   + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |   + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS cell
        |  FROM embeddings WHERE label >= 5),
        |p AS (SELECT s.vec_id AS sid, t.vec_id AS tid,
        |  CAST(round(list_cosine_similarity(s.embedding::DOUBLE[],
        |    t.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosu
        |  FROM sc s JOIN tc t ON s.cell = t.cell),
        |kx AS (SELECT sid, CAST(sum(cosu) AS BIGINT) AS sx FROM (
        |  SELECT sid, cosu, row_number() OVER (PARTITION BY sid
        |    ORDER BY cosu DESC, tid) AS rk FROM p)
        |  WHERE rk <= 4 GROUP BY 1),
        |ky AS (SELECT tid, CAST(sum(cosu) AS BIGINT) AS sy FROM (
        |  SELECT tid, cosu, row_number() OVER (PARTITION BY tid
        |    ORDER BY cosu DESC, sid) AS rk FROM p)
        |  WHERE rk <= 4 GROUP BY 1),
        |m AS (SELECT p.sid, p.tid, p.cosu, kx.sx + ky.sy AS den,
        |  CAST(8 * p.cosu AS DOUBLE) / (kx.sx + ky.sy) AS margin
        |  FROM p JOIN kx USING (sid) JOIN ky USING (tid))
        |SELECT sid AS src_id, tid AS tgt_id, cosu AS cos_micro, margin
        |FROM m WHERE cosu > 0 AND den > 0 AND margin > 1.2
        |ORDER BY src_id, tgt_id""".stripMargin,

    "emb_bitext_cells_audit" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind,
        |CAST(NULL AS BIGINT) AS src_id, CAST(NULL AS BIGINT) AS tgt_id,
        |CAST(NULL AS DOUBLE) AS margin_exact,
        |CAST(NULL AS DOUBLE) AS margin_cells
        |WHERE FALSE""".stripMargin,

    "emb_bitext_mutual" -> (s"WITH $bitextMutualCtes\n" +
      """SELECT sid AS src_id, tid AS tgt_id, cosu AS cos_micro, margin
        |FROM mut ORDER BY src_id""".stripMargin),

    "emb_bitext_bleu" -> WebQueries.bleuOracleSql(
      s"""$bitextMutualCtes,
        |bpairs AS (SELECT sid AS ref_id, tid AS cand_id FROM mut)"""
        .stripMargin),

    "emb_centroid_drift" ->
      """WITH ex AS (
        |  SELECT CAST(label AS VARCHAR) AS seg,
        |  CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |  unnest(embedding::DOUBLE[]) AS x
        |  FROM embeddings),
        |s AS (SELECT seg, pos,
        |  CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS HUGEINT) AS sv
        |  FROM ex GROUP BY 1, 2),
        |n AS (SELECT seg, CAST(count(*) AS BIGINT) AS n
        |  FROM ex WHERE pos = 0 GROUP BY 1),
        |pr AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
        |  sum(a.sv * b.sv) AS dot
        |  FROM s a JOIN s b ON a.pos = b.pos AND a.seg < b.seg
        |  GROUP BY 1, 2),
        |nm AS (SELECT seg, sum(sv * sv) AS n2 FROM s GROUP BY 1)
        |SELECT pr.seg_a, pr.seg_b, na.n AS n_a, nb.n AS n_b,
        |CASE WHEN va.n2 = 0 OR vb.n2 = 0 THEN 0.0
        |ELSE CAST(pr.dot AS DOUBLE) /
        |  (sqrt(CAST(va.n2 AS DOUBLE)) * sqrt(CAST(vb.n2 AS DOUBLE)))
        |END AS cos_centroid
        |FROM pr JOIN n na ON pr.seg_a = na.seg
        |JOIN n nb ON pr.seg_b = nb.seg
        |JOIN nm va ON pr.seg_a = va.seg
        |JOIN nm vb ON pr.seg_b = vb.seg
        |ORDER BY seg_a, seg_b""".stripMargin,

    "j_interval_two_table" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts) / 3600) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts) / 3600) AS BIGINT) + event_id % 5 AS e
        |  FROM events)
        |SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id
        |FROM iv a JOIN iv b
        |ON a.user_id = b.user_id
        |AND a.event_type = 'view' AND b.event_type = 'click'
        |AND a.s <= b.e AND b.s <= a.e
        |ORDER BY a.user_id, left_id, right_id""".stripMargin,

    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
        |  AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |AND o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "events_share" ->
      """WITH a AS (
        |  SELECT event_type,
        |  sum(CAST(value AS DECIMAL(18,2))) AS sv FROM events GROUP BY 1)
        |SELECT event_type, CAST(sv AS DOUBLE) AS sum_value,
        |CAST(sv AS DOUBLE) / CAST(sum(sv) OVER () AS DOUBLE) AS share
        |FROM a ORDER BY event_type""".stripMargin,

    "emb_project_rerank" ->
      """SELECT CAST(NULL AS INT) AS rank,
        |CAST(NULL AS DOUBLE) AS rerank_score,
        |CAST(NULL AS DOUBLE) AS exact_score WHERE FALSE""".stripMargin,

    "emb_random_project" ->
      """WITH ex AS (
        |  SELECT vec_id, i, j, x FROM (
        |    SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    unnest(embedding::DOUBLE[]) AS x
        |    FROM embeddings), range(16) t(j))
        |SELECT vec_id, CAST(j AS INT) AS j,
        |round(sum(x * (CASE WHEN
        |  ('0x' || substr(md5(i || '_' || j), 1, 4))::INT % 2 = 0
        |  THEN 1.0 ELSE -1.0 END)) / 4.0, 4) + 0.0 AS x
        |FROM ex GROUP BY vec_id, j
        |ORDER BY vec_id, j""".stripMargin,

    "agg_incremental" ->
      """SELECT user_id, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_session_window" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS sid
        |  FROM lagged)
        |SELECT user_id,
        |strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |  AS session_end,
        |count(*) AS n_events, round(sum(value), 4) AS session_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "docs_normalize" ->
      """SELECT doc_id,
        |trim(regexp_replace(strip_accents(lower(text)), '\s+', ' ', 'g'))
        |  AS normalized
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_tokenize_pack" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |  [x FOR x IN string_split_regex(lower(text), '\s+') IF len(x) > 0]
        |    AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, CAST(unnest(range(len(t))) AS INT) AS pos,
        |  unnest(t) AS term FROM tk),
        |tf0 AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (
        |  SELECT term, CAST(sum(c) AS BIGINT) AS tf_total, count(*) AS df
        |  FROM tf0 GROUP BY 1),
        |vocab AS (
        |  SELECT term,
        |  CAST(row_number() OVER (ORDER BY tf_total DESC, term) - 1 AS INT)
        |    AS vocab_id
        |  FROM agg ORDER BY tf_total DESC, term LIMIT 20)
        |SELECT t.doc_id, CAST(t.pos // 16 AS INT) AS seq_id,
        |CAST(t.pos % 16 AS INT) AS pos_in_seq,
        |coalesce(v.vocab_id, -1) AS token_id
        |FROM toks t LEFT JOIN vocab v USING (term)
        |ORDER BY doc_id, seq_id, pos_in_seq""".stripMargin,

    "dedup_apply_best" ->
      s"""WITH RECURSIVE ${ExtensionQueries.ngramPairCtes},
        |pairs AS (
        |  SELECT ida AS a, idb AS b FROM common
        |  JOIN sizes sa ON ida = sa.doc_id
        |  JOIN sizes sb ON idb = sb.doc_id
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |$qualityCte,
        |ranked AS (
        |  SELECT c.id,
        |  row_number() OVER (PARTITION BY c.comp
        |    ORDER BY q.quality DESC, c.id) AS rk
        |  FROM comp c JOIN qual q ON c.id = q.doc_id),
        |losers AS (SELECT id FROM ranked WHERE rk > 1)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin
  )
}
