package graft.queries

import graft.operators.{Bpe, Dedup, FuzzyJoin, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Data-curation operators added in round 5: edit-distance record linkage
  * (recall-1 deletion-neighborhood blocking), distributed BPE tokenizer
  * training, inverted-index postings, and the quality-policy dedup action.
  * Same contract as the other query modules: every entry value-checks
  * against a DuckDB oracle. */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

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
      rebuilt.join(words, Seq("doc_id", "word_pos"))
        .filter(col("rebuilt") =!= col("word"))
        .select(col("doc_id"), col("word_pos"), col("word"), col("rebuilt"))
        .orderBy(col("doc_id"), col("word_pos"))
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

    // ── dedup ACTION, quality policy: per near-dup cluster keep the
    //    highest-quality member (ties → smallest id) instead of the
    //    smallest id — "keep the best copy". Oracle re-derives clusters
    //    (recursive CTE) AND the quality scores, so policy + signal are
    //    checked together. ─────────────────────────────────────────────────
    "dedup_apply_best" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      val weights = TextAnalysis.qualityFrame(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      Dedup.dropNearDuplicatesBest(docs, "doc_id", pairs, weights, "quality")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    })
  )

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

  val oracles: Map[String, String] = Map(
    "j_fuzzy_names" -> fuzzyPairsOracle,

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
