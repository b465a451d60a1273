package graft.operators

import graft.functions.VectorFunctions.cosineSimilarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, the
  * LASER/CCMatrix parallel-corpus construction recipe): a source/target
  * embedding pair is a translation candidate when its cosine stands out
  * against BOTH sides' typical neighborhoods —
  * margin(x, y) = cos(x, y) / ((avgₖNN(x) + avgₖNN(y)) / 2) —
  * which suppresses hubs that score high against everything. The
  * training-data op that mines aligned pairs out of two monolingual
  * corpora.
  *
  * Exactness discipline: cosines quantize to integer micro-units
  * in-plan (ONE round per pair); per-side k-NN sums are exact BIGINTs;
  * the margin is a single division of two exact integers —
  * 2k·cosµ(x,y) / (Σₖxµ + Σₖyµ) — so the emitted double and the
  * threshold comparison are identical on any engine replaying the same
  * integers.
  *
  * Scale shape: this is the exact all-pairs form (candidate generation
  * at 100 TB goes through the IVF/LSH candidate paths —
  * [[IvfIndex]]/[[Dedup]] — exactly like the other similarity
  * operators; the margin formula is unchanged, only the candidate set
  * shrinks). The two k-NN sums are per-side window ranks over the pair
  * table; every stage is keyed by src or tgt id, ids+integers only in
  * the shuffles. */
object Bitext {

  /** k-NN sums + margin over an arbitrary (sid, tid, cos_micro)
    * candidate-pair table — shared by the exact (crossJoin), k-means-cell
    * and sign-cell candidate generators. The per-side top-k sums use the
    * map-side-combinable [[graft.functions.TopKSum]] aggregator, NOT a
    * row_number window: the window form exchanges and sorts the ENTIRE
    * pair table once per side (at 100 TB the pair table is the single
    * biggest intermediate in this operator), while the aggregator
    * collapses every map partition to one k-slot buffer per id before
    * anything shuffles — the sums (and so the margins) are identical
    * because the sum of the top-k multiset does not depend on how ties
    * break. */
  private def marginOverPairs(pairs: DataFrame, k: Int): DataFrame = {
    // Materialize the candidate-pair table ONCE (r16 plan audit): it is
    // consumed by three plan branches (the sid-side k-NN sum, the
    // tid-side k-NN sum, and the join probe), and Catalyst recomputes a
    // DataFrame subtree per consumer — so the UNmaterialized form paid
    // the candidate generator (cross join + 64-dim cosine, the dominant
    // cost) three times per margin table. At 100 TB the pair table is
    // the operator's single biggest intermediate; production writes it
    // once between stages and fans consumers out from the artifact —
    // the eager localCheckpoint is the single-process stand-in, and its
    // known post-materialization size lets AQE pick the join strategy
    // for the two sum-tables from real bytes instead of estimates.
    val p = pairs.localCheckpoint()
    val kx = p.groupBy(col("sid"))
      .agg(graft.functions.TopKSum.topKSum(col("cos_micro"), k).as("sx"))
    val ky = p.groupBy(col("tid"))
      .agg(graft.functions.TopKSum.topKSum(col("cos_micro"), k).as("sy"))
    p
      .join(kx, "sid").join(ky, "tid")
      .withColumn("margin",
        (col("cos_micro") * (2L * k)).cast("double") /
          (col("sx") + col("sy")))
  }

  /** The shared MINING step over a margin table: the regime gate
    * (cos > 0 ∧ positive denominator — see [[marginPairs]]' scaladoc
    * for why both degeneracies must be excluded) + the threshold + the
    * output projection. ONE source of truth for all three candidate
    * generators, and the block every miner oracle replays. */
  private def mine(margins: DataFrame, minMargin: Double): DataFrame =
    margins
      .filter(col("cos_micro") > 0 && (col("sx") + col("sy")) > 0 &&
        col("margin") > minMargin)
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("cos_micro"), col("margin"))

  /** The full margin table: (sid, tid, cos_micro, margin) for every
    * cross pair — shared by the threshold and mutual-argmax miners. */
  private def marginTable(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // Spread the STREAM side before the broadcast cross join (r16): a
    // dimension-sized parquet source arrives as one input split, and the
    // cosine Project runs in the cross join's own stage — so without the
    // repartition the entire |S|·|T| cosine compute serialized onto ONE
    // core. (r15 recorded spread-on-bitext as net-negative, but that was
    // measured on the UNmaterialized form, where the repartition exchange
    // was itself re-evaluated three times per margin table; with the
    // pair table checkpointed once the spread is paid once and the
    // cosine stage parallelizes cleanly — re-measured this round.)
    val s = Dedup.spread(src.select(col(idCol).cast("long").as("sid"),
      col(vecCol).as("sv")))
    val t = tgt.select(col(idCol).cast("long").as("tid"),
      col(vecCol).as("tv"))
    val pairs = s.crossJoin(broadcast(t))
      .select(col("sid"), col("tid"),
        round(cosineSimilarity(col("sv"), col("tv")) * 1000000)
          .cast("long").as("cos_micro"))
    marginOverPairs(pairs, k)
  }

  /** All (src, tgt) pairs with margin > `minMargin`, with the
    * micro-unit cosine and the exact-integer-derived margin.
    * Output: (src_id, tgt_id, cos_micro, margin).
    *
    * Mining REGIME gate (not just the threshold): the margin ratio is
    * only meaningful where cosine and both k-NN sums are positive —
    * with mixed-sign cosines, (sx + sy) can cancel to 0 (an Infinity
    * margin that would sail over any threshold) or go negative (the
    * ratio's sign flips, so a NEGATIVE-cosine pair can score a large
    * positive margin). Both degeneracies are outside Artetxe-Schwenk
    * semantics, so the miner filters to cos > 0 ∧ (sx + sy) > 0 before
    * thresholding; the oracle replays the same predicate. */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.2): DataFrame =
    mine(marginTable(src, tgt, idCol, vecCol, k), minMargin)

  /** Mutual-argmax mining (the CCMatrix selection rule): keep (x, y)
    * iff y is x's best margin AND x is y's best margin — the
    * high-precision form, one candidate per aligned sentence instead
    * of a threshold cloud. Argmax ordering is (margin DESC, id):
    * margins are identical doubles on any engine replaying the same
    * integers (single-division argument above), so the argmax — and
    * therefore the mined set — is engine-independent even at fp
    * near-ties; exactly-equal margins break by id. */
  /** The SCALE form: candidates restricted to (src, tgt) pairs sharing
    * an IVF cell — centroids fit on the UNION of both corpora so the
    * cell structure is shared, the cross join is per-cell (Σ cellₛ·cellₜ
    * instead of |S|·|T|), and margins compute over CANDIDATE
    * neighborhoods. The bias is one-directional IN THE MINING REGIME
    * (cos > 0 and positive neighborhood sums — every margin above any
    * threshold ≥ 1 lives there): candidate k-NN sums are subsets of the
    * exact sums (a full-set top-k maximizes the sum over any superset),
    * so the denominator only shrinks and a candidate margin is ≥ its
    * exact margin — an exact-mined pair whose cell co-locates it is
    * candidate-mined, never silently lost. (For NEGATIVE cosines the
    * direction inverts — irrelevant to mining, but the
    * `emb_bitext_cells_audit` scopes its invariants to the positive
    * regime for exactly this reason.) Same output contract as
    * [[marginPairs]]. */
  def marginPairsCells(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.2,
      ncells: Int = 16, seed: Long = 42L): DataFrame = {
    val union = src.select(col(idCol), col(vecCol))
      .unionByName(tgt.select(col(idCol), col(vecCol)))
    val centroids = SimilaritySearch.computeCentroids(union, vecCol,
      ncells, seed)
    val s = SimilaritySearch.assignCells(src, idCol, vecCol, centroids)
      .select(col(idCol).cast("long").as("sid"), col("v").as("sv"),
        col("cell"))
    val t = SimilaritySearch.assignCells(tgt, idCol, vecCol, centroids)
      .select(col(idCol).cast("long").as("tid"), col("v").as("tv"),
        col("cell"))
    val pairs = s.join(t, "cell")
      .select(col("sid"), col("tid"),
        round(cosineSimilarity(col("sv"), col("tv")) * 1000000)
          .cast("long").as("cos_micro"))
    // same mining-regime gate as [[marginPairs]] — the dominance
    // argument above only holds there anyway
    mine(marginOverPairs(pairs, k), minMargin)
  }

  /** Cell-restricted mining with ORACLE-REPLAYABLE cells: cell = the
    * `bits` sign bits of the vector's leading coordinates (bit i set ⟺
    * v[i] ≥ 0) — hyperplane LSH for cosine with the BASIS vectors as
    * hyperplanes, so an engine-blind referee can recompute every cell
    * from the data. Same candidate/margin semantics as
    * [[marginPairsCells]] (per-cell cross join, candidate-neighborhood
    * k-NN sums, mining-regime gate); at production scale the hyperplanes
    * would be random Gaussians ([[Dedup.simhashPairs]]' family) and the
    * cell table an IVF-style persisted index — the basis-aligned choice
    * changes WHICH cells form, not the operator's shape.
    *
    * Why this exists next to the k-means form: a recall-1
    * cells-equal-exact gate (the dedup_apply_lsh pattern) needs a
    * similarity GAP between true pairs and background, and the synthetic
    * embeddings have none (near-uniform cosines) — no data-dependent
    * partition co-locates every mined pair. So the driver gate pins the
    * cell-restricted SEMANTICS end-to-end with a FULL-VALUE oracle (the
    * stronger check available), while `emb_bitext_cells_audit` pins the
    * k-means form's dominance/recall laws against the exact miner. */
  def marginPairsSignCells(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.2,
      bits: Int = 3): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    def cellOf(v: Column): Column =
      (0 until bits).map { i =>
        when(element_at(v, i + 1).cast("double") >= 0, lit(1 << i))
          .otherwise(lit(0))
      }.reduce(_ + _)
    val s = src.select(col(idCol).cast("long").as("sid"),
      col(vecCol).as("sv"), cellOf(col(vecCol)).as("cell"))
    val t = tgt.select(col(idCol).cast("long").as("tid"),
      col(vecCol).as("tv"), cellOf(col(vecCol)).as("cell"))
    val pairs = s.join(t, "cell")
      .select(col("sid"), col("tid"),
        round(cosineSimilarity(col("sv"), col("tv")) * 1000000)
          .cast("long").as("cos_micro"))
    mine(marginOverPairs(pairs, k), minMargin)
  }

  /** NOTE (r14 review): the argmax ranks the RAW margin table — outside
    * the mining regime a degenerate pair (cos_micro and both k-NN sums
    * all 0, e.g. orthogonal-everything synthetic data) divides 0/0 to
    * NaN, which Spark's DESC order ranks FIRST. The oracle replays the
    * identical ordering (DuckDB also sorts NaN above all), so the
    * contract is engine-consistent; callers mining real embeddings are
    * in the positive regime where the case cannot arise. */
  def mutualTopPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame = {
    // r16 plan rewrite — same mined set, computed as two ARGMAX
    // AGGREGATIONS instead of two row_number windows plus two join-backs
    // against the full margin table. The window form exchanged AND
    // sorted the entire pair table once per side, then shuffled it twice
    // more to recover (cos_micro, margin) for the survivors; the
    // aggregate form collapses every map partition to one best-candidate
    // buffer per id before anything shuffles (partial aggregation), and
    // the payload rides IN the aggregate, so nothing joins back.
    //
    // Equivalence to `row_number().over(orderBy(desc(margin), id)) = 1`:
    // max(struct(margin, -id, …)) compares margin first with Spark's
    // SQL double ordering — the SAME total order the window sort uses
    // (NaN greatest, -0.0 = 0.0) — and breaks exact-margin ties by the
    // SMALLEST id via the negated second field. Ids are non-negative
    // longs (cast in marginTable), so the negation cannot overflow.
    // Fields after the (margin, -id) key are payload only: (sid, tid)
    // is unique in the pair table, so two candidates can never compare
    // equal through the key.
    val m = marginTable(src, tgt, idCol, vecCol, k).localCheckpoint()
    val bestT = m.groupBy(col("sid"))
      .agg(max(struct(col("margin"), (-col("tid")).as("ntid"),
        col("cos_micro"))).as("b"))
      .select(col("sid"), (-col("b.ntid")).as("tid"),
        col("b.cos_micro").as("cos_micro"), col("b.margin").as("margin"))
    val bestS = m.groupBy(col("tid"))
      .agg(max(struct(col("margin"), (-col("sid")).as("nsid"))).as("b"))
      .select((-col("b.nsid")).as("sid"), col("tid"))
    bestT.join(bestS, Seq("sid", "tid"))
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("cos_micro"), col("margin"))
  }

  /** BLEU-2 quality scoring over an aligned pair table (Papineni et al.
    * 2002) — the surface-overlap quality gate mined bitext goes through
    * before training (CCMatrix filters its mined pairs; a cand/ref BLEU
    * over the pair table is that filter's text leg). Per (ref, cand)
    * pair: clipped modified n-gram precisions
    * pₙ = Σ_g min(cnt_cand(g), cnt_ref(g)) / #cand-n-grams for n = 1, 2,
    * combined as √(p₁·p₂) with a LINEAR brevity penalty
    * min(1, |cand|/|ref|) instead of the exponential
    * exp(1 − r/c): every op in the linear form (min, ·, /, √) is
    * IEEE-correctly-rounded, so the score replays bit-identically on any
    * engine — `exp` is only faithfully rounded and may differ in the
    * last ulp between libms, which would flake a full-value gate. The
    * deviation only REorders pairs with c < r (both penalties are 1
    * otherwise, and both are monotone in c/r), and is documented as part
    * of the score's contract.
    *
    * Input: `pairs` with (ref_id, cand_id); `docs` with (idCol, textCol).
    * Pairs whose candidate has < 2 tokens (no bigram) are dropped —
    * BLEU-2 is undefined there, stated in the contract. Output:
    * (ref_id, cand_id, t1, m1, t2, m2, bleu2) with exact BIGINT counts
    * and the score rounded to `decimals`.
    *
    * Scale shape: texts join to the pair table by id ONCE per side; the
    * clipped-count intersection runs at (pair, distinct gram) grain via
    * one inner join of the two sides' per-doc gram-count tables (grams
    * absent from either side contribute 0 — inner is exact); all
    * aggregations are map-side-combinable integer sums keyed by the
    * pair. No windows, no driver state. */
  def bleuPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, decimals: Int = 6): DataFrame = {
    // distinct: a caller passing a duplicated pair row would otherwise
    // double the clipped counts through the gram joins AND emit duplicate
    // output rows (ADVICE r10). One (long, long)-grain shuffle over the
    // pair table — dimension-sized next to the gram joins it protects.
    // Materialized once (r16): the pair table feeds four plan branches
    // (two clipped-count joins, the totals join, and the id prefilter
    // below), and each unmaterialized consumer re-evaluated the caller's
    // entire upstream miner — for emb_bitext_bleu that was the whole
    // mutual-argmax chain, several times over.
    val base = pairs.select(col("ref_id").cast("long").as("ref_id"),
      col("cand_id").cast("long").as("cand_id")).distinct()
      .localCheckpoint()
    // Prefilter (r16, the guide's semi-join/Bloom pre-filter shape):
    // only docs that appear in the pair table can survive any join
    // below — every consumer keys on cand_id/ref_id drawn from `base` —
    // so restrict the tokenized corpus BEFORE the n-gram explode. At
    // corpus scale the gram table over ALL docs is this operator's
    // biggest intermediate while mined pair sets touch a tiny fraction
    // of the corpus; the semi-join on the exact id set (not a Bloom
    // filter) keeps the result provably identical.
    val ids = base.select(explode(array(col("ref_id"), col("cand_id")))
      .as("id")).distinct()
    val toks = docs.select(col(idCol).cast("long").as("id"),
        split(col(textCol), " ").as("ws"))
      .join(ids, Seq("id"), "left_semi")
      .localCheckpoint()
    // per-doc n-gram multiplicity tables, n = 1, 2 (packed with ,
    // the house gram separator — corpus text never contains it)
    def gramCounts(n: Int) = toks
      .filter(size(col("ws")) >= n)
      .select(col("id"), explode(transform(
          sequence(lit(0), size(col("ws")) - n),
          i => concat_ws("", slice(col("ws"), i + 1, lit(n))))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
    val lens = toks.select(col("id"), size(col("ws")).as("len"))
    def clipped(n: Int) = {
      val gc = gramCounts(n)
      base
        .join(gc.select(col("id").as("cand_id"), col("g"),
          col("c").as("cc")), Seq("cand_id"))
        .join(gc.select(col("id").as("ref_id"), col("g"),
          col("c").as("rc")), Seq("ref_id", "g"))
        .groupBy(col("ref_id"), col("cand_id"))
        .agg(sum(least(col("cc"), col("rc"))).as(s"m$n"))
    }
    val totals = base
      .join(lens.select(col("id").as("cand_id"),
        col("len").as("c_len")), Seq("cand_id"))
      .join(lens.select(col("id").as("ref_id"),
        col("len").as("r_len")), Seq("ref_id"))
      .filter(col("c_len") >= 2)
      .select(col("ref_id"), col("cand_id"), col("c_len"), col("r_len"),
        col("c_len").cast("long").as("t1"),
        (col("c_len") - 1).cast("long").as("t2"))
    totals
      .join(clipped(1), Seq("ref_id", "cand_id"), "left")
      .join(clipped(2), Seq("ref_id", "cand_id"), "left")
      .select(col("ref_id"), col("cand_id"), col("t1"),
        coalesce(col("m1"), lit(0L)).as("m1"), col("t2"),
        coalesce(col("m2"), lit(0L)).as("m2"),
        (round(
          sqrt((coalesce(col("m1"), lit(0L)).cast("double") / col("t1")) *
            (coalesce(col("m2"), lit(0L)).cast("double") / col("t2"))) *
            least(lit(1.0),
              col("c_len").cast("double") / col("r_len")),
          decimals) + lit(0.0)).as("bleu2"))
  }
}
