package graft

import graft.operators.{Decontaminate, Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TrainingDataOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0 until n)
    .map(i => (i.toLong, s"documento exemplo número $i com palavras variadas tema${i % 9}"))
    .toDF("id", "text")

  test("hashSplit: deterministic, content-keyed, fractions ~80/10/10") {
    val d = docs(2000)
    val a = Sampling.hashSplit(d, col("text")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1/256 quantization → generous tolerance at n=2000.
    assert(math.abs(a("train") / 2000.0 - 0.8) < 0.05, a.toString)
    assert(math.abs(a("val") / 2000.0 - 0.1) < 0.04, a.toString)
    assert(math.abs(a("test") / 2000.0 - 0.1) < 0.04, a.toString)
    // re-run == same assignment, row by row.
    val run1 = Sampling.hashSplit(d, col("text"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    val run2 = Sampling.hashSplit(d.repartition(7), col("text"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(run1.toMap === run2.toMap)
    // identical content can never straddle splits (dedup-safety).
    val dup = Seq((1L, "mesmo texto"), (2L, "mesmo texto")).toDF("id", "text")
    assert(Sampling.hashSplit(dup, col("text"))
      .select("split").distinct().count() === 1)
  }

  test("hashSplit/deterministicSample: frac-sum-1.0 boundary (threshold " +
      "256 must cover every bucket, not format as 3-char hex)") {
    val d = docs(2000)
    // trainFrac + valFrac == 1.0 → NO test rows, val ≈ 10%.
    val b = Sampling.hashSplit(d, col("text"), trainFrac = 0.9,
        valFrac = 0.1).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!b.contains("test"), b.toString)
    assert(math.abs(b("val") / 2000.0 - 0.1) < 0.04, b.toString)
    // frac = 1.0 keeps EVERY row.
    assert(Sampling.deterministicSample(d, col("text"), 1.0).count() === 2000)
    // frac = 0.0 keeps none.
    assert(Sampling.deterministicSample(d, col("text"), 0.0).count() === 0)
  }

  test("unimaxAllocation: hand-computed caps + redistribution; " +
      "tokenBudgetSampleBy admits the md5-order prefix per group") {
    // groups: a=10 tokens, b=40, c=200. budget=120, maxEpochs=2.
    // ascending (a, b, c): a → min(cap 20, share 120/3=40) = 20, rem 100;
    // b → min(cap 80, share 100/2=50) = 50, rem 50;
    // c → min(cap 400, share 50) = 50.
    val d = (0 until 25).map { i =>
      val (g, tok) = if (i < 5) ("a", 2L) else if (i < 13) ("b", 5L)
                     else ("c", 200L / 12 + (if (i < 21) 1 else 0))
      (i.toLong, g, tok)
    }.toDF("id", "grp", "n_tokens")
    val totals = d.groupBy("grp").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val alloc = Sampling.unimaxAllocation(d, "grp", col("n_tokens"),
        budget = 120L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(alloc("a") === ((totals("a"), 2L * totals("a"))))  // epoch-capped
    val remAfterA = 120L - 2L * totals("a")
    val bAlloc = math.min(2L * totals("b"), remAfterA / 2)
    assert(alloc("b") === ((totals("b"), bAlloc)))
    assert(alloc("c") === ((totals("c"), remAfterA - bAlloc))) // share-bound
    assert(alloc.values.map(_._2).sum <= 120L)
    // apply side: admitted tokens per group never exceed alloc, admitted
    // set is the exact md5-order prefix, and a group absent from the
    // budgets frame admits nothing.
    val budgets = Sampling.unimaxAllocation(d, "grp", col("n_tokens"),
      budget = 60L, maxEpochs = 1)
    val admitted = Sampling.tokenBudgetSampleBy(d, "grp",
      col("id").cast("string"), col("n_tokens"), budgets)
    val admTok = admitted.groupBy("grp").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ballocs = budgets.collect().map(r => r.getString(0) -> r.getLong(2))
      .toMap
    admTok.foreach { case (g, tok) => assert(tok <= ballocs(g), g) }
    // prefix property: every admitted id hashes BEFORE every dropped id
    // within its group (md5 order).
    val byHash = d.withColumn("h", md5(col("id").cast("string")))
      .select("grp", "id", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val admIds = admitted.select("id").collect().map(_.getLong(0)).toSet
    byHash.groupBy(_._1).foreach { case (g, rows) =>
      val sortedIds = rows.sortBy(r => (r._3, r._2)).map(_._2)
      val k = sortedIds.count(admIds)
      assert(sortedIds.take(k).forall(admIds), s"group $g not a prefix")
      assert(sortedIds.drop(k).forall(!admIds(_)), s"group $g not a prefix")
    }
    assert(Sampling.tokenBudgetSampleBy(d, "grp", col("id").cast("string"),
      col("n_tokens"), budgets.filter(col("grp") =!= "c")).filter(
      col("grp") === "c").count() === 0)
    intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(d, "grp", col("n_tokens"), -1L, 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(d, "grp", col("n_tokens"), 10L, 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSampleBy(d.withColumn("_cum", lit(1)), "grp",
        col("id").cast("string"), col("n_tokens"), budgets)
    }
  }

  test("sqrtTemperatureAllocation: hand-computed Hamilton apportionment; " +
      "zero-weight groups excluded from the leftover; isqrt exact") {
    // precisionDigits=0: weights isqrt(16)=4, isqrt(4)=2, isqrt(0)=0;
    // Z=6, budget 10 → bases 40//6=6, 20//6=3, 0 (rems 4, 2, 0);
    // leftover 1 goes to the largest remainder (a).
    val d = Seq((1L, "a", 16L), (2L, "b", 4L), (3L, "c", 0L))
      .toDF("id", "grp", "n_tokens")
    val got = Sampling.sqrtTemperatureAllocation(d, "grp",
        col("n_tokens"), budget = 10L, precisionDigits = 0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map("a" -> ((16L, 7L)), "b" -> ((4L, 3L)),
      "c" -> ((0L, 0L))))
    // default precision: Σ alloc = budget exactly, monotone in tokens
    val d2 = Seq((1L, "a", 100L), (2L, "b", 900L), (3L, "c", 2500L))
      .toDF("id", "grp", "n_tokens")
    val a2 = Sampling.sqrtTemperatureAllocation(d2, "grp",
        col("n_tokens"), budget = 12345L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a2.values.sum === 12345L)
    assert(a2("a") < a2("b") && a2("b") < a2("c"))
    // √ flattening: small group's share exceeds its token share
    assert(a2("a").toDouble / 12345 > 100.0 / 3500)
    // isqrt: exact at perfect squares, boundaries, and huge magnitudes
    assert(Sampling.isqrt(BigInt(0)) === BigInt(0))
    val big = BigInt("123456789123456789")
    assert(Sampling.isqrt(big * big) === big)
    assert(Sampling.isqrt(big * big - 1) === big - 1)
    assert(Sampling.isqrt(big * big + 1) === big)
    intercept[IllegalArgumentException] {
      Sampling.sqrtTemperatureAllocation(d, "grp", col("n_tokens"), -1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.sqrtTemperatureAllocation(d, "grp", col("n_tokens"), 1L,
        precisionDigits = 19)
    }
  }

  test("freshnessSample: fresh rows all kept, decayed rows match an " +
      "independent md5 threshold check, future rows kept") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = (0 until 200).map { i =>
      val ts = i % 4 match {
        case 0 => "2024-01-30 12:00:00" // age 2d  → shift 0
        case 1 => "2023-12-20 12:00:00" // age 43d → shift 6
        case 2 => "2024-02-05 12:00:00" // future  → shift 0
        case _ => "2023-11-01 12:00:00" // age 92d → shift 13
      }
      (i.toLong, ts)
    }
    val d = rows.toDF("id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val kept = Sampling.freshnessSample(d, col("id").cast("string"),
        col("ts"), anchorDate = "2024-02-01", halflifeDays = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    // shift-0 rows (fresh + future) all survive
    rows.filter(r => r._1 % 4 == 0 || r._1 % 4 == 2)
      .foreach(r => assert(kept(r._1), s"fresh row ${r._1} dropped"))
    // decayed rows: survival must equal the hex-threshold rule exactly
    val thr = Map(6 -> "%05x".format(1L << 14), 13 -> "%05x".format(1L << 7))
    rows.filter(r => r._1 % 4 == 1 || r._1 % 4 == 3).foreach { r =>
      val shift = if (r._1 % 4 == 1) 6 else 13
      val expect = md5hex(r._1.toString).substring(0, 5) < thr(shift)
      assert(kept(r._1) === expect, s"row ${r._1} shift $shift")
    }
    intercept[IllegalArgumentException] {
      Sampling.freshnessSample(d, col("id").cast("string"), col("ts"),
        "2024-02-01", halflifeDays = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.freshnessSample(d, col("id").cast("string"), col("ts"),
        "2024-02-01", halflifeDays = 7, maxShift = 21)
    }
    // a NULL timestamp fails LOUDLY instead of silently vanishing
    intercept[Exception] {
      Sampling.freshnessSample(
        Seq((1L, null: String)).toDF("id", "ts_s")
          .withColumn("ts", to_timestamp(col("ts_s"))),
        col("id").cast("string"), col("ts"),
        "2024-02-01", halflifeDays = 7).collect()
    }
  }

  test("working/output column guards: every sampler that writes a " +
      "column refuses an input that already has it (withColumn would " +
      "silently overwrite and then drop the caller's data)") {
    val d = Seq((1L, "a", "x", 5L)).toDF("id", "grp", "text", "tok")
    def boom(f: => Any): Unit =
      intercept[IllegalArgumentException](f)
    boom(Sampling.kFold(d.withColumn("fold", lit(9)), col("text"), 5))
    boom(Sampling.hashSplit(d.withColumn("split", lit("x")), col("text")))
    boom(Sampling.perGroupSample(d.withColumn("_rk", lit(1)), "grp",
      col("text"), 2))
    boom(Sampling.tokenBudgetSample(d.withColumn("_cum", lit(1)), "grp",
      col("text"), col("tok"), 10L))
    boom(Sampling.stratifiedSplit(d.withColumn("_n", lit(1)), "grp",
      col("text")))
    boom(Sampling.weightedMixByCol(d.withColumn("copy_id", lit(1)),
      col("text"), lit(1.5)))
    boom(Sampling.interleaveRoundRobin(
      d.withColumnRenamed("id", "_rk"), "grp", "_rk"))
  }

  test("leakageSafeSplit: chained near-dup clusters land whole in one " +
      "split; unpaired docs keep their own-id split; guards fire") {
    val d = docs(40)
    // two explicit clusters: a 4-doc chain 0-1-2-3 and a pair 10-11
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(d, "id", pairs)
    val byId = split.select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size === 40)
    assert(Set(byId(0L), byId(1L), byId(2L), byId(3L)).size === 1)
    assert(byId(10L) === byId(11L))
    // unpaired docs split exactly as a plain own-id hashSplit would
    val plain = Sampling.hashSplit(d, col("id").cast("string"))
      .select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 40).map(_.toLong)
      .filterNot(Set(0L, 1L, 2L, 3L, 10L, 11L))
      .foreach(i => assert(byId(i) === plain(i), s"id=$i"))
    // clusters adopt the MIN id's key
    assert(byId(0L) === plain(0L))
    assert(byId(10L) === plain(10L))
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(split, "id", pairs) // already has 'split'
    }
  }

  test("weightedMix: floor copies + hash-keyed fractional copy, " +
      "deterministic across layouts") {
    val d = (0 until 900).map(i => (i.toLong, s"grp${i % 3}", s"texto $i"))
      .toDF("id", "grp", "text")
    val mixed = Sampling.weightedMix(d, "grp", col("text"),
      Map("grp0" -> 3.0, "grp1" -> 0.5, "grp2" -> 1.3))
    val counts = mixed.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // integer weight → EXACT multiplicity; fractional → ±1/256 quantized.
    assert(counts("grp0") === 900L) // 300 × 3 exactly
    assert(math.abs(counts("grp1") / 300.0 - 0.5) < 0.1, counts.toString)
    assert(math.abs(counts("grp2") / 300.0 - 1.3) < 0.1, counts.toString)
    // every kept row's copy_ids are dense 1..n.
    val perRow = mixed.groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mixed.select("id", "copy_id").collect().foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= perRow(r.getLong(0)))
    }
    // layout-independent (retry/engine determinism).
    val again = Sampling.weightedMix(d.repartition(13), "grp", col("text"),
        Map("grp0" -> 3.0, "grp1" -> 0.5, "grp2" -> 1.3))
      .select("id", "copy_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(again === mixed.select("id", "copy_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted)
  }

  test("perGroupSample: exactly n per group, stable across layouts") {
    val d = (0 until 300).map(i => (i.toLong, s"grp${i % 5}", s"texto $i"))
      .toDF("id", "grp", "text")
    val s1 = Sampling.perGroupSample(d, "grp", col("text"), 4)
    assert(s1.groupBy("grp").count().collect()
      .forall(_.getLong(1) === 4L))
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.perGroupSample(d.repartition(11), "grp",
      col("text"), 4).select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("packSequences: equals the global-window formulation; straddle and " +
    "zero-token docs handled") {
    val d = Seq((1L, 100L), (2L, 500L), (3L, 0L), (4L, 1200L), (5L, 1L))
      .toDF("id", "tok")
    val packed = Packing.packSequences(d, "id", "tok", Seq("id"), seqLen = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap // id -> (start_seq, end_seq)
    // cum: 100, 600, 600, 1800, 1801
    assert(packed(1L) === (0L, 0L))   // tokens 0..99
    assert(packed(2L) === (0L, 1L))   // 100..599 straddles seq 0→1
    assert(packed(3L) === (1L, 1L))   // zero-token pins at position 600
    assert(packed(4L) === (1L, 3L))   // 600..1799 spans seqs 1..3
    assert(packed(5L) === (3L, 3L))   // 1800
    assert(Packing.sequenceCount(
      Packing.packSequences(d, "id", "tok", Seq("id"), 512), 512) === 4L)

    // against the naive window form on a larger frame.
    val big = (0 until 500).map(i => (i.toLong, (i * 37 % 700).toLong))
      .toDF("id", "tok")
    val scale = Packing.packSequences(big, "id", "tok", Seq("id"), 512)
      .select("id", "start_seq", "end_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = big.withColumn("cum", sum(col("tok")).over(w))
      .select(col("id"), ((col("cum") - col("tok")) / 512).cast("long")
          .as("start_seq"),
        when(col("tok") === 0, ((col("cum") - col("tok")) / 512).cast("long"))
          .otherwise(((col("cum") - 1) / 512).cast("long")).as("end_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scale === naive)
  }

  test("decontaminate: planted contamination flagged; clean docs survive") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over a sleepy cat today"), // 5 shared trigrams
      (2L, "completely unrelated text about spark query planning"),
      (3L, "the quick brown fox jumps over the lazy dog verbatim copy here")
    ).toDF("id", "text")
    val flagged = Decontaminate.overlaps(corpus, "id", "text",
        bench, "id", "text", n = 3, minOverlap = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 3L))
    val clean = Decontaminate.removeContaminated(corpus, "id", "text",
      bench, "id", "text", n = 3, minOverlap = 4)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("repetition counts: duplicated lines and dominant bigrams") {
    import TextAnalysis.repetitionCountsOf
    // 4 lines, one duplicate; "spam ham" bigram appears 3×, 7 bigrams total.
    val t = "spam ham spam ham spam ham again\nline two\nline two\nend"
    val (nl, dl, nb, tc) = repetitionCountsOf(t)
    assert(nl === 4L && dl === 3L)
    // tokens: spam ham spam ham spam ham again | line two | line two | end
    assert(nb === 11L)
    assert(tc === 3L) // "ham spam" = 2, "spam ham" = 3
    assert(repetitionCountsOf("") === ((1L, 1L, 0L, 0L)))
    assert(repetitionCountsOf("solo") === ((1L, 1L, 0L, 0L)))
  }

  test("scrub: urls, emails, digit runs collapse to placeholders in order") {
    val d = Seq((1L,
      "contact me@example.com or https://a.example.com/p?x=12 room 42")
    ).toDF("id", "text")
    val got = d.select(TextAnalysis.scrub(col("text"))).first().getString(0)
    assert(got === "contact <email> or <url> room <num>")
  }

  test("stratifiedSplit: exact floor(n*frac) per stratum, deterministic " +
      "across layouts") {
    val d = (0 until 37).map(i => (i.toLong, s"s${i % 3}", s"text $i"))
      .toSeq.toDF("id", "stratum", "text")
    val out = Sampling.stratifiedSplit(d, "stratum",
      concat_ws("|", col("text"), col("id")), trainFrac = 0.8)
    val counts = out.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // strata sizes: s0=13, s1=12, s2=12 -> train 10, 9, 9 exactly.
    assert(counts(("s0", "train")) === 10L && counts(("s0", "test")) === 3L)
    assert(counts(("s1", "train")) === 9L && counts(("s1", "test")) === 3L)
    assert(counts(("s2", "train")) === 9L && counts(("s2", "test")) === 3L)
    val a = out.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.stratifiedSplit(d.repartition(11), "stratum",
        concat_ws("|", col("text"), col("id")), trainFrac = 0.8)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("slidingChunks: full coverage, overlap = size - stride, clamped tail") {
    import graft.functions.TextFunctions
    val text = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    val d = Seq(Tuple1(text)).toDF("text")
    val chunks = d.select(TextFunctions.slidingChunks(col("text"), 10, 6))
      .first().getSeq[String](0)
    // starts 0,6,12,18,26(clamped from 24? no: ceil((36-10)/6)+1 = 6 chunks;
    // starts 0,6,12,18,24,26 (last clamps to len-size=26).
    assert(chunks.length === 6)
    assert(chunks.head === text.substring(0, 10))
    assert(chunks(4) === text.substring(24, 34))
    assert(chunks.last === text.substring(26, 36))
    // chunk i is exactly text.substring(start_i, start_i + size) for the
    // expected clamped starts — consecutive overlap falls out (>= 4 chars)
    val starts = Seq(0, 6, 12, 18, 24, 26)
    chunks.zip(starts).foreach { case (c, st) =>
      assert(c === text.substring(st, st + 10))
    }
    // short text -> single whole-text chunk
    val one = d.select(TextFunctions.slidingChunks(col("text"), 100, 60))
      .first().getSeq[String](0)
    assert(one === Seq(text))
    // reconstruction: stitching chunk[i][0..stride) + last chunk covers text
    val stitched = chunks.dropRight(1).zipWithIndex
      .map { case (c, i) => c.take(math.min(6, 26 - i * 6).max(0)) }
      .mkString + chunks.last
    assert(stitched === text)
  }

  test("tokenBudgetSample: per-group running total stays within budget; " +
      "oversize rows never enter") {
    val d = Seq(
      (1L, "a", 400L), (2L, "a", 400L), (3L, "a", 400L), (4L, "a", 9000L),
      (5L, "b", 100L)
    ).toDF("id", "grp", "toks")
    val kept = Sampling.tokenBudgetSample(d, "grp",
        concat_ws("|", col("id")), col("toks"), budget = 1000L)
      .collect().map(r => r.getLong(0)).toSet
    // group b fits whole; group a truncates to the longest hash-order
    // PREFIX within budget (the contract: the first overflowing row and
    // everything after it drop — here the 9000-token row hashes first,
    // so nothing in group a is admitted).
    assert(kept.contains(5L))
    assert(!kept.contains(4L))
    val hashOrder = d.filter(col("grp") === "a")
      .select(col("id"), md5(concat_ws("|", col("id"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._2).map(_._1)
    val toks = Map(1L -> 400L, 2L -> 400L, 3L -> 400L, 4L -> 9000L)
    val expected = hashOrder
      .scanLeft((0L, 0L)) { case ((_, cum), id) => (id, cum + toks(id)) }
      .drop(1).takeWhile(_._2 <= 1000L).map(_._1).toSet
    assert((kept - 5L) === expected)
    // the admitted prefix never exceeds the budget
    assert(expected.map(toks).sum <= 1000L)
    // deterministic across layouts
    val again = Sampling.tokenBudgetSample(d.repartition(5), "grp",
        concat_ws("|", col("id")), col("toks"), budget = 1000L)
      .collect().map(r => r.getLong(0)).toSet
    assert(again === kept)
  }

  test("Histogram.equiWidth: known bins, closed last bin, degenerate input") {
    import graft.operators.Histogram
    val d = Seq(0.0, 1.0, 2.5, 5.0, 7.5, 10.0, 10.0).toDF("x")
    val bins = Histogram.equiWidth(d, col("x"), nBins = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // width 2.5: [0,2.5)->{0,1}, [2.5,5)->{2.5}, [5,7.5)->{5}, [7.5,10]->{7.5,10,10}
    assert(bins(0) === ((2L, 0.0, 2.5)))
    assert(bins(1) === ((1L, 2.5, 5.0)))
    assert(bins(2) === ((1L, 5.0, 7.5)))
    assert(bins(3) === ((3L, 7.5, 10.0)))
    // all-equal values collapse into bin 0 without dividing by zero
    val flat = Histogram.equiWidth(Seq(3.0, 3.0).toDF("x"), col("x"), 4)
      .collect()
    assert(flat.length === 1 && flat.head.getInt(0) === 0
      && flat.head.getLong(1) === 2L)
  }

  test("weightedMixByCol: NaN and null weights fail loudly instead of " +
      "slipping through as one copy") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val nan = Seq((1L, "a", Double.NaN)).toDF("id", "text", "q")
    val e1 = intercept[Exception] {
      Sampling.weightedMixByCol(nan, col("text"), col("q")).collect()
    }
    assert(msgs(e1).exists(_.contains("weightedMixByCol")), msgs(e1).mkString("|"))
    val nul = Seq((1L, "a", Option.empty[Double])).toDF("id", "text", "q")
    val e2 = intercept[Exception] {
      Sampling.weightedMixByCol(nul, col("text"), col("q") * 2).collect()
    }
    assert(msgs(e2).exists(_.contains("weightedMixByCol")), msgs(e2).mkString("|"))
  }

  test("slidingChunks invariants over randomized texts: coverage, clamped " +
      "tail, bounded stride") {
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(42)
    val texts = (0 until 60).map { i =>
      val len = 1 + rnd.nextInt(400)
      (i.toLong, rnd.alphanumeric.take(len).mkString)
    }
    for ((size, stride) <- Seq((120, 80), (50, 50), (32, 7))) {
      val rows = texts.toDF("id", "text")
        .select(col("id"), col("text"),
          TextFunctions.slidingChunks(col("text"), size, stride).as("cs"))
        .collect()
      rows.foreach { r =>
        val text = r.getString(1)
        val cs = r.getSeq[String](2)
        assert(cs.nonEmpty)
        assert(cs.head === text.take(size)) // starts at 0
        if (text.length <= size) assert(cs === Seq(text))
        else {
          assert(cs.last === text.substring(text.length - size)) // exact tail
          // reconstruct: chunk i at start_i; starts non-decreasing, gap <= stride
          val starts = cs.indices.map(i =>
            math.max(math.min(i * stride, text.length - size), 0))
          starts.sliding(2).foreach { case Seq(a, b) =>
            assert(b - a <= stride && b >= a)
          }
          cs.zip(starts).foreach { case (c, st) =>
            assert(c === text.substring(st, st + size))
          }
        }
      }
    }
  }

  test("duplicateSpans/duplicateSpanCounts consistency on a randomized " +
      "repetitive corpus: disjoint maximal spans, window counts add up") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val texts = (0 until 40).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val winLen = 24
    val counts = Dedup.duplicateSpanCounts(docs, "doc_id", "text", winLen)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", winLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    // at least some duplication must exist in a 5-word vocab corpus
    assert(counts.values.sum > 0)
    spans.foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      // spans disjoint and ordered; each at least winLen long
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3, s"doc $doc overlap")
        case _ =>
      }
      sorted.foreach { sp => assert(sp._3 - sp._2 >= winLen) }
      // the spans' window counts add up to the counts form's dup_windows
      assert(sorted.map(_._4).sum === counts(doc), s"doc $doc")
    }
    // every doc with dup windows has spans and vice versa
    assert(spans.keySet === counts.filter(_._2 > 0).keySet)
  }

  test("semanticOverlaps: paraphrase-leaked vectors flagged, orthogonal " +
      "ones pass; benchmark side broadcasts") {
    import graft.functions.Hashing
    val bench = Seq((100L, Hashing.hashEmbedVec("the quick brown fox", 32).toSeq))
      .toDF("bid", "vec")
    val corpus = Seq(
      (1L, Hashing.hashEmbedVec("the quick brown fox", 32).toSeq), // leak
      (2L, Hashing.hashEmbedVec("completely unrelated words here", 32).toSeq)
    ).toDF("id", "vec")
    val flagged = Decontaminate.semanticOverlaps(corpus, "id", "vec",
        bench, "vec", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(flagged.keySet === Set(1L))
    assert(math.abs(flagged(1L) - 1.0) < 1e-9)
    // the benchmark rides in as literals: ONE narrow projection — no join,
    // no aggregate, no exchange anywhere in the plan
    val plan = Decontaminate.semanticOverlaps(corpus, "id", "vec",
      bench, "vec", threshold = 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange")
      && !plan.contains("Aggregate"), plan.take(400))
    // a malformed (zero-norm) corpus vector fails the gate loudly rather
    // than passing as uncontaminated
    val broken = Seq((9L, Seq.fill(32)(0.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      Decontaminate.semanticOverlaps(broken, "id", "vec",
        bench, "vec", threshold = 0.9).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("semanticOverlaps")), msgs(e).mkString("|"))
  }

  test("weightedPrioritySample: exact n per group, deterministic, and " +
      "weight-monotone inclusion odds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 40L).map(i =>
      (i, if (i < 20) "g1" else "g2", if (i % 4 == 0) 100.0 else 0.01))
      .toDF("id", "grp", "w")
    def run() = graft.operators.Sampling.weightedPrioritySample(
        docs, "grp", concat_ws("|", col("id")), col("w"), n = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = run()
    assert(got.count(_._2 == "g1") === 5)
    assert(got.count(_._2 == "g2") === 5)
    assert(run() === got) // layout/retry determinism
    // weight 100 vs 0.01: u^(1/100) ≈ 1 while u^(100) ≈ 0 — the heavy
    // rows (every 4th id, 5 per group) should dominate the sample
    val heavy = got.count { case (id, _) => id % 4 == 0 }
    assert(heavy >= 8, s"heavy rows in sample: $heavy of 10")
  }

  test("weightedPrioritySample rejects inputs with reserved " +
      "'priority'/'_rk' columns (would be silently overwritten)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val withPriority = Seq((1L, "g", 1.0, 9.9))
      .toDF("id", "grp", "w", "priority")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.weightedPrioritySample(
        withPriority, "grp", col("id").cast("string"), col("w"), n = 1)
    }
    assert(e.getMessage.contains("priority"))
  }

  test("weightedPrioritySample fails loudly on non-positive weight") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "g", 1.0), (2L, "g", 0.0)).toDF("id", "grp", "w")
    val e = intercept[Exception] {
      graft.operators.Sampling.weightedPrioritySample(
        docs, "grp", col("id").cast("string"), col("w"), n = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("weightedPrioritySample")),
      msgs(e).mkString("|"))
  }

  test("keywordHits rejects an empty keyword (would loop forever)") {
    import spark.implicits._
    val docs = Seq((1L, "text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.keywordHits(docs, "doc_id", "text",
        Seq("ok", ""))
    }
    assert(e.getMessage.contains("empty keyword"))
  }

  test("keywordHits counts non-overlapping case-insensitive occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spark spark SPARKLE"),   // 'spark' x3 (sparkle contains it)
      (2L, "no matches here"),
      (3L, "aaa")                    // 'aa' non-overlapping -> 1
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .keywordHits(docs, "doc_id", "text", Seq("spark", "aa"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2))
      .toMap
    assert(got === Map((1L, "spark") -> 3, (3L, "aa") -> 1))
  }
}
