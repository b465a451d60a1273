package graft

import graft.functions.Fingerprints
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(colExpr: org.apache.spark.sql.Column, text: String) = {
    import spark.implicits._
    Seq(text).toDF("t").select(colExpr).first()
  }

  test("typed-kernel frames preserve the caller's id column TYPE " +
      "(ADVICE r15: cast('long') narrowed doc_id and NULLed non-numeric " +
      "ids) — string and int ids ride through every frame unchanged") {
    import spark.implicits._
    val docs = Seq(
      ("doc-a", "the cat and the dog of the house is a pet"),
      ("doc-b", "hello world\nhello world\nhello world")
    ).toDF("doc_id", "text")
    val frames: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "langId" -> TextAnalysis.langIdFrame(docs, "doc_id", "text"),
      "quality" -> TextAnalysis.qualityFrame(docs, "doc_id", "text"),
      "normalize" -> TextAnalysis.normalizeFrame(docs, "doc_id", "text"),
      "repetition" -> TextAnalysis.repetitionFrame(docs, "doc_id", "text"),
      "tokenCounts" -> TextAnalysis.tokenCountsFrame(docs, "doc_id", "text"),
      "rolling" -> TextAnalysis.rollingFingerprintFrame(docs, "doc_id", "text"),
      "gzip" -> TextAnalysis.gzipRatioFrame(docs, "doc_id", "text"),
      "gopher" -> TextAnalysis.gopherRepetition(docs, "doc_id", "text"),
      "cleanVerdict" -> TextAnalysis.cleanVerdictFrame(docs, "doc_id",
        "text", 1L, 0.9, 0.9, 0.0, None),
      "keywords" -> TextAnalysis.keywordHits(docs, "doc_id", "text",
        Seq("hello", "cat"))
    )
    frames.foreach { case (name, f) =>
      assert(f.schema("doc_id").dataType ===
        org.apache.spark.sql.types.StringType, s"$name narrowed doc_id")
      val ids = f.select("doc_id").as[String].collect().toSet
      assert(ids.subsetOf(Set("doc-a", "doc-b")) && ids.nonEmpty,
        s"$name lost id values: $ids")
    }
    // int ids stay int (no silent widening either)
    val intDocs = Seq((7, "some text here")).toDF("doc_id", "text")
    val lf = TextAnalysis.langIdFrame(intDocs, "doc_id", "text")
    assert(lf.schema("doc_id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(lf.select("doc_id").as[Int].collect().toSeq === Seq(7))
    // and the values themselves are unchanged vs a long-id run of the
    // same corpus (the kernel output must not depend on the id plumbing)
    val longDocs = Seq((1L, "the cat and the dog of the house is a pet"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.langIdFrame(longDocs, "doc_id", "text")
      .select("lang_pred").as[String].first() === "en")
  }

  test("langId picks the dominant marker language, 'und' when none") {
    assert(one(TextAnalysis.langId(col("t")),
      "the cat and the dog of the house is a pet").getString(0) === "en")
    assert(one(TextAnalysis.langId(col("t")),
      "el perro y la casa de los gatos que ladran").getString(0) === "es")
    assert(one(TextAnalysis.langId(col("t")),
      "xyzzy plugh qwerty").getString(0) === "und")
  }

  test("tokenCounts: whitespace vs subword proxy") {
    val r = one(struct(TextAnalysis.tokenCounts(col("t")): _*),
      "Hello, world! 42 tests").getStruct(0)
    assert(r.getAs[Long]("ws_tokens") === 4L)
    // hello , world ! 42 tests → 6 subword tokens
    assert(r.getAs[Long]("subword_tokens") === 6L)
  }

  test("quality features: empty text is all-zero, long clean text scores high") {
    val empty = one(struct(TextAnalysis.qualityColumns(col("t")): _*), "")
      .getStruct(0)
    assert(empty.getAs[Long]("n_tokens") === 0L)
    assert(empty.getAs[Double]("quality") <= 0.5)
    val good = (1 to 120).map(i => s"word$i is in the text and of it").mkString(" ")
    val g = one(struct(TextAnalysis.qualityColumns(col("t")): _*), good)
      .getStruct(0)
    assert(g.getAs[Double]("quality") > 0.8)
  }

  test("kernel frames agree with the Column expressions exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog of the house is a pet, truly!"),
      (1L, "el perro y la casa de los gatos"),
      (2L, ""),
      (3L, "Zürich café ünïcode — test 123 ok?"),
      (4L, (1 to 150).map(i => s"w$i of the and").mkString(" ")))
      .toDF("doc_id", "text")

    val colLang = docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kerLang = TextAnalysis.langIdFrame(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kerLang === colLang)

    val colQ = docs.select((col("doc_id") +:
        TextAnalysis.qualityColumns(col("text"))): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val kerQ = TextAnalysis.qualityFrame(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(kerQ === colQ)

    val colT = docs.select((col("doc_id") +:
        TextAnalysis.tokenCounts(col("text"))): _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val kerT = TextAnalysis.tokenCountsFrame(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kerT === colT)

    val colF = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        Fingerprints.rollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kerF = TextAnalysis.rollingFingerprintFrame(
        docs.filter(length(col("text")) > 0), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kerF === colF)
  }

  test("rolling fingerprint: deterministic and shift-robust") {
    import spark.implicits._
    val body = "a long shared document body that dominates the gram set " * 4
    val df = Seq(("base", body), ("shifted", "PREFIX " + body),
      ("other", "completely different content with nothing in common here ok"))
      .toDF("name", "t")
      .select(col("name"), Fingerprints.rollingFingerprint(col("t")).as("fp"))
    val fps = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // prefix-shifting keeps every original 8-gram, so the min-hash survives
    assert(fps("base") === fps("shifted"))
    assert(fps("base") !== fps("other"))
    // determinism across plans
    val again = Seq(body).toDF("t")
      .select(Fingerprints.rollingFingerprint(col("t"))).first().getLong(0)
    assert(again === fps("base"))
  }

  test("cleanVerdictFrame fires every rule in declared order") {
    import spark.implicits._
    val good = ("the and of to in is a " * 20).trim  // stopword-rich English
    val docs = Seq(
      (1L, good),                                    // ok
      (2L, "tiny"),                                  // too_short
      (3L, Array.fill(12)(good.take(40)).mkString("\n")), // repetitive_lines
      (4L, good.split(" ").take(35).mkString(" ") + " " +
        ("spam ham " * 200).trim),                   // repetitive_bigrams
      (5L, (1 to 40).map(i => s"w$i.").mkString(" ")), // low_quality (punct-heavy, stopword-free, non-repetitive)
      (6L, "el la los las de que una " * 10)         // wrong_lang (es)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cleanVerdictFrame(docs, "doc_id", "text",
        minTokens = 30L, maxDupLineFrac = 0.2, maxTopBigramFrac = 0.45,
        minQuality = 0.5, requiredLang = Some("en"))
      .select(col("doc_id"), col("reason"), col("keep"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) === (("ok", true)))
    assert(got(2L) === (("too_short", false)))
    assert(got(3L) === (("repetitive_lines", false)))
    assert(got(4L) === (("repetitive_bigrams", false)))
    assert(got(5L) === (("low_quality", false)))
    assert(got(6L) === (("wrong_lang", false)))
  }

  test("bigramSurprisal: add-one-smoothed bigram NLL matches hand computation") {
    import spark.implicits._
    // corpus: "a b a b" and "a b c". bigram contexts: c(a)=3, c(b)=2 (from
    // "b a", "b c"); wait -- contexts count FIRST positions: doc1 bigrams
    // (a,b),(b,a),(a,b); doc2 (a,b),(b,c). c(a,b)=3, c(b,a)=1, c(b,c)=1;
    // c1(a)=3, c1(b)=2; V=3 (a,b,c).
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val pAB = (3 + 1.0) / (3 + 3) // 2/3
    val pBA = (1 + 1.0) / (2 + 3) // 2/5
    val pBC = (1 + 1.0) / (2 + 3) // 2/5
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === r4(-(2 * math.log(pAB) + math.log(pBA)) / 3))
    assert(out(2L)._1 === 2L)
    assert(out(2L)._2 === r4(-(math.log(pAB) + math.log(pBC)) / 2))
  }

  test("normalizeOf folds accents, case, and whitespace (unicode paths " +
      "the ASCII oracle corpus cannot exercise)") {
    // precomposed é (U+00E9) and decomposed e+combining-acute both fold
    assert(TextAnalysis.normalizeOf("Café") === "cafe")
    assert(TextAnalysis.normalizeOf("Café") === "cafe")
    assert(TextAnalysis.normalizeOf("  AÜBER\t\tcool\n\nSTUFF ") ===
      "auber cool stuff") // Ü → u (NFD strips the diaeresis)
    assert(TextAnalysis.normalizeOf("a  b") === "a b")
    assert(TextAnalysis.normalizeOf("") === "")
    assert(TextAnalysis.normalizeOf(" \n\t ") === "")
  }

  test("normalizeFrame applies the kernel corpus-wide") {
    import spark.implicits._
    val docs = Seq((1L, " Mixed  CASE\ttext "), (2L, "Élève"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.normalizeFrame(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "mixed case text", 2L -> "eleve"))
  }

  test("AhoCorasick: overlapping/nested patterns count like independent scans") {
    import graft.functions.AhoCorasick
    val pats = Seq("a", "ab", "aba", "ba", "b", "abab")
    val ac = AhoCorasick.build(pats)
    def naive(text: String, kw: String): Int = {
      var n = 0; var i = text.indexOf(kw)
      while (i >= 0) { n += 1; i = text.indexOf(kw, i + kw.length) }
      n
    }
    for (text <- Seq("ababab", "aaaa", "babba", "", "abababa", "xyz")) {
      val got = ac.countHits(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === naive(text, p),
          s"pattern '$p' on '$text': got ${got(i)}, want ${naive(text, p)}")
      }
    }
  }

  test("AhoCorasick matches the naive scan on randomized corpora (the " +
      "keywordHits path-equality contract)") {
    import graft.functions.AhoCorasick
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats = (0 until 40).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val ac = AhoCorasick.build(pats)
    def naive(text: String, kw: String): Int = {
      var n = 0; var i = text.indexOf(kw)
      while (i >= 0) { n += 1; i = text.indexOf(kw, i + kw.length) }
      n
    }
    (0 until 50).foreach { _ =>
      val text = randStr(rnd.nextInt(200))
      val got = ac.countHits(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === naive(text, p), s"'$p' on '$text'")
      }
    }
  }

  test("keywordHits: AC path (large dict) and indexOf path (small dict) " +
      "produce identical frames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aba cab abab the quick ab fox ab ab"),
      (2L, "no hits here except THE and Ab"),
      (3L, "")
    ).toDF("doc_id", "text")
    val dict = Seq("ab", "aba", "the", "cab", "quick", "fox", "b")
    val small = TextAnalysis
      .keywordHits(docs, "doc_id", "text", dict, acThreshold = 1000)
      .orderBy("doc_id", "keyword").collect().map(_.toSeq)
    val large = TextAnalysis
      .keywordHits(docs, "doc_id", "text", dict, acThreshold = 1)
      .orderBy("doc_id", "keyword").collect().map(_.toSeq)
    assert(small.nonEmpty && small.sameElements(large))
  }

  test("AhoCorasick guards: empty dictionary and empty pattern fail loudly") {
    import graft.functions.AhoCorasick
    intercept[IllegalArgumentException] { AhoCorasick.build(Nil) }
    intercept[IllegalArgumentException] { AhoCorasick.build(Seq("a", "")) }
  }

  test("pmiPairs: hand-computed document-level PMI; vocab cap bounds pairs") {
    import spark.implicits._
    // a,b co-occur in 2 of 4 docs; a alone in 1 more; c everywhere
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a c"), (4L, "c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiPairs(docs, "doc_id", "text",
        vocabTop = 10, minPairCount = 2L, topN = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pmi(a,b) = ln(2*4/(3*2)) ; pmi(a,c) = ln(3*4/(3*4)) = 0
    assert(got(("a", "b")) === ((3L, 2L, 2L, r6(math.log(8.0 / 6)))))
    assert(got(("a", "c")) === ((3L, 4L, 3L, 0.0)))
    assert(got(("b", "c")) === ((2L, 4L, 2L, r6(math.log(8.0 / 8)))))
  }

  test("giniByGroup: uniform → 0, concentrated → high, zero-total → 0") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 10L), ("u", 2L, 10L), ("u", 3L, 10L), ("u", 4L, 10L),
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 0L), ("c", 4L, 100L),
      ("z", 1L, 0L), ("z", 2L, 0L)
    ).toDF("src", "id", "x")
    val got = TextAnalysis.giniByGroup(df, "src", "id", col("x"))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got("u") === 0.0)
    // c: sorted 0,0,0,100 → G = 2*(4*100)/(4*100) - 5/4 = 0.75
    assert(got("c") === 0.75)
    assert(got("z") === 0.0)
  }

  test("termEntropy: hand computation, single-term zero (positive zero), " +
      "case folding, layout independence") {
    import spark.implicits._
    val docs = Seq(
      ("g1", "a a b"), ("g1", "a c"),       // a:3 b:1 c:1, N=5
      ("g2", "x x x"),                      // single term → H = 0
      ("g3", "A a"))                        // case-folds to one term
      .toDF("g", "text")
    val got = TextAnalysis.termEntropy(docs, "g", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // H(g1) = ln 5 − (3·ln 3)/5 = 0.950271 (b, c contribute 1·ln 1 = 0)
    assert(got("g1") === ((5L, 3L, 0.950271)))
    assert(got("g2")._3 === 0.0 &&
      1.0 / got("g2")._3 > 0.0, "must be +0.0, not -0.0")
    assert(got("g3") === ((2L, 1L, 0.0)))
    val repart = TextAnalysis.termEntropy(docs.repartition(7), "g", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(repart === got.map { case (k, v) => k -> v._3 })
  }

  test("gopherRepetition: hand-computed top and coverage fractions, " +
    "planted repeats, degenerate docs") {
    import spark.implicits._
    // "a b c d e x a b c d e": the 5-gram "a b c d e" repeats at word
    // positions 0 and 6 → covered positions {0..4, 6..10} = 10 of 11
    // one-char words; 2/3/4-gram tops all have count 2, lexicographic
    // smallest gram wins the tie
    val planted = "a b c d e x a b c d e"
    val docs = Seq((1L, planted), (2L, "one two"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val p = got(1L)
    assert(p.getAs[Double]("top_2gram_frac") === 0.3636) //  4/11
    assert(p.getAs[Double]("top_3gram_frac") === 0.5455) //  6/11
    assert(p.getAs[Double]("top_4gram_frac") === 0.7273) //  8/11
    assert(p.getAs[Double]("dup_5gram_frac") === 0.9091) // 10/11
    assert(p.getAs[Double]("dup_10gram_frac") === 0.0) // no repeated 10-gram

    val s = got(2L) // two words: one 2-gram, nothing longer
    assert(s.getAs[Double]("top_2gram_frac") === 1.0)
    assert(s.getAs[Double]("top_3gram_frac") === 0.0)
    assert(s.getAs[Double]("dup_5gram_frac") === 0.0)

    val e = got(3L) // empty doc: all zeros, still one output row
    assert(Seq("top_2gram_frac", "top_3gram_frac", "top_4gram_frac",
      "dup_5gram_frac", "dup_10gram_frac")
      .forall(c => e.getAs[Double](c) === 0.0))
  }

  test("c4LineClean: line keep rules, page-drop precedence, md5 pins " +
    "the exact kept text") {
    import spark.implicits._
    val good = "this line has enough words here.\n" +
      "short one.\n" +                       // < 5 words → dropped
      "no terminal punctuation on this line\n" + // no punct → dropped
      "another full sentence with five words!\n" +
      "a third full sentence keeps page alive."
    val lorem = "Lorem Ipsum dolor sit amet consectetur." // case-folded match
    val brace = "some code { return 1; } follows here.\n" +
      "plus a normal sentence with words.\n" +
      "and another one right after that.\n" +
      "and one more to pass three."
    val sparse = "only one good sentence lives here.\nrest\nis\nnoise"
    val docs = Seq((1L, good), (2L, lorem), (3L, brace), (4L, sparse))
      .toDF("doc_id", "text")
    val got = TextAnalysis.c4LineClean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val g = got(1L)
    assert(g.getAs[Int]("n_lines") === 5 && g.getAs[Int]("n_kept") === 3)
    assert(g.isNullAt(g.fieldIndex("drop_reason")))
    val keptText = "this line has enough words here.\n" +
      "another full sentence with five words!\n" +
      "a third full sentence keeps page alive."
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(keptText.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(g.getAs[String]("kept_md5") === md5)

    assert(got(2L).getAs[String]("drop_reason") === "lorem_ipsum")
    // brace wins over sentence-count by precedence; kept lines exist
    assert(got(3L).getAs[String]("drop_reason") === "curly_brace")
    assert(got(4L).getAs[String]("drop_reason") === "too_few_sentences")
    assert(got(4L).getAs[Int]("n_kept") === 1)
  }

  test("gopherRules: per-rule attribution on hand-built boundary docs") {
    import spark.implicits._
    // 1: clean doc — 52 words with stopwords, passes everything
    val clean = ("the quick brown fox jumps over and rests with care " +
      Seq.tabulate(42)(i => s"word$i").mkString(" "))
    // 2: bullet-heavy — every line bullet-started (fails r_bullet);
    //    words padded past 50 so only the bullet rule fails... but
    //    bullets also sink stopwords/alpha? keep words normal.
    val bullets = Seq.tabulate(10)(i =>
      s"- the item$i and that have with of to be more line").mkString("\n")
    // 3: symbol-heavy — '#' per word pushes symbol ratio over 0.1
    val symbols = ("the and that have with " +
      Seq.tabulate(50)(i => s"#tag$i").mkString(" "))
    // 4: too short
    val short = "the and that"
    // 5: empty
    val empty = ""
    val docs = Seq((1L, clean), (2L, bullets), (3L, symbols), (4L, short),
      (5L, empty)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val clean1 = got(1L)
    assert(clean1.getAs[Boolean]("verdict"),
      s"clean doc failed: $clean1")
    assert(clean1.getAs[Int]("n_words") === 52)

    val b = got(2L)
    assert(!b.getAs[Boolean]("r_bullet") && !b.getAs[Boolean]("verdict"))
    assert(b.getAs[Double]("bullet_frac") === 1.0)
    assert(b.getAs[Boolean]("r_stopwords")) // stopwords still present

    val sy = got(3L)
    assert(!sy.getAs[Boolean]("r_symbol") && !sy.getAs[Boolean]("verdict"))
    assert(sy.getAs[Double]("symbol_ratio") >= 0.1)

    val sh = got(4L)
    assert(!sh.getAs[Boolean]("r_words") && !sh.getAs[Boolean]("verdict"))

    val e = got(5L)
    assert(e.getAs[Int]("n_words") === 0)
    assert(e.isNullAt(e.fieldIndex("mean_word_len")))
    assert(!e.getAs[Boolean]("verdict"))
  }

  test("luhnCards/luhnMask: checksum-valid runs of card length mask, " +
      "everything else survives") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(t: String): (Seq[String], String) = {
      val r = Seq(t).toDF("t")
        .select(TextAnalysis.luhnCards(col("t")).as("c"),
          TextAnalysis.luhnMask(col("t")).as("m"))
        .first()
      (r.getSeq[String](0), r.getString(1))
    }
    // 4111111111111111: the canonical Luhn-valid 16-digit test number
    val (c1, m1) = run("pay 4111111111111111 now")
    assert(c1 === Seq("4111111111111111"))
    assert(m1 === "pay [CARD] now")
    // off-by-one check digit fails the checksum → untouched
    val (c2, m2) = run("pay 4111111111111112 now")
    assert(c2 === Seq.empty)
    assert(m2 === "pay 4111111111111112 now")
    // plausible-length gate: 12 digits (too short) and 20 (too long)
    // survive even though both checksums hold
    val (c3, m3) = run("id 111111111113 and 11111111111111111111 x")
    assert(c3 === Seq.empty && m3.contains("111111111113") &&
      m3.contains("11111111111111111111"))
    // every occurrence of a validated run masks; distinct valid runs
    // (here a 16- and a 13-digit card) mask independently; digit-free
    // text is untouched
    val (c4, m4) =
      run("4111111111111111 then 4111111111111111 and 4111111111119x")
    assert(c4 === Seq("4111111111111111", "4111111111111111",
      "4111111111119"))
    assert(m4 === "[CARD] then [CARD] and [CARD]x")
    assert(run("no digits here")._2 === "no digits here")
    // longest-first fold: a valid 16-digit value that PREFIXES a valid
    // 17-digit run elsewhere must not splice the longer card — both
    // mask whole, no trailing digits leak
    val (c5, m5) = run("a 4111111111111111 b 41111111111111113 c")
    assert(c5.toSet === Set("4111111111111111", "41111111111111113"))
    assert(m5 === "a [CARD] b [CARD] c")
  }
}
