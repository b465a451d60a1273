package graft

import graft.functions.{Alternatives, Hashing, TextFunctions}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the pure kernels (SURVEY.md §5): splitter
  * reassembly, sketch invariants, alternative-parse round trips. Spark-side
  * plumbing is covered by the ScalaTest specs; these pin the algebra the
  * distributed operators rely on. */
object GraftProperties extends Properties("graft") {

  /** Flake-watch hook: the whole suite runs from ONE initial seed,
    * printed to stderr at startup, so any failure — even one whose
    * per-property "failing seed" line is lost to log truncation — is
    * replayable by re-running with `GRAFT_SCALACHECK_SEED=<base64>`.
    * Without the env var a fresh random seed is drawn per JVM (normal
    * exploratory runs stay diverse across the watch loop). */
  private lazy val suiteSeed: org.scalacheck.rng.Seed = {
    val seed = sys.env.get("GRAFT_SCALACHECK_SEED") match {
      case Some(s) => org.scalacheck.rng.Seed.fromBase64(s).getOrElse(
        sys.error(s"GRAFT_SCALACHECK_SEED is not valid base64: $s"))
      case None => org.scalacheck.rng.Seed.random()
    }
    Console.err.println(
      s"[GraftProperties] initialSeed ${seed.toBase64} — replay with " +
        "GRAFT_SCALACHECK_SEED=<that value>")
    seed
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withInitialSeed(suiteSeed)

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(12))
  private val words: Gen[List[String]] = Gen.listOf(word)
  private val someWords: Gen[List[String]] = Gen.nonEmptyListOf(word)

  // ── MinHash algebra ────────────────────────────────────────────────────
  property("minhash is order-independent") = forAll(someWords) { ws =>
    Hashing.minhash(ws, 16).toSeq == Hashing.minhash(ws.reverse, 16).toSeq
  }

  property("minhash(A ∪ B) = elementwise min(minhash(A), minhash(B))") =
    forAll(words, words) { (a, b) =>
      val k = 16
      val union = Hashing.minhash((a ++ b).distinct, k)
      val mins = Hashing.minhash(a.distinct, k)
        .zip(Hashing.minhash(b.distinct, k)).map { case (x, y) => math.min(x, y) }
      // empty-input signatures are all Long.MaxValue, so this holds
      // degenerate cases included.
      union.toSeq == mins.toSeq
    }

  property("identical shingle sets give identical signatures regardless " +
    "of multiplicity") = forAll(someWords) { ws =>
    Hashing.minhash(ws.distinct, 8).toSeq ==
      Hashing.minhash((ws ++ ws).distinct, 8).toSeq
  }

  // ── DSIR weight algebra ────────────────────────────────────────────────
  // weight is a per-token sum, so it is additive over document
  // concatenation and invariant to token order — the two properties the
  // one-pass kernel and the SQL oracle both rely on.
  property("DSIR weight is additive over concatenation and " +
    "order-independent") = forAll(words, words) { (a, b) =>
    val B = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    val table = Array.tabulate(B)(i => ((i * 2654435761L) % 1000L) - 500L)
    def weight(ts: List[String]): Long =
      ts.map(t => table(graft.operators.Dsir.bucketOf(md, t, B))).sum
    weight(a ++ b) == weight(a) + weight(b) &&
      weight((a ++ b).reverse) == weight(a ++ b)
  }

  // ── SimHash ────────────────────────────────────────────────────────────
  // the permutation is derived from a generated Long (not the global
  // scala.util.Random) so the property replays exactly from the suite's
  // pinned initial seed
  property("simhash is permutation-invariant") =
    forAll(someWords, Gen.long) { (ws, permSeed) =>
      val shuffled = new scala.util.Random(permSeed).shuffle(ws)
      Hashing.simhash(ws.iterator) == Hashing.simhash(shuffled.iterator)
    }

  // ── hash embedding ─────────────────────────────────────────────────────
  property("hashEmbedVec norm is exactly 0 (empty input, or signed " +
    "contributions cancelling bucket-for-bucket) or 1") =
    forAll(words, Gen.choose(2, 64)) { (ws, dim) =>
    val v = Hashing.hashEmbedVec(ws.mkString(" "), dim)
    val norm = math.sqrt(v.map(x => x * x).sum)
    // signed feature hashing CAN zero out a non-empty input (two tokens,
    // one bucket, opposite signs) — the kernel normalizes only nonzero
    // vectors, so the reachable norms are exactly {0, 1}.
    if (ws.isEmpty) norm == 0.0
    else norm == 0.0 || math.abs(norm - 1.0) < 1e-9
  }

  property("hashEmbedVec is case-insensitive") =
    forAll(someWords, Gen.choose(2, 32)) { (ws, dim) =>
      Hashing.hashEmbedVec(ws.mkString(" ").toUpperCase, dim).toSeq ==
        Hashing.hashEmbedVec(ws.mkString(" "), dim).toSeq
    }

  // ── T7 chunk splitter ──────────────────────────────────────────────────
  private val record: Gen[String] = for {
    body <- someWords
    ans <- Gen.oneOf("A", "B", "C", "D", "E")
  } yield s"(Enem/2023)  QUESTÃO\n${body.mkString(" ")}\n" +
    s"${TextFunctions.AnswerKeyStr}: $ans\n\n"

  property("chunkSplit yields one chunk per record and reassembles the " +
    "prefix byte-exactly") = forAll(Gen.nonEmptyListOf(record)) { recs =>
    val text = recs.mkString("")
    val chunks = TextFunctions.chunkSplit(text)
    val reassembled = chunks.mkString("")
    Prop.all(
      (chunks.size == recs.size) :| s"count ${chunks.size} vs ${recs.size}",
      text.startsWith(reassembled) :| "chunks are a prefix of the input",
      // what's left after the chunks is the tail of the last record
      // separator (the second newline the 22-char buffer doesn't reach).
      (text.length - reassembled.length ==
        text.length - (text.lastIndexOf(TextFunctions.AnswerKeyStr) + 22))
        :| "remainder starts right after the last buffered answer")
  }

  // ── T5 alternatives round trip ─────────────────────────────────────────
  private val altBody: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
      .map(_.mkString.take(20))

  property("parse(reformat-inverse) recovers the five alternatives") =
    forAll(someWords, altBody, altBody, altBody, altBody, altBody) {
      (body, a, b, c, d, e) =>
        val raw = s"QUESTÃO\n${body.mkString(" ")}\n" +
          s"A\nA $a\nB\nB $b\nC\nC $c\nD\nD $d\nE\nE $e\n"
        val p = Alternatives.parse(raw)
        Prop.all(
          p.standard :| "standard",
          (p.alternatives.size == 5) :| s"5 alts, got ${p.alternatives.size}",
          (p.alternatives.head == s"A)$a\n") :| "A body",
          (p.alternatives.last == s"E)$e\n") :| "E body")
    }

  property("fewer than five markers is always non-standard") =
    forAll(someWords, altBody, altBody) { (body, a, b) =>
      val raw = s"QUESTÃO\n${body.mkString(" ")}\nA\nA $a\nB\nB $b\n"
      !Alternatives.parse(raw).standard
    }

  // ── perceptual hash algebra ────────────────────────────────────────────
  import graft.functions.ImageCodec
  import graft.functions.ImageCodec.ImageInfo

  /** A 9×8 grayscale raster — one pixel per dHash grid cell, so the
    * resampler is the identity and properties about the comparator are
    * exact. */
  private val raster9x8: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Int](72, Gen.choose(0, 255))
      .map(_.map(_.toByte))

  private def info(px: Array[Byte], w: Int = 9, h: Int = 8) =
    ImageInfo("pgm", w, h, 1, Some(px))

  property("dHash is invariant under uniform brightness shift " +
    "(no clipping)") = forAll(raster9x8, Gen.choose(1, 40)) { (px, c) =>
    // compress into [0, 215] first so +c never clips
    val base = px.map(b => ((b & 0xff) * 215 / 255).toByte)
    val shifted = base.map(b => ((b & 0xff) + c).toByte)
    ImageCodec.dHash64(info(base)) == ImageCodec.dHash64(info(shifted))
  }

  property("dHash is invariant under 2x pixel replication (the integer-" +
    "bucket resampler is scale-exact)") = forAll(raster9x8) { px =>
    val up = Array.ofDim[Byte](18 * 16)
    for (y <- 0 until 16; x <- 0 until 18)
      up(y * 18 + x) = px((y / 2) * 9 + (x / 2))
    ImageCodec.dHash64(info(px)) == ImageCodec.dHash64(info(up, 18, 16))
  }

  property("dHash of the inverted image is the complement when no " +
    "adjacent cells tie") = forAll(raster9x8) { px =>
    val vals = px.map(_ & 0xff)
    val noTies = (0 until 8).forall(y => (0 until 8).forall(x =>
      vals(y * 9 + x) != vals(y * 9 + x + 1)))
    val inv = px.map(b => (255 - (b & 0xff)).toByte)
    lazy val complement =
      (ImageCodec.dHash64(info(px)), ImageCodec.dHash64(info(inv))) match {
        case (Some(h), Some(hi)) => hi == ~h
        case _ => false
      }
    !noTies || complement
  }

  // ── WAV / AVI codec algebra ────────────────────────────────────────────
  private val samples: Gen[Array[Float]] =
    Gen.chooseNum(2, 400).flatMap(n =>
      Gen.containerOfN[Array, Float](n, Gen.chooseNum(-1.0f, 1.0f)))

  property("WAV PCM16 round trip recovers every sample within the " +
    "codec's quantization bound") = forAll(samples) { xs =>
    import graft.functions.WavCodec
    // decoded = round(32767·x)/32768 (symmetric 32767 encode, full-scale
    // 32768 decode — standard PCM16 asymmetry), so the worst case is
    // (0.5 + |x|)/32768 ≤ 1.5/32768
    WavCodec.decode(WavCodec.encodePcm16(8000, xs)) match {
      case Some(w) =>
        w.sampleRate == 8000 && w.samples.length == xs.length &&
          w.samples.zip(xs).forall { case (got, want) =>
            math.abs(got - math.max(-1.0f, math.min(1.0f, want))) <=
              1.5f / 32768.0f + 1e-7f
          }
      case None => false
    }
  }

  property("WAV fingerprint is invariant under uniform gain") =
    forAll(Gen.containerOfN[Array, Float](200,
        Gen.chooseNum(-0.5f, 0.5f))) { xs =>
      import graft.functions.WavCodec
      def fp(arr: Array[Float]) =
        WavCodec.decode(WavCodec.encodePcm16(8000, arr))
          .flatMap(WavCodec.fingerprint64)
      // halving cannot clip and scales every frame energy by the same
      // factor -> comparisons unchanged (up to PCM16 quantization noise
      // on equal-energy ties, excluded by requiring a defined fp match)
      val a = fp(xs); val b = fp(xs.map(_ * 0.5f))
      a.isEmpty || {
        val d = java.lang.Long.bitCount(a.get ^ b.get)
        d <= 2 // quantization can flip near-tie bits, never the contour
      }
    }

  property("AVI encode/parse round trip preserves frame payloads and " +
    "header metadata") = forAll(
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n,
        Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)))
    ) { frames =>
    import graft.functions.AviCodec
    val avi = AviCodec.encode(32, 24, 40000, frames)
    val info = AviCodec.decodeInfo(avi)
    val got = AviCodec.frames(avi)
    info.exists(i => i.width == 32 && i.height == 24 &&
      i.declaredFrames == frames.length &&
      i.frameChunks == frames.length) &&
      got.length == frames.length &&
      got.zip(frames).forall { case (a, b) => a.sameElements(b) }
  }

  // ── PDF synth→decode roundtrip (the pdf_pages_scan kernel, r13) ──────
  // PdfSynth writes spec-valid PDF 1.4; PdfCodec must recover every
  // page's text EXACTLY (non-empty show lines joined by \n plus the
  // trailing \n; a page whose every show is empty extracts as "" — an
  // empty `() Tj` draws no glyphs, so like pymupdf's get_text the
  // extractor sees no line there) in page-tree order, with image flags
  // matching the embedded XObjects. The generator covers the escaping
  // surface the literal-string encoder owns — parens, backslashes,
  // Latin-1 accents — plus empty shows; the gate query exercises one
  // synthesis pattern, this pins ARBITRARY content.
  private val pdfLineGen: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      (8, Gen.choose(' ', '~')),
      (2, Gen.oneOf('(', ')', '\\')),
      (1, Gen.oneOf('ç', 'ã', 'é', 'ê', 'í', 'õ', 'ú'))))
      .map(_.mkString))
  private val bookletGen: Gen[List[List[String]]] =
    Gen.chooseNum(1, 4).flatMap(p => Gen.listOfN(p,
      Gen.chooseNum(1, 6).flatMap(l => Gen.listOfN(l, pdfLineGen))))

  property("PDF synth/decode round trip: exact page text (incl. " +
      "escapes, accents, empty lines), page-tree order, image flags") =
    forAll(bookletGen, Gen.choose(0, 15)) { (pages, imgMask) =>
      import graft.functions.{PdfCodec, PdfSynth}
      val imgs = (0 until pages.length).filter(i => (imgMask & (1 << i)) != 0).toSet
      val got = PdfCodec.extractPages(PdfSynth.build(pages.map(_.toSeq), imgs))
      (got.length == pages.length) :| "page count" &&
        (got.map(_.pageIdx) == pages.indices.toList) :| "page order" &&
        got.zip(pages).forall { case (p, lines) =>
          val shown = lines.filter(_.nonEmpty)
          p.text == (if (shown.isEmpty) ""
                     else shown.mkString("", "\n", "\n"))
        } :| "exact text incl. trailing newline" &&
        (got.map(_.hasImages) ==
          pages.indices.map(imgs.contains).toList) :| "image flags"
    }

  // ── KMV sketch set algebra (pure hash-array form) ─────────────────────
  private val K = 16
  private def sortU(hs: Array[Long]): Array[Long] =
    hs.map(_ ^ Long.MinValue).sorted.map(_ ^ Long.MinValue)
  private val hashSet: Gen[Array[Long]] =
    Gen.listOf(Gen.long).map(l => sortU(l.distinct.toArray))
  private def trim(hs: Array[Long]): Array[Long] =
    if (hs.length <= K) hs else hs.take(K)

  property("KMV union is commutative, idempotent, and closed under " +
    "re-union") = forAll(hashSet, hashSet) { (a0, b0) =>
    import graft.operators.KmvSketch._
    val (a, b) = (trim(a0), trim(b0))
    union(a, b, K).toSeq == union(b, a, K).toSeq &&
      union(a, a, K).toSeq == a.toSeq &&
      union(union(a, b, K), b, K).toSeq == union(a, b, K).toSeq
  }

  property("KMV encode/decode round trip") = forAll(hashSet) { hs =>
    import graft.operators.KmvSketch._
    decode(encode(trim(hs))).toSeq == trim(hs).toSeq
  }

  property("KMV exact sketches (below k) give exact set algebra") =
    forAll(hashSet, hashSet) { (a0, b0) =>
      import graft.operators.KmvSketch._
      val a = a0.take(K - 1)
      val b = b0.take(K - 1)
      val (sa, sb) = (a.toSet, b.toSet)
      estimate(a, K) == sa.size.toDouble &&
        intersectEstimate(a, b, K) == sa.intersect(sb).size.toDouble &&
        differenceEstimate(a, b, K) == sa.diff(sb).size.toDouble
    }

  property("KMV intersect + difference account for every sampled hash " +
    "of the left operand exactly once") =
    forAll(hashSet, hashSet) { (a0, b0) =>
      import graft.operators.KmvSketch._
      val (a, b) = (trim(a0), trim(b0))
      val th = math.min(theta(a, K), theta(b, K))
      val sampled = a.count(h =>
        ((h >>> 1).toDouble * 2.0 + (h & 1L)) / 1.8446744073709552e19 < th)
      val lhs = (intersectEstimate(a, b, K) + differenceEstimate(a, b, K)) * th
      math.abs(lhs - sampled) <= 1e-9 * math.max(1.0, sampled.toDouble)
    }

  // ── WordPiece greedy encode ───────────────────────────────────────────
  private val wpWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
  private val wpVocab: Gen[Set[String]] = Gen.listOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(4)))
    .map { multi =>
      val letters = ('a' to 'z').map(_.toString)
      (letters ++ letters.map("##" + _) ++
        multi ++ multi.map("##" + _)).toSet
    }

  property("WordPiece encode round-trips and keeps the ## discipline " +
    "whenever the alphabet is covered") = forAll(wpWord, wpVocab) { (w, v) =>
    import graft.operators.WordPiece
    val ps = WordPiece.encodeWord(w, v)
    ps.map(_.stripPrefix("##")).mkString == w &&
      !ps.head.startsWith("##") &&
      ps.tail.forall(_.startsWith("##"))
  }

  property("WordPiece first piece is the longest vocab prefix") =
    forAll(wpWord, wpVocab) { (w, v) =>
      import graft.operators.WordPiece
      val first = WordPiece.encodeWord(w, v).head
      val best = (w.length to 1 by -1).iterator
        .map(w.substring(0, _)).find(v.contains).get
      first == best
    }

  property("WordPiece collapses to [UNK] exactly when a cursor has no " +
    "match") = forAll(wpWord) { w =>
    import graft.operators.WordPiece
    // vocab missing letter 'a' entirely: any word containing 'a'
    // (and no multi-char piece to bridge it) must be [UNK]
    val letters = ('b' to 'z').map(_.toString)
    val v = (letters ++ letters.map("##" + _)).toSet
    val ps = WordPiece.encodeWord(w, v)
    if (w.contains('a')) ps.toSeq == Seq(WordPiece.Unk)
    else ps.map(_.stripPrefix("##")).mkString == w
  }

  // ── isotonic PAV ──────────────────────────────────────────────────────
  private val pavGroups: Gen[Array[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      n <- Gen.chooseNum(1L, 5L)
      p <- Gen.chooseNum(0L, 5L)
    } yield (n, math.min(p, n))).map(_.toArray)

  property("PAV output is monotone, bounded, and mean-preserving") =
    forAll(pavGroups) { gs =>
      import graft.operators.Isotonic
      val f = Isotonic.pav(gs)
      val monotone = f.sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1))
      val bounded = f.forall(x => x >= 0.0 && x <= 1.0)
      val lhs = gs.zip(f).map { case ((n, _), x) => n * x }.sum
      val rhs = gs.map(_._2).sum.toDouble
      monotone && bounded && math.abs(lhs - rhs) <= 1e-9 * math.max(1.0, rhs)
    }

  // ── bounded-buffer top-k aggregators ─────────────────────────────────
  private val longStream: Gen[(List[Long], Int, Int)] = for {
    vs <- Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
    k <- Gen.choose(1, 8)
    splits <- Gen.choose(1, 5)
  } yield (vs, k, splits)

  property("TopKSum reduce+merge over any partitioning = sum of the k " +
      "largest") = forAll(longStream) { case (vs, k, splits) =>
    import graft.functions.TopKSum
    val agg = new TopKSum(k)
    val parts = vs.grouped(math.max(1, vs.size / splits)).toList
    val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
    agg.finish(merged) == vs.sorted.reverse.take(k).sum
  }

  property("MisraGries: estimates undercount by ≤ n/(k+1) and every " +
      "item above the bound is retained, under any partitioning") =
    forAll(for {
      vs <- Gen.nonEmptyListOf(Gen.frequency(
        3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        5 -> Gen.choose(0, 50).map(i => s"c$i")))
      k <- Gen.choose(2, 10)
      splits <- Gen.choose(1, 4)
    } yield (vs, k, splits)) { case (vs, k, splits) =>
      import graft.operators.HeavyHitters
      val agg = new HeavyHitters.MisraGries(k)
      val parts = vs.grouped(math.max(1, vs.size / splits)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val exact = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = vs.size.toDouble / (k + 1)
      val undercountOk = merged.forall { case (item, est) =>
        est <= exact(item) && exact(item) - est <= bound
      }
      val presenceOk = exact.forall { case (item, c) =>
        c <= bound || merged.contains(item)
      }
      merged.size <= k && undercountOk && presenceOk
    }

  // ── web-crawl kernels (WARC / robots / URL / HTTP) ────────────────────
  private val headerName: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(9 -> Gen.alphaNumChar,
      1 -> Gen.const('-'))).map(_.mkString.take(24))
      .suchThat(s => s.nonEmpty && !s.startsWith("-"))
  private val headerValue: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString.trim.take(40))
  private val payload: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  // distinct (case-insensitive) names: header() is documented FIRST-wins
  // on duplicates, so a round-trip property must not demand both values
  private def dedupNames(hs: List[(String, String)]) = {
    val seen = scala.collection.mutable.Set.empty[String]
    hs.filter(h => seen.add(h._1.toLowerCase))
  }
  // re-impose the header contract INSIDE the property: ScalaCheck
  // shrinking does not re-apply suchThat filters through zip/map, so a
  // failing case can shrink to an empty/whitespace name the codecs
  // reject by design — sanitize so any shrunk input stays in-contract
  // (names token-shaped, values with no outer whitespace)
  private def sanitize(hs: List[(String, String)]) = dedupNames(
    hs.map { case (k, v) =>
      (k.filter(c => c.isLetterOrDigit || c == '-').dropWhile(_ == '-'),
        v.trim)
    }.filter(h => h._1.nonEmpty))
  private val warcRecord: Gen[(Seq[(String, String)], Array[Byte])] =
    for {
      n <- Gen.choose(0, 4)
      hs <- Gen.listOfN(n, Gen.zip(headerName, headerValue))
      p <- payload
    } yield (sanitize(hs)
      .filterNot(_._1.equalsIgnoreCase("Content-Length")), p)

  property("WARC encode/decode round trip (both layouts): headers, " +
      "order, and payload bytes survive") =
    forAll(Gen.listOf(warcRecord), Gen.oneOf(true, false)) { (recs, gz) =>
      import graft.functions.WarcCodec
      val back = WarcCodec.decode(WarcCodec.encode(recs, gz))
      back.length == recs.length && back.zip(recs).forall {
        case (got, (hs, p)) =>
          java.util.Arrays.equals(got.payload, p) &&
            hs.forall { case (k, v) => got.header(k).contains(v) }
      }
    }

  private val robotsPath: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(8 -> Gen.alphaLowerChar,
      1 -> Gen.const('/'), 1 -> Gen.const('.')))
      .map(cs => "/" + cs.mkString.take(30))

  property("robots matchLen: a wildcard-free pattern matches exactly " +
      "its prefix extensions, with its own length as precedence") =
    forAll(robotsPath, robotsPath) { (pat, ext) =>
      import graft.functions.RobotsTxt.matchLen
      val p = pat.replace("*", "").replace("$", "")
      matchLen(p, p + ext) == p.length &&
        (matchLen(p, ext) == -1 || ext.startsWith(p))
    }

  property("robots isAllowed: empty policy allows all; 'Disallow: /' " +
      "under * blocks all; the agent's own empty group allows all") =
    forAll(robotsPath) { path =>
      import graft.functions.RobotsTxt.isAllowed
      isAllowed("", "anybot", path) &&
        !isAllowed("User-agent: *\nDisallow: /", "anybot", path) &&
        isAllowed("User-agent: anybot\nDisallow:\n" +
          "User-agent: *\nDisallow: /", "anybot", path)
    }

  private val urlish: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
    host <- Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/b", "/P")
    q <- Gen.oneOf("", "?k=1", "?utm_a=1&k=2", "?utm_only=x")
    frag <- Gen.oneOf("", "#f", "#a#b")
  } yield s"$scheme://$host.com$port$path$q$frag"

  property("canonicalizeUrl is idempotent and fragment-free on URL-ish " +
      "inputs") = forAll(urlish) { u =>
    import graft.functions.UrlFunctions.canonicalizeUrl
    val once = canonicalizeUrl(u)
    canonicalizeUrl(once) == once && !once.contains("#")
  }

  // ── crawl-frontier set algebra (VERDICT r11 #5) ────────────────────────
  // web_frontier's dedup + anti-join stages, stated over the REAL
  // canonicalizer: frontier(discovered, crawled) = distinct canonical
  // keys of the discovered urls minus the already-crawled canonical keys.
  private def frontierKeys(discovered: List[String],
      crawled: Set[String]): Set[String] = {
    import graft.functions.UrlFunctions.canonicalizeUrl
    discovered.map(canonicalizeUrl).toSet -- crawled
  }

  property("frontier shrinkage: feeding emitted keys back as crawled " +
      "empties the frontier; each partial feedback key strictly shrinks " +
      "it by exactly one; crawling more never grows it") =
    forAll(Gen.listOf(urlish), Gen.listOf(urlish)) { (disc, crawledRaw) =>
      import graft.functions.UrlFunctions.canonicalizeUrl
      // a frontier deduplicates on canonical keys, never raw strings
      val crawled = crawledRaw.map(canonicalizeUrl).toSet
      val f1 = frontierKeys(disc, crawled)
      // fixpoint: a recrawl fed every emitted key discovers nothing new
      val fixpoint = frontierKeys(disc, crawled ++ f1).isEmpty
      // strict shrinkage: each emitted key fed back removes exactly
      // itself (emitted keys are canonical — idempotence — and distinct)
      val strict = f1.forall(k =>
        frontierKeys(disc, crawled + k) == f1 - k)
      // anti-monotone: a larger crawled set never grows the frontier
      val antiMono = frontierKeys(disc, crawled ++ crawledRaw.toSet)
        .subsetOf(f1)
      fixpoint && strict && antiMono
    }

  // ── Crawl-delay pacing algebra (web_frontier, VERDICT r12 #7) ─────────
  // not_before_tick(slot, delay) = max(slot−1, ceil((slot−1)·delay/1000))
  // — the scalar twin of WebQueries.notBeforeTickCol. These pin the
  // scheduler algebra: strictly later slots never pace EARLIER, a larger
  // declared delay never paces earlier, the domain-serialization floor
  // always holds, the 1-hour clamp bounds the tick linearly in slot, and
  // the double-division floor the Column actually executes agrees with
  // exact integer arithmetic for every product the clamp permits.
  private val slotM1Gen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 64L),                    // the dense regime
    Gen.choose(0L, 2500000000L))            // a 2.5-billion-URL host
  private val delayGen: Gen[Long] = Gen.oneOf(
    Gen.oneOf(0L, 1L, 999L, 1000L, 1001L, 3599999L, 3600000L),
    Gen.choose(0L, 3600000L))

  property("not_before_tick: strictly monotone in slot, monotone in " +
      "delay, floored by slot−1 (tight iff delay ≤ 1000), and " +
      "clamp-bounded by 3600·(slot−1)") =
    forAll(slotM1Gen, delayGen) { (s, d) =>
      import graft.queries.WebQueries.notBeforeTickModel
      val tick = notBeforeTickModel(s, d)
      (notBeforeTickModel(s + 1, d) > tick) :| "strict in slot" &&
        (notBeforeTickModel(s, math.min(d + 1, 3600000L)) >= tick) :|
          "monotone in delay" &&
        (tick >= s) :| "domain-serialization floor" &&
        ((d > 1000L || tick == s) &&
          (d <= 1000L || s == 0L || tick > s)) :|
          "floor tight exactly when delay ≤ 1000 ms" &&
        (tick <= 3600L * math.max(s, 1L)) :| "1-hour clamp bound"
    }

  property("not_before_tick: the Column's double-division floor equals " +
      "the exact-integer model over the full clamped domain") =
    forAll(slotM1Gen, delayGen) { (s, d) =>
      // exactly what notBeforeTickCol compiles to: long product, +999,
      // correctly-rounded double division by 1000, floor — products stay
      // below 2^53 (2.5e9 · 3.6e6 + 999 < 9.0e15) so this must be exact
      val asSpark = math.max(s,
        math.floor((s * d + 999L).toDouble / 1000.0).toLong)
      asSpark == graft.queries.WebQueries.notBeforeTickModel(s, d)
    }

  property("registrableDomain is a dot-suffix of the host and a fixed " +
      "point of itself") =
    forAll(Gen.nonEmptyListOf(
        Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8)))
      .map(_.take(4).mkString("."))) { host =>
      import graft.functions.UrlFunctions.registrableDomain
      val d = registrableDomain(host)
      (host == d || host.endsWith("." + d)) &&
        registrableDomain(d) == d
    }

  property("HTTP response round trip: status, headers, and body bytes " +
      "survive the parse") =
    forAll(Gen.choose(100, 599), Gen.listOf(Gen.zip(headerName,
        headerValue)), payload) { (status, hs0, body) =>
      import graft.functions.HttpMessage.parseResponse
      val hs = sanitize(hs0)
      val head = s"HTTP/1.1 $status X\r\n" +
        hs.map { case (k, v) => s"$k: $v\r\n" }.mkString + "\r\n"
      val r = parseResponse(head.getBytes("ISO-8859-1") ++ body)
      r.exists(resp => resp.status == status &&
        java.util.Arrays.equals(resp.body, body) &&
        hs.forall { case (k, v) => resp.header(k).contains(v) })
    }

  property("robots sitemaps: inserted Sitemap lines come back verbatim, " +
      "in order, regardless of surrounding groups") =
    forAll(Gen.listOf(urlish)) { urls0 =>
      import graft.functions.RobotsTxt.sitemaps
      // '#' starts a robots comment — a fragment would be (correctly)
      // truncated, so the round-trip property feeds fragment-free urls
      val urls = urls0.map(_.takeWhile(_ != '#'))
      val txt = "User-agent: *\nDisallow: /x\n" +
        urls.map(u => s"Sitemap: $u\n").mkString + "User-agent: b\n"
      sitemaps(txt) == urls.toVector
    }

  // ── little-endian reader/writer twins ─────────────────────────────────
  // the RIFF-family codecs and BMP share ONE reader and (since r14) ONE
  // writer pair; this pins the w16/w32 → u16/u32/i32 round trip over the
  // full value domains so any future edit to either side breaks loudly
  property("LittleEndian w16/w32 round-trip through u16, u32 and i32") =
    forAll(Gen.choose(0, 0xFFFF), Gen.long) { (v16, raw) =>
      val v32 = raw & 0xFFFFFFFFL // the unsigned 32-bit wire domain
      val out = new java.io.ByteArrayOutputStream()
      graft.functions.LittleEndian.w16(out, v16)
      graft.functions.LittleEndian.w32(out, v32)
      val b = out.toByteArray
      Prop.all(
        (b.length == 6) :| "2 + 4 bytes on the wire",
        (graft.functions.LittleEndian.u16(b, 0) == v16) :| "u16",
        (graft.functions.LittleEndian.u32(b, 2) == v32) :| "u32 unsigned",
        (graft.functions.LittleEndian.i32(b, 2) == v32.toInt)
          :| "i32 reads the same bits signed")
    }

  // ── degrade-never-throw fuzz battery over every binary decoder ────────
  // Every codec documents the same degradation contract: malformed input
  // yields None / the well-formed prefix / Nil — NEVER a throw, because a
  // corpus-scale scan cannot afford one bad record aborting a job. Random
  // junk exercises the header/magic guards; BIT-FLIPPED and TRUNCATED
  // valid containers reach the deep parse paths those guards protect.
  private val junkBytes: Gen[Array[Byte]] =
    Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** One bit-flip + one truncation of a valid container. */
  private def mutations(valid: Array[Byte], pos: Int,
      cut: Int): Seq[Array[Byte]] = {
    if (valid.isEmpty) return Seq(valid)
    val flipped = valid.clone()
    val p = math.floorMod(pos, flipped.length)
    flipped(p) = (flipped(p) ^ (1 << math.floorMod(pos, 8))).toByte
    Seq(flipped, valid.take(math.floorMod(cut, valid.length + 1)))
  }

  private def survives(f: Array[Byte] => Any)(bs: Array[Byte]): Boolean =
    try { f(bs); true } catch { case scala.util.control.NonFatal(_) => false }

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "warc" -> (bs => graft.functions.WarcCodec.decode(bs)),
    "wav" -> (bs => graft.functions.WavCodec.decode(bs)),
    "avi" -> (bs => graft.functions.AviCodec.decodeInfo(bs)),
    "image" -> (bs => ImageCodec.decode(bs)),
    "tfrecord" -> (bs => graft.functions.TfRecordCodec.decodeRecords(bs)),
    "tfexample" -> (bs => graft.functions.TfRecordCodec.decodeExample(bs)),
    "http" -> (bs => graft.functions.HttpMessage.parseResponse(bs)),
    "chunked" -> (bs => graft.functions.HttpMessage.decodeChunked(bs)),
    "pdf" -> (bs => graft.functions.PdfCodec.extractPages(bs)))

  property("no decoder throws on random junk") =
    forAll(junkBytes) { bs =>
      Prop.all(decoders.map { case (n, f) =>
        survives(f)(bs) :| s"$n threw" }: _*)
    }

  private val validContainers: Gen[(String, Array[Byte])] = {
    val warc = Gen.zip(Gen.listOf(warcRecord), Gen.oneOf(true, false))
      .map { case (rs, gz) =>
        "warc" -> graft.functions.WarcCodec.encode(rs, gz) }
    val wav = samples.map(s =>
      "wav" -> graft.functions.WavCodec.encodePcm16(8000, s))
    val avi = Gen.listOf(payload).map(fs =>
      "avi" -> graft.functions.AviCodec.encode(4, 3, 40000, fs))
    val tfr = Gen.listOf(payload).map(ps =>
      "tfrecord" -> graft.functions.TfRecordCodec.encodeRecords(ps))
    val png = raster9x8.map { px =>
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, 9, 8, px)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      "png" -> bos.toByteArray
    }
    Gen.oneOf(warc, wav, avi, tfr, png)
  }

  property("no decoder throws on bit-flipped or truncated valid " +
      "containers (any container against any decoder)") =
    forAll(validContainers, Gen.choose(0, 1 << 20),
        Gen.choose(0, 1 << 20)) { case ((_, valid), pos, cut) =>
      Prop.all((for {
        m <- mutations(valid, pos, cut)
        (n, f) <- decoders
      } yield survives(f)(m) :| s"$n threw on a mutated container"): _*)
    }

  property("no string parser throws on arbitrary unicode text") =
    forAll(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue))
        .map(_.mkString)) { s =>
      val parsers: Seq[(String, String => Any)] = Seq(
        "robots.parse" -> (t => graft.functions.RobotsTxt.parse(t)),
        "robots.isAllowed" ->
          (t => graft.functions.RobotsTxt.isAllowed(t, "bot", t)),
        "robots.sitemaps" -> (t => graft.functions.RobotsTxt.sitemaps(t)),
        "robots.crawlDelay" ->
          (t => graft.functions.RobotsTxt.crawlDelayOf(t, "bot")),
        "url.canonicalize" ->
          (t => graft.functions.UrlFunctions.canonicalizeUrl(t)),
        "url.domain" ->
          (t => graft.functions.UrlFunctions.registrableDomain(t)),
        "http.charsetOf" ->
          (t => graft.functions.HttpMessage.charsetOf(t)),
        "alternatives" -> (t => Alternatives.parse(t)),
        "porter" -> (t => graft.functions.PorterStemmer.stem(t)))
      Prop.all(parsers.map { case (n, f) =>
        (try { f(s); true } catch {
          case scala.util.control.NonFatal(_) => false
        }) :| s"$n threw" }: _*)
    }

  // ── bottom-k quantile sketch algebra (r14 core-operator review) ───────
  // the scaladoc's headline claim — the sketch is a pure function of the
  // input MULTISET, independent of fold order, partitioning, and
  // build-vs-merge path — pinned as algebra, not just observed in specs
  private val qsRows: Gen[List[(String, Double)]] = Gen.listOf(
      Gen.zip(Gen.identifier.map(_.take(8)), Gen.chooseNum(-1e6, 1e6)))
    .map(_.distinctBy(_._1)) // the row-unique key contract

  property("QuantileSketch is merge-order independent: any partitioning " +
    "and fold order serializes to the identical sketch") =
    forAll(qsRows, Gen.choose(0, 1000)) { (rows, cut0) =>
      import graft.operators.QuantileSketch.SampleAgg
      val k = 16
      val agg = new SampleAgg(k)
      def fold(rs: Seq[(String, Double)]): Array[Byte] =
        rs.foldLeft(agg.zero)(agg.reduce)
      val whole = agg.finish(fold(rows))
      val cut = if (rows.isEmpty) 0 else cut0 % (rows.length + 1)
      val (l, r) = rows.splitAt(cut)
      val split = agg.finish(agg.merge(fold(l), fold(r)))
      val reversed = agg.finish(fold(rows.reverse))
      whole.toSeq == split.toSeq && whole.toSeq == reversed.toSeq
    }

  property("QuantileSketch below k is exact: the retained sample IS the " +
    "value multiset and every φ-quantile is the true order statistic") =
    forAll(qsRows.map(_.take(15))) { rows =>
      import graft.operators.QuantileSketch._
      val agg = new SampleAgg(16)
      val sk = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      val got = sampleValues(sk)
      val want = rows.map(_._2).sorted.toArray
      totalOf(sk) == rows.length.toLong &&
        got.toSeq == want.toSeq &&
        (rows.isEmpty || Seq((1L, 2L), (1L, 4L), (1L, 1L), (9L, 10L))
          .forall { case (n, d) =>
            quantileAt(sk, n, d).contains(
              want(((n * want.length + d - 1) / d - 1).toInt))
          })
    }

  // ── HLL register algebra ──────────────────────────────────────────────
  private val hllItems: Gen[List[String]] = Gen.listOf(Gen.identifier)

  property("HLL merge is commutative, agrees with union(), and is " +
    "idempotent") = forAll(hllItems, hllItems) { (xs, ys) =>
    import graft.operators.Hll
    val agg = new Hll.SketchAgg(4)
    def build(items: List[String]): Array[Byte] =
      items.foldLeft(agg.zero)(agg.reduce)
    val (a, b) = (build(xs), build(ys))
    val m = new Hll.MergeAgg
    val ab = m.merge(a.clone(), b.clone()).toSeq
    val ba = m.merge(b.clone(), a.clone()).toSeq
    ab == ba && ab == Hll.union(a, b).toSeq &&
      Hll.union(a, a).toSeq == a.toSeq
  }

  // ── binary sign-quantization packing ──────────────────────────────────
  property("BinaryQuant.signWordsOf: word bit i%32 of word i/32 is the " +
    "strict-positive sign of vec(i); padding bits are clear; words stay " +
    "in unsigned-32 range") =
    forAll(Gen.listOf(Gen.chooseNum(-10.0, 10.0)), Gen.choose(1, 80)) {
      (vec, dim) =>
        val words = graft.operators.BinaryQuant.signWordsOf(vec, dim)
        val nWords = (dim + 31) / 32
        words.length == nWords &&
          words.forall(w => w >= 0L && w < (1L << 32)) &&
          (0 until nWords * 32).forall { i =>
            val bit = (words(i / 32) >> (i % 32)) & 1L
            val expect =
              if (i < dim && i < vec.length && vec(i) > 0.0) 1L else 0L
            bit == expect
          }
    }

  // ── banded thresholded Damerau-Levenshtein (VERDICT r15 #4) ────────────
  // multi-byte char included: the kernel's grain is UTF-8 BYTES
  private val dlStr: Gen[String] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'é')).map(_.mkString))

  property("damerauLevenshteinAtMost verdict equals the full kernel for " +
    "every k in -1..8 on arbitrary byte-grain strings") =
    forAll(dlStr, dlStr, Gen.choose(-1, 8)) { (a, b, k) =>
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val d = graft.functions.StringDistances.damerauLevenshtein(ab, bb)
      graft.functions.StringDistances
        .damerauLevenshteinAtMost(ab, bb, k) == (k >= 0 && d <= k)
    }

  property("SQL builder for damerau_levenshtein_at_most accepts any " +
    "plan-time INT constant shape (literal / unary-minus / add) and the " +
    "built expression matches the kernel verdict") = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Literal, UnaryMinus}
    val builder = GraftExtensions.functions
      .find(_._1.funcName == "damerau_levenshtein_at_most").get._3
    forAll(dlStr, dlStr, Gen.choose(-1, 8), Gen.choose(0, 2)) {
      (a, b, k, shape) =>
        val kExpr = shape match {
          case 0 => Literal(k)
          case 1 => Add(Literal(k - 1), Literal(1))
          case _ => UnaryMinus(Literal(-k))
        }
        val lit = (s: String) =>
          Literal.create(s, org.apache.spark.sql.types.StringType)
        val got = builder(Seq(lit(a), lit(b), kExpr))
          .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        val d = graft.functions.StringDistances.damerauLevenshtein(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        got == (k >= 0 && d <= k)
    }
  }
}
