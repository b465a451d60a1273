package graft

import graft.operators.{Classifier, Dedup, GraphOps, Pq, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Round-14 core-operator review regressions: data shapes that used to
  * corrupt results SILENTLY (or crash with a bare NPE / division) must
  * now fail loudly with a message naming the operator — or, for the
  * top-k forms, match the documented exclusion contract.
  *
  * The sharpest prior behavior: md5(NULL) is NULL, so every NULL-text
  * row landed in ONE exact-duplicate group and dropExactDuplicates
  * silently deleted all but one of them. */
class LoudGuardsSpec extends SparkSpec {

  import spark.implicits._

  private def nullTextDocs = Seq(
    (1L, "alpha beta gamma"),
    (2L, null.asInstanceOf[String]),
    (3L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private def msgOf(t: Throwable): String = {
    var c: Throwable = t
    val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("exactGroups / dropExactDuplicates raise on NULL text instead of " +
      "collapsing all NULL-text rows into one dup group") {
    val e1 = intercept[Exception] {
      Dedup.exactGroups(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e1).contains("NULL text"), msgOf(e1))
    val e2 = intercept[Exception] {
      Dedup.dropExactDuplicates(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e2).contains("NULL text"), msgOf(e2))
    // positive control: non-null corpus unchanged
    val groups = Dedup.exactGroups(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(groups.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L))
  }

  test("line dedup raises on NULL text instead of silently dropping the doc") {
    val e = intercept[Exception] {
      Dedup.lineDedupCounts(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e).contains("NULL text"), msgOf(e))
    val e2 = intercept[Exception] {
      Dedup.dropDuplicateLines(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e2).contains("NULL text"), msgOf(e2))
  }

  test("span / shingle / simhash kernels raise a NAMED error on NULL text " +
      "(previously a bare executor NPE)") {
    val e1 = intercept[Exception] {
      Dedup.duplicateSpanCounts(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e1).contains("NULL text"), msgOf(e1))
    val e2 = intercept[Exception] {
      Dedup.minhashSignatures(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e2).contains("NULL text"), msgOf(e2))
    val e3 = intercept[Exception] {
      Dedup.simhashSignatures(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e3).contains("NULL text"), msgOf(e3))
  }

  test("simhashPairs rejects a negative radius instead of returning empty") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = -1)
    }
    assert(e.getMessage.contains("maxHamming"))
  }

  test("groupOverlapExact rejects a NULL group value") {
    val docs = Seq((1L, "a b c d", "s1"), (2L, "a b c d", null))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Dedup.groupOverlapExact(docs, "doc_id", "text", "source")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("Classifier.scoreFrame fails loudly on dim mismatch instead of a " +
      "silently truncated dot product") {
    val train = Seq((Seq(0.0, 0.0), 0), (Seq(1.0, 1.0), 1))
      .toDF("x", "y")
    val m = Classifier.train(train, "x", "y", dim = 2, iters = 2)
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "x")
    val e = intercept[Exception] {
      Classifier.scoreFrame(bad, "x", m).collect()
    }
    assert(msgOf(e).contains("scoreFrame"), msgOf(e))
    // positive control: matching dims still score
    val ok = Classifier.scoreFrame(
      Seq((1L, Seq(1.0, 1.0))).toDF("id", "x"), "x", m).collect()
    assert(ok.length === 1)
  }

  test("Pq.encode and adcScores fail loudly on wrong-dim input") {
    val embs = (0 until 64)
      .map(i => Seq.tabulate(4)(j => (i * 4 + j).toDouble / 10.0))
      .toDF("v")
    val model = Pq.train(embs, "v", m = 2, ksub = 4, maxIter = 3)
    val bad = Seq((7L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val e = intercept[Exception] {
      Pq.encode(bad, "id", "v", model).collect()
    }
    assert(msgOf(e).contains("Pq.encode"), msgOf(e))
    val badCodes = Seq((7L, Seq(0))).toDF("id", "codes")
    val e2 = intercept[Exception] {
      Pq.adcScores(badCodes, model, Seq(1.0, 1.0, 1.0, 1.0)).collect()
    }
    assert(msgOf(e2).contains("adcScores"), msgOf(e2))
  }

  test("pageRank on an empty edge table raises a named error, not a bare " +
      "division by zero") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphOps.pageRankInt(empty, "src", "dst", iters = 1)
    }
    assert(e.getMessage.contains("empty edge table"))
  }

  test("IvfIndex.build rejects a null/mismatched vector instead of " +
      "writing it into a cell=-1 partition probe never reads") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_guard").toString
    val good = (0 until 32).map(i =>
      (i.toLong, Seq(math.cos(i * 0.3), math.sin(i * 0.3))))
      .toDF("id", "v")
    // positive control: clean corpus builds and probes
    graft.operators.IvfIndex.build(good, "id", "v", s"$dir/ok", ncells = 2)
    assert(graft.operators.IvfIndex.probe(spark, s"$dir/ok", "id",
      Seq(1.0, 0.0), k = 3, nprobe = 2).count() === 3)
    // a null vector must fail the BUILD loudly (r13 fixed append only)
    val bad = good.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("id", "v"))
    val e = intercept[Exception] {
      graft.operators.IvfIndex.build(bad, "id", "v", s"$dir/bad", ncells = 2)
    }
    assert(msgOf(e).contains("IvfIndex.build"), msgOf(e))
  }

  test("Packing rejects NULL and negative token counts instead of " +
      "corrupting the global prefix sum") {
    val nullTok = Seq((1L, java.lang.Long.valueOf(3L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      graft.operators.Packing.packSequences(nullTok, "doc_id", "n_tokens",
        Seq("doc_id"), seqLen = 4).collect()
    }
    assert(msgOf(e).contains("Packing.packSequences"), msgOf(e))
    val negTok = Seq((1L, 3L), (2L, -5L)).toDF("doc_id", "n_tokens")
    val e2 = intercept[Exception] {
      graft.operators.Packing.lengthBuckets(negTok, "doc_id", "n_tokens",
        binSize = 4, batchSize = 2).collect()
    }
    assert(msgOf(e2).contains("Packing.lengthBuckets"), msgOf(e2))
    // positive control: the valid frame still packs
    val ok = graft.operators.Packing.packSequences(
      Seq((1L, 3L), (2L, 5L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", Seq("doc_id"), seqLen = 4).collect()
    assert(ok.length === 2)
  }

  test("Hll.MergeAgg rejects sketches of different sizes instead of " +
      "silently dropping tail registers") {
    val a = graft.operators.Hll.groupSketches(
      Seq(("g", "x"), ("g", "y")).toDF("g", "v"), col("v"), Seq("g"), p = 4)
      .select(col("hll")).first().getAs[Array[Byte]](0)
    val b = graft.operators.Hll.groupSketches(
      Seq(("g", "x")).toDF("g", "v"), col("v"), Seq("g"), p = 5)
      .select(col("hll")).first().getAs[Array[Byte]](0)
    val agg = new graft.operators.Hll.MergeAgg
    val e = intercept[IllegalArgumentException] { agg.merge(a, b) }
    assert(e.getMessage.contains("size mismatch"))
    // positive control: equal-p sketches merge
    assert(agg.merge(a.clone(), a.clone()).length === a.length)
  }

  test("TextAnalysis kernel frames raise a NAMED error on NULL text " +
      "(previously a bare NPE; gzipRatioFrame silently conflated NULL " +
      "with empty)") {
    import graft.operators.TextAnalysis
    val e = intercept[Exception] {
      TextAnalysis.cleanVerdictFrame(nullTextDocs, "doc_id", "text",
        minTokens = 1, maxDupLineFrac = 1.0, maxTopBigramFrac = 1.0,
        minQuality = 0.0, requiredLang = None).collect()
    }
    assert(msgOf(e).contains("cleanVerdictFrame"), msgOf(e))
    val e2 = intercept[Exception] {
      TextAnalysis.gzipRatioFrame(nullTextDocs, "doc_id", "text").collect()
    }
    assert(msgOf(e2).contains("gzipRatioFrame"), msgOf(e2))
    // empty text keeps its documented ratio-0 row
    val ok = TextAnalysis.gzipRatioFrame(
      Seq((1L, ""), (2L, "some text")).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getDouble(3))
      .toMap
    assert(ok(1L) === 0.0 && ok(2L) > 0.0)
  }

  test("Decontaminate raises a NAMED error on NULL text") {
    val bench = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.operators.Decontaminate.overlaps(nullTextDocs, "doc_id", "text",
        bench, "doc_id", "text", n = 2, minOverlap = 1).collect()
    }
    assert(msgOf(e).contains("NULL text"), msgOf(e))
  }

  test("hammingRerankTopK excludes zero-norm candidates from the rerank") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 0.0)),
      (3L, Seq(0.7, 0.7))
    ).toDF("id", "v")
    val got = graft.operators.BinaryQuant.hammingRerankTopK(corpus, "id",
        "v", dim = 2, query = Seq(1.0, 0.0), k = 3, coarseK = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("dropNearDuplicatesBest survives duplicate weight rows — the best " +
      "member used to land in the losers anti-join and vanish") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // id 2 is the best copy but carries TWO weight rows
    val weights = Seq((1L, 0.1), (2L, 0.9), (2L, 0.9), (3L, 0.5))
      .toDF("doc_id", "w")
    val kept = Dedup.dropNearDuplicatesBest(docs, "doc_id", pairs,
        weights, "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("topK / topKForQueries exclude degenerate (zero-norm) corpus " +
      "vectors — the heap form's contract") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 0.0)), // zero norm: cosine is null
      (3L, Seq(0.5, 0.5))
    ).toDF("id", "v")
    val got = SimilaritySearch.topK(corpus, "id", "v", Seq(1.0, 0.0), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
    val queries = Seq((10L, Seq(1.0, 0.0))).toDF("qid", "qv")
    val got2 = SimilaritySearch.topKForQueries(corpus, queries,
        "id", "v", "qid", "qv", k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got2 === Set(1L, 3L))
    // and the heap form agrees row-for-row
    val got3 = SimilaritySearch.topKForQueriesHeap(corpus, "id", "v",
        Seq((10L, Array(1.0, 0.0))), k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got3 === got2)
  }

  test("hammingRerankTopK: degenerate vectors cannot starve the coarse " +
      "stage — they used to occupy coarseK slots and leave < k results") {
    // an all-negative query sign-packs to all-zero words, so every
    // degenerate row (zero-norm / null / dim-drifted → all-zero code)
    // ties at Hamming 0 and, with smaller ids, wins every coarseK slot
    val corpus = Seq(
      (1L, Seq(0.0, 0.0)),                   // zero norm
      (2L, null.asInstanceOf[Seq[Double]]),  // null vector
      (3L, Seq(-1.0)),                       // dim-drifted
      (10L, Seq(-1.0, -2.0)),                // valid
      (11L, Seq(-2.0, -1.0))                 // valid
    ).toDF("id", "v")
    val got = graft.operators.BinaryQuant.hammingRerankTopK(corpus, "id",
        "v", dim = 2, query = Seq(-1.0, -1.0), k = 2, coarseK = 2)
      .collect()
    assert(got.map(_.getLong(0)).toSet === Set(10L, 11L))
    assert(got.forall(!_.isNullAt(1)))
  }

  test("unimaxAllocation / sqrtTemperatureAllocation raise loudly on a " +
      "data-grained group column instead of pulling the corpus") {
    import graft.operators.Sampling
    val dataGrained = (0 until 10)
      .map(i => (s"doc_$i", 100L)).toDF("grp", "n_tokens")
    val e1 = intercept[Exception] {
      Sampling.unimaxAllocation(dataGrained, "grp", col("n_tokens"),
        budget = 500L, maxEpochs = 2, maxGroups = 4)
    }
    assert(msgOf(e1).contains("unimaxAllocation") &&
      msgOf(e1).contains("data-grained"), msgOf(e1))
    val e2 = intercept[Exception] {
      Sampling.sqrtTemperatureAllocation(dataGrained, "grp",
        col("n_tokens"), budget = 500L, maxGroups = 4)
    }
    assert(msgOf(e2).contains("sqrtTemperatureAllocation") &&
      msgOf(e2).contains("data-grained"), msgOf(e2))
    // positive control: at-or-under the cap both still allocate
    val ok = Sampling.unimaxAllocation(dataGrained, "grp", col("n_tokens"),
      budget = 500L, maxEpochs = 2, maxGroups = 10)
    assert(ok.count() === 10L)
    val ok2 = Sampling.sqrtTemperatureAllocation(dataGrained, "grp",
      col("n_tokens"), budget = 500L, maxGroups = 10)
    assert(ok2.agg(sum("alloc")).collect()(0).getLong(0) === 500L)
  }
}
