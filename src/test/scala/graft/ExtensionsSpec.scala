package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("SQL cosine_similarity/vector_dot agree with the Column API") {
    import spark.implicits._
    Seq((Seq(1.0, 0.0, 2.0), Seq(0.5, 1.0, -1.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val row = spark.sql(
      """SELECT round(cosine_similarity(a, b), 9) AS cos,
        |round(vector_dot(a, b), 9) AS dot FROM vecs""".stripMargin).first()
    val dot = 1.0 * 0.5 + 0.0 * 1.0 + 2.0 * -1.0
    val cos = dot / (math.sqrt(5.0) * math.sqrt(0.25 + 1.0 + 1.0))
    assert(row.getDouble(0) === BigDecimal(cos).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(1) === -1.5)
  }

  test("SQL hash_embed matches the Column API and rejects non-literal dim") {
    import spark.implicits._
    Seq(("some document text")).toDF("t").createOrReplaceTempView("docs_t")
    val viaSql = spark.sql("SELECT hash_embed(t, 16) AS v FROM docs_t")
      .first().getSeq[Double](0)
    val viaCol = Seq(("some document text")).toDF("t")
      .select(graft.functions.Fingerprints.hashEmbed(col("t"), 16).as("v"))
      .first().getSeq[Double](0)
    assert(viaSql === viaCol)
    intercept[Exception] {
      spark.sql("SELECT hash_embed(t, length(t)) FROM docs_t").collect()
    }
  }

  test("SQL l2_normalize and quantize_int8 agree with the Column API " +
      "and null out degenerate vectors") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    Seq((Seq(3.0, 0.0, -4.0)), (Seq(0.0, 0.0, 0.0)))
      .toDF("v").createOrReplaceTempView("unitvecs")
    val rows = spark.sql(
      """SELECT transform(l2_normalize(v), x -> round(x, 9)) AS u,
        |quantize_int8(v) AS q
        |FROM unitvecs""".stripMargin).collect()
    assert(rows(0).getSeq[Double](0) === Seq(0.6, 0.0, -0.8))
    assert(rows(0).getSeq[Byte](1) === Seq[Byte](95, 0, -127))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    // interpreted eval path (no codegen) produces identical values
    val viaCol = Seq(Seq(3.0, 0.0, -4.0)).toDF("v")
      .select(transform(VectorFunctions.l2Normalize(col("v")),
          x => round(x, 9)).as("u"),
        VectorFunctions.quantizeInt8(col("v")).as("q"))
      .first()
    assert(viaCol.getSeq[Double](0) === Seq(0.6, 0.0, -0.8))
    assert(viaCol.getSeq[Byte](1) === Seq[Byte](95, 0, -127))
  }

  test("SQL simhash64 and minhash_signature run and are deterministic") {
    val df = spark.sql(
      """SELECT simhash64(array('a', 'b', 'c')) AS sh,
        |minhash_signature(array('x y z', 'y z w'), 8) AS mh""".stripMargin)
    val r1 = df.first()
    val r2 = df.first()
    assert(r1.getLong(0) === r2.getLong(0))
    assert(r1.getSeq[Long](1) === r2.getSeq[Long](1))
    assert(r1.getSeq[Long](1).length === 8)
  }

  test("SQL damerau_levenshtein matches the kernel incl. the full-DL pin") {
    val r = spark.sql(
      """SELECT damerau_levenshtein('CA', 'ABC') AS a,
        |damerau_levenshtein('widget', 'wigdet') AS b,
        |damerau_levenshtein('', 'xy') AS c,
        |damerau_levenshtein(CAST(NULL AS STRING), 'x') AS d""".stripMargin)
      .first()
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 2)
    assert(r.isNullAt(3))
  }

  test("SQL damerau_levenshtein_at_most matches the banded kernel " +
      "verdict; k may be any plan-time INT constant; null-intolerant") {
    val r = spark.sql(
      """SELECT damerau_levenshtein_at_most('CA', 'ABC', 2) AS a,
        |damerau_levenshtein_at_most('CA', 'ABC', 1) AS b,
        |damerau_levenshtein_at_most('widget', 'wigdet', 1) AS c,
        |damerau_levenshtein_at_most(CAST(NULL AS STRING), 'x', 2) AS d""".stripMargin)
      .first()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.getBoolean(2) === true)
    assert(r.isNullAt(3))
    // constant-foldable k (ADVICE r15): `-1` arrives as UnaryMinus over
    // a literal and `1 + 1` as Add — both must fold, not reject
    val f = spark.sql(
      """SELECT damerau_levenshtein_at_most('a', 'b', 1 + 1) AS a,
        |damerau_levenshtein_at_most('abc', 'abc', -1) AS b""".stripMargin)
      .first()
    assert(f.getBoolean(0) === true)  // d('a','b') = 1 ≤ 2
    assert(f.getBoolean(1) === false) // k < 0 is always false
    // a genuinely non-constant k still fails loudly at plan time
    val e = intercept[Exception] {
      spark.range(1).createOrReplaceTempView("ks")
      spark.sql(
        "SELECT damerau_levenshtein_at_most('a', 'b', CAST(id AS INT)) " +
          "FROM ks").collect()
    }
    assert(e.getMessage.contains("constant integer"), e.getMessage)
  }

  test("SQL jaro_winkler matches the kernel incl. boost gate and nulls") {
    val r = spark.sql(
      """SELECT jaro_winkler('martha', 'marhta') AS a,
        |jaro_winkler('abcdefgh', 'abcdzzzz') AS b,
        |jaro_winkler('', '') AS c,
        |jaro_winkler(CAST(NULL AS STRING), 'x') AS d""".stripMargin)
      .first()
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.getDouble(1) === 0.6666666666666666) // jaro ≤ 0.7: no boost
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3))
  }

  test("SQL dhash64 matches the kernel; undecodable and null payloads " +
    "are NULL (null-producing codegen path)") {
    import spark.implicits._
    val pgm = ("P5 16 16 255\n".getBytes("US-ASCII") ++
      Array.tabulate(256)(i => ((i * 7 + (i / 16) * 31) % 256).toByte))
    Seq((1L, pgm), (2L, "not an image".getBytes("UTF-8")),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes").createOrReplaceTempView("imgs")
    val rows = spark.sql(
      "SELECT id, dhash64(bytes) AS h FROM imgs ORDER BY id").collect()
    val expected = graft.functions.ImageCodec.dHash64(pgm).get
    assert(rows(0).getLong(1) === expected)
    assert(rows(1).isNullAt(1)) // undecodable non-null input → null OUTPUT
    assert(rows(2).isNullAt(1)) // null input short-circuits
  }

  test("SQL audio_fingerprint64 matches the kernel; undecodable, " +
    "too-short, and null payloads are NULL") {
    import spark.implicits._
    val wav = graft.functions.WavCodec.encodePcm16(8000,
      Array.tabulate(800)(i =>
        (0.2f + (i / 100) * 0.1f) * (if (i % 2 == 0) 1 else -1)))
    val short = graft.functions.WavCodec.encodePcm16(8000,
      Array.fill(10)(0.5f)) // decodes, but < 65 samples → no frames
    Seq((1L, wav), (2L, "junk".getBytes("UTF-8")), (3L, short),
        (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes").createOrReplaceTempView("wavs")
    val rows = spark.sql(
      "SELECT id, audio_fingerprint64(bytes) AS h FROM wavs ORDER BY id")
      .collect()
    val expected = graft.functions.WavCodec
      .decode(wav).flatMap(graft.functions.WavCodec.fingerprint64).get
    assert(rows(0).getLong(1) === expected)
    assert(rows(1).isNullAt(1))
    assert(rows(2).isNullAt(1))
    assert(rows(3).isNullAt(1))
  }
}
