package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal: segments whose exact text recurs in
  * many distinct documents (navigation chrome, license headers, cookie
  * banners) are stripped from every document — the corpus-frequency
  * paragraph/line filter of the CCNet-style cleaning recipe, as opposed
  * to [[Dedup]] which drops whole near-duplicate documents.
  *
  * Segmentation is the caller's: pass any `array<string>` column —
  * `split(text, '\n')` for line-level, fixed word windows (see
  * [[wordWindows]]) for unpunctuated text. Segment ORDER is preserved
  * in the cleaned output.
  *
  * Scale: the document-frequency count shuffles (xxhash64(segment), id)
  * pairs — 16 bytes/row, never the text. The frequent-segment strings
  * themselves are recovered by a semi-join and broadcast to both the
  * removal anti-join and nothing else; boilerplate is small by nature
  * (a set that recurs across many docs), and `maxFrequent` fails loudly
  * if that assumption breaks rather than silently ballooning the
  * broadcast. The rebuild is one doc-keyed aggregation. */
object Boilerplate {

  /** Fixed-size word windows as segments: consecutive `width`-word
    * chunks of `textCol` split on single spaces (the tail chunk may be
    * shorter). The segmentation for text without line structure. */
  def wordWindows(textCol: Column, width: Int): Column = {
    require(width >= 1, "width must be >= 1")
    val words = split(textCol, " ")
    transform(
      sequence(lit(0),
        ((size(words) + lit(width - 1)) / lit(width)).cast("int") - lit(1)),
      i => concat_ws(" ", slice(words, i * lit(width) + lit(1), lit(width))))
  }

  /** Strip segments occurring in >= `minDocs` distinct documents.
    * Returns the input columns plus `clean_segs` (surviving segments,
    * original order) and `clean_text` (rejoined with `sep`; empty string
    * when every segment was boilerplate). */
  def stripFrequentSegments(df: DataFrame, idCol: String, segsCol: Column,
      minDocs: Long, sep: String = " ",
      maxFrequent: Long = 100000L): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would strip everything)")
    Seq("_pos", "_seg", "_h", "clean_segs", "clean_text").foreach { c =>
      require(!df.columns.contains(c),
        s"stripFrequentSegments: input already has reserved column '$c'")
    }
    val exploded = df.select(col(idCol).as("_id"),
        posexplode(segsCol).as(Seq("_pos", "_seg")))
    // doc-frequency over 8-byte segment hashes; exact strings recovered
    // only for the (small) frequent set via semi-join.
    // materialized (r16): the frequent-hash table is tiny (≤ maxFrequent
    // rows by the guard below) but was evaluated TWICE — once by the
    // guard count and again by the recovery semi-join — and each
    // evaluation re-ran the corpus explode + doc-frequency shuffle.
    val freqHashes = exploded
      .select(col("_id"), xxhash64(col("_seg")).as("_h"))
      .groupBy("_h").agg(countDistinct("_id").as("_df"))
      .filter(col("_df") >= minDocs)
      .localCheckpoint()
    val nFrequent = freqHashes.count()
    require(nFrequent <= maxFrequent,
      s"stripFrequentSegments: $nFrequent frequent segments exceeds " +
        s"maxFrequent=$maxFrequent — not boilerplate-shaped; raise the " +
        "threshold or the cap explicitly")
    val freqSegs = exploded.select(col("_seg"), xxhash64(col("_seg")).as("_h"))
      .join(freqHashes.select("_h"), "_h")
      .select("_seg").distinct()
    // anti-join on the exact STRING (the hash only nominated candidates,
    // so a hash collision can never delete an innocent segment).
    val kept = exploded.join(broadcast(freqSegs), Seq("_seg"), "left_anti")
    val rebuilt = kept.groupBy("_id")
      .agg(transform(array_sort(collect_list(struct(col("_pos"), col("_seg")))),
        s => s.getField("_seg")).as("clean_segs"))
      .withColumn("clean_text", concat_ws(sep, col("clean_segs")))
    df.join(rebuilt, col(idCol) === col("_id"), "left")
      .drop("_id")
      .withColumn("clean_segs",
        coalesce(col("clean_segs"), array().cast("array<string>")))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
