package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A4/S7 — the pivoted extraction-stats table
  * (qdrant_text_loader.py:78-120; golden shape
  * extraction_metadata/test_extraction_metadata.csv).
  *
  * Rows `"{year} todas questoes"` / `"{year} questoes add"`, one column per
  * subject, cell = count; merged idempotently with any previous stats file.
  */
object LoadStats {

  val Subjects = Seq("eng", "lang", "spani", "natu", "math", "huma")

  /** counts: (year INT, subject STRING, kind STRING ∈ {todas questoes,
    * questoes add}, n LONG) → pivoted stats frame. */
  def pivot(counts: DataFrame): DataFrame = {
    val keyed = counts.withColumn("row_key",
      concat_ws(" ", col("year"), col("kind")))
    keyed.groupBy(col("row_key")).pivot("subject", Subjects)
      .agg(first(col("n")))
      .select(col("row_key") +:
        Subjects.map(s => coalesce(col(s), lit(0L)).as(s)): _*)
      .orderBy(col("row_key"))
  }

  /** Merge new counts into an existing stats CSV (read-old union new,
    * new rows win), then pivot — the reference's read-modify-write merge
    * (qdrant_text_loader.py:105-120) as an idempotent batch op. */
  def mergeWithExisting(spark: SparkSession, existingCsv: Option[String],
      counts: DataFrame): DataFrame = {
    val newPivot = pivot(counts)
    existingCsv match {
      case Some(p) if new java.io.File(p).exists() =>
        val old = spark.read.option("header", "true")
          .option("inferSchema", "true").csv(p)
          .select(newPivot.columns.toIndexedSeq.map(c =>
            if (c == "row_key") col(c) else col(c).cast("long").as(c)): _*)
        val newKeys = newPivot.select("row_key")
        old.join(newKeys, Seq("row_key"), "left_anti")
          .unionByName(newPivot)
          .orderBy(col("row_key"))
      case _ => newPivot
    }
  }

  /** S7 sink: single-file CSV with header (stats are tiny — coalesce(1)
    * is correct here, not a scale concern). */
  def writeCsv(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
