package graft

import org.apache.spark.sql.functions._

/** S1 — the directory scan as a Spark source: `binaryFile` format with a
  * path-glob filter and `input_file_name`-derived fields, exercised over
  * the reference's committed artifacts (no PDF parser needed for the scan
  * itself — content rides as an opaque binary column, the multimodal
  * pattern). */
class SourcesSpec extends SparkSpec {

  private val refDir = "/root/reference/pdf_content_to_files/2023_D2_"

  test("S1: binaryFile directory scan with glob filter and filename fields") {
    assume(new java.io.File(refDir).isDirectory)
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(refDir)
      .select(col("path"), col("length"), col("content"))
      .withColumn("file", element_at(split(col("path"), "/"), -1))
      .withColumn("year",
        regexp_extract(col("file"), "(20\\d{2})", 1).cast("int"))
      .withColumn("subject", regexp_extract(col("file"), "_(.{3,}?)_", 1))
    val rows = scanned.collect()
    assert(rows.length === 2) // math + natu JSONs; TXTs excluded by the glob
    val bySubject = rows.map(r =>
      r.getAs[String]("subject") -> r.getAs[Long]("length")).toMap
    assert(bySubject.keySet === Set("math", "natu"))
    assert(rows.forall(_.getAs[Int]("year") == 2023))
    // content is the real bytes (matches on-disk length).
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("content").length ===
        r.getAs[Long]("length"))
    }
  }
}
