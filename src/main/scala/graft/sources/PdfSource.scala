package graft.sources

import graft.functions.PdfCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2/S3 on RAW PDF BYTES: directory scan → per-page text and image
  * rows, in the exact `pages` schema the extract pipeline consumes
  * (FIXTURES.md A.1) — so `ExtractPipeline.extract` runs end-to-end from
  * files on disk, like the reference's fitz loop
  * (`enem_pdf_extractor.py:236,:297-335`), for the pure-JVM-decodable
  * subset PdfCodec documents.
  *
  * Scale shape: `binaryFile` is a standard Spark source (splittable file
  * listing, one row per file, streams content lazily); parsing runs in a
  * per-partition map, so 10k PDFs decode across the cluster with no
  * driver involvement. Whole-file rows mean one task holds one PDF in
  * memory — fine for document-sized inputs; media-scale payloads take
  * the [[graft.operators.Multimodal.balancedBySize]] path instead. */
object PdfSource {

  /** (file_name, page_idx, page_text, has_images, image_names) — one row
    * per page of every `*.pdf` under `dir`. */
  def pages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        PdfCodec.extractPages(bytes).map(p =>
          (name, p.pageIdx, p.text, p.hasImages, p.imageNames))
      }
      .toDF("file_name", "page_idx", "page_text", "has_images",
        "image_names")
  }

  /** (file_name, page_idx, image_name, filter, image_bytes) — one row per
    * image XObject; DCTDecode payloads are writable .jpg files as-is
    * (pair with [[graft.operators.Multimodal.writeBinaryFiles]] for the
    * reference's one-PNG-per-page-image sink). */
  def images(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        PdfCodec.extractImages(bytes).map(im =>
          (name, im.pageIdx, im.name, im.filter, im.bytes))
      }
      .toDF("file_name", "page_idx", "image_name", "filter", "image_bytes")
  }
}
