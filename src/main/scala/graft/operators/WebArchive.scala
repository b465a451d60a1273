package graft.operators

import graft.functions.WarcCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC ingestion as a relational operator: one binary archive column →
  * one row per contained record, through the real [[WarcCodec]] parser.
  * The first step of every CommonCrawl-derived pipeline (C4, CCNet,
  * RefinedWeb): records() → filter WARC-Type = response → the text
  * stack (strip_html, lang-id, quality, dedup) takes over.
  *
  * Scale shape: archives parse independently per row (crawls ship as
  * many ~1 GB member-gzipped files — one row each under a binaryFile
  * read), so the explode is embarrassingly parallel and nothing
  * shuffles until the caller keys the OUTPUT; undecodable archives
  * degrade to zero rows, never a thrown scan. */
object WebArchive {

  /** (idCol, rec_idx, warc_type, target_uri, content_length,
    * payload_utf8) per record, in archive order. */
  def records(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, String, String, Long, String)]
      else WarcCodec.decode(bytes).zipWithIndex.map { case (r, i) =>
        (i, r.warcType.getOrElse(""), r.targetUri.getOrElse(""),
          r.payload.length.toLong, new String(r.payload, "UTF-8"))
      })
    df.select(col(idCol).cast("long").as(idCol),
        explode(parse(col(bytesCol))).as("_r"))
      .select(col(idCol), col("_r._1").as("rec_idx"),
        col("_r._2").as("warc_type"), col("_r._3").as("target_uri"),
        col("_r._4").as("content_length"), col("_r._5").as("payload"))
  }
}
