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

  /** (idCol, rec_idx, warc_type, target_uri, refers_to, content_length,
    * payload_utf8) per record, in archive order. `refers_to` is the
    * WARC-Refers-To header ('' when absent) — the back-pointer
    * conversion/revisit records carry to their source record. */
  def records(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      if (bytes == null)
        Seq.empty[(Int, String, String, String, Long, String)]
      else WarcCodec.decode(bytes).zipWithIndex.map { case (r, i) =>
        (i, r.warcType.getOrElse(""), r.targetUri.getOrElse(""),
          r.header("WARC-Refers-To").getOrElse(""),
          r.payload.length.toLong, new String(r.payload, "UTF-8"))
      })
    df.select(col(idCol).cast("long").as(idCol),
        explode(parse(col(bytesCol))).as("_r"))
      .select(col(idCol), col("_r._1").as("rec_idx"),
        col("_r._2").as("warc_type"), col("_r._3").as("target_uri"),
        col("_r._4").as("refers_to"),
        col("_r._5").as("content_length"), col("_r._6").as("payload"))
  }

  /** WARC response records parsed as HTTP messages — the step between
    * [[records]] and the HTML/text stack: crawl archives store the RAW
    * HTTP exchange, so target text sits behind a status line and a
    * Content-Type whose charset decides the byte→text decode. One row
    * per parseable HTTP response record: (idCol, rec_idx, target_uri,
    * status, content_type, charset, body_text); non-response records
    * and non-HTTP blocks drop (degrade, never throw). Same scale shape
    * as [[records]] — archives parse independently per row. */
  def httpResponses(df: DataFrame, idCol: String,
      bytesCol: String): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, String, Int, String, String, String)]
      else WarcCodec.decode(bytes).zipWithIndex.flatMap { case (r, i) =>
        if (!r.warcType.contains("response")) None
        else graft.functions.HttpMessage.parseResponse(r.payload)
          .map { resp =>
            val ct = resp.header("Content-Type").getOrElse("")
            val cs = graft.functions.HttpMessage.charsetOf(ct)
            // de-chunk when declared; fall back to the raw bytes when
            // the block was stored de-chunked despite the header
            val body =
              if (resp.header("Transfer-Encoding")
                  .exists(_.toLowerCase.contains("chunked")))
                graft.functions.HttpMessage.decodeChunked(resp.body)
                  .getOrElse(resp.body)
              else resp.body
            (i, r.targetUri.getOrElse(""), resp.status, ct, cs,
              graft.functions.HttpMessage.decodeBody(body, cs))
          }
      })
    df.select(col(idCol).cast("long").as(idCol),
        explode(parse(col(bytesCol))).as("_r"))
      .select(col(idCol), col("_r._1").as("rec_idx"),
        col("_r._2").as("target_uri"), col("_r._3").as("status"),
        col("_r._4").as("content_type"), col("_r._5").as("charset"),
        col("_r._6").as("body_text"))
  }

  /** WET-style text extraction (the CommonCrawl `*.warc.wet` conversion
    * product): WARC-in → `conversion`-record WARC-out with stripped
    * plain-text payloads — the ingest→extract→emit symmetry on the
    * archive axis. Per input archive row, every WARC `response` record
    * whose payload is a parseable HTTP 200 with a text-family content
    * type contributes one `conversion` record: html bodies go through
    * the [[Markup.htmlToText]] strip stack (tags → entities →
    * whitespace), other text bodies pass through verbatim after the
    * charset decode
    * (+ de-chunking when declared); non-text, non-200, and non-response
    * records drop. Each conversion record carries WARC-Type: conversion,
    * the source's WARC-Target-URI, WARC-Refers-To = the source record's
    * WARC-Record-ID, and Content-Type: text/plain — the standard WET
    * record shape (ISO 28500 §6.8). Output: (idCol, wet BINARY), one
    * row per input archive that produced ≥ 1 conversion record.
    * `warcinfo = true` prepends the conventional `warcinfo` leader
    * record (each output row IS a small WET file; the official product
    * opens with one describing the conversion software).
    *
    * Scale shape: the parse explode and the html strip are row-grain
    * (the strip is the codegen'd regexp chain, not a UDF); the only
    * shuffle is the per-archive regroup for the writer, keyed by the
    * input row id at input-row grain, and each group is bounded by
    * records-per-archive. WARC-in is the ~1 GB-member crawl layout —
    * one row each under a binaryFile read — so nothing here exceeds
    * single-archive memory at any corpus size. */
  def wetConversion(df: DataFrame, idCol: String, bytesCol: String,
      gzipPerRecord: Boolean = false,
      warcinfo: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    val parse = udf((bytes: Array[Byte]) =>
      if (bytes == null)
        Seq.empty[(Int, String, String, Int, String, String)]
      else WarcCodec.decode(bytes).zipWithIndex.flatMap { case (r, i) =>
        if (!r.warcType.contains("response")) None
        else graft.functions.HttpMessage.parseResponse(r.payload)
          .map { resp =>
            val ct = resp.header("Content-Type").getOrElse("")
            val cs = graft.functions.HttpMessage.charsetOf(ct)
            val body =
              if (resp.header("Transfer-Encoding")
                  .exists(_.toLowerCase.contains("chunked")))
                graft.functions.HttpMessage.decodeChunked(resp.body)
                  .getOrElse(resp.body)
              else resp.body
            (i, r.header("WARC-Record-ID").getOrElse(""),
              r.targetUri.getOrElse(""), resp.status, ct.toLowerCase,
              graft.functions.HttpMessage.decodeBody(body, cs))
          }
      })
    val rows = df.select(col(idCol).cast("long").as(idCol),
        explode(parse(col(bytesCol))).as("_r"))
      .select(col(idCol), col("_r._1").as("rec_idx"),
        col("_r._2").as("rec_id"), col("_r._3").as("uri"),
        col("_r._4").as("status"), col("_r._5").as("ct"),
        col("_r._6").as("body"))
      .filter(col("status") === 200 && col("ct").startsWith("text/"))
      .withColumn("wet_text",
        when(col("ct").startsWith("text/html"),
          Markup.htmlToText(col("body"))).otherwise(col("body")))
    val leader: Seq[(Seq[(String, String)], Array[Byte])] =
      if (!warcinfo) Seq.empty
      else Seq((Seq("WARC-Type" -> "warcinfo",
        "Content-Type" -> "application/warc-fields"),
        "software: graft-wet\r\n".getBytes("UTF-8")))
    val enc = udf((recs: Seq[Row]) =>
      WarcCodec.encode(leader ++ recs.map(r => (Seq(
        "WARC-Type" -> "conversion",
        "WARC-Target-URI" -> r.getString(2),
        "WARC-Refers-To" -> r.getString(1),
        "Content-Type" -> "text/plain"),
        r.getString(3).getBytes("UTF-8"))), gzipPerRecord))
    rows.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("rec_idx"), col("rec_id"),
        col("uri"), col("wet_text")))).as("_rs"))
      .select(col(idCol), enc(col("_rs")).as("wet"))
  }

  /** Robots-compliance decisions (RFC 9309) over a crawled-page table —
    * the relational form of [[graft.functions.RobotsTxt.isAllowed]]:
    * each host's robots.txt parses ONCE into an exploded
    * (host, allow, pattern) rule table restricted to `agent`'s group
    * (exact token else `*`), pages join it BY HOST, the wildcard
    * matcher scores each (path, rule) row, and the RFC decision —
    * longest match wins, Allow wins length ties, no match → allowed —
    * is one map-side-combinable `max(struct(match_len, allow))` per
    * page. Output: (idCol, hostCol, pathCol, allowed).
    *
    * Scale shape: the rule table is hosts-sized (small — broadcast it
    * when the host dimension fits, which it does for any real crawl's
    * per-shard slice); the per-row match work is bounded by
    * rules-per-host; the argmax carries only (long ids, int, boolean)
    * through the shuffle. Pages on hosts with no robots.txt or no
    * applicable group are allowed per the RFC — the LEFT join + final
    * coalesce(true) keeps every input row. */
  def robotsDecisions(pages: DataFrame, idCol: String, hostCol: String,
      pathCol: String, robots: DataFrame, rHostCol: String,
      txtCol: String, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase
    val rulesUdf = udf((txt: String) => {
      val gs = graft.functions.RobotsTxt.parse(if (txt == null) "" else txt)
      gs.get(agentLc).orElse(gs.get("*"))
        .map(_.map(r => (r.allow, r.pattern))).getOrElse(Vector.empty)
    })
    val matchUdf = udf((pattern: String, path: String) =>
      graft.functions.RobotsTxt.matchLen(pattern,
        if (path == null) "" else path))
    val rules = robots.select(col(rHostCol).as("_host"),
        explode_outer(rulesUdf(col(txtCol))).as("_r"))
      .select(col("_host"), col("_r._1").as("_allow"),
        col("_r._2").as("_pat"))
    pages.select(col(idCol).as("_id"), col(hostCol).as("_host"),
        col(pathCol).as("_path"))
      .join(rules, Seq("_host"), "left")
      .withColumn("_ml", when(col("_pat").isNotNull,
        matchUdf(col("_pat"), col("_path"))).otherwise(lit(-1)))
      .groupBy(col("_id"), col("_host"), col("_path"))
      .agg(max(when(col("_ml") >= 0,
        struct(col("_ml").as("ml"),
          col("_allow").cast("int").as("al")))).as("_best"))
      .select(col("_id").as(idCol), col("_host").as(hostCol),
        col("_path").as(pathCol),
        coalesce(col("_best.al") === 1, lit(true)).as("allowed"))
  }
}
