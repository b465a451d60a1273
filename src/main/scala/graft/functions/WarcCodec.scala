package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pure-JVM WARC (Web ARChive, ISO 28500 / WARC-1.0) reader + writer —
  * the container CommonCrawl ships and every C4/CCNet-style pipeline
  * ingests first. Wire format per record:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n        (header lines, K: V)
  * Content-Length: N\r\n
  * \r\n
  * <N payload octets>
  * \r\n\r\n                       (record separator)
  * }}}
  *
  * Crawl archives usually gzip EACH record as its own member and
  * concatenate the members (so a reader can split work at member
  * boundaries); [[decode]] handles that transparently — JDK
  * `GZIPInputStream` reads concatenated members as one stream — as
  * well as plain archives.
  *
  * Degradation contract (the [[WavCodec]]/[[AviCodec]] discipline): a
  * malformed or truncated TAIL never throws — parsing stops and the
  * well-formed prefix records are returned. Corpus-scale WARC ingest
  * cannot afford one bad crawl record aborting a 100 TB scan. */
object WarcCodec {

  final case class WarcRecord(headers: Map[String, String],
      payload: Array[Byte]) {
    /** Case-insensitive header lookup (WARC headers are; crawlers vary
      * the casing in the wild). */
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def warcType: Option[String] = header("WARC-Type")
    def targetUri: Option[String] = header("WARC-Target-URI")
  }

  /** Serialize records (header order preserved as given — the writer is
    * deterministic so fixtures and in-plan synthesis replay
    * byte-exactly). Content-Length is computed here; do not pass it.
    * `gzipPerRecord` = the member-per-record crawl layout. */
  def encode(records: Seq[(Seq[(String, String)], Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (hdrs, payload) =>
      require(!hdrs.exists(_._1.equalsIgnoreCase("Content-Length")),
        "Content-Length is computed by the writer")
      val sb = new StringBuilder("WARC/1.0\r\n")
      hdrs.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
      val rec = sb.toString.getBytes("UTF-8") ++ payload ++
        "\r\n\r\n".getBytes("UTF-8")
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        // close(), not finish(): finish() flushes the member but leaves
        // the internal Deflater's native memory for the GC finalizer —
        // a per-record leak at archive-writing scale (close() on top of
        // a ByteArrayOutputStream is otherwise a no-op)
        gz.write(rec); gz.close()
      } else out.write(rec)
    }
    out.toByteArray
  }

  private val GzMagic = Array[Byte](0x1f.toByte, 0x8b.toByte)

  /** Parse an archive (plain or gzip-membered); lenient — returns the
    * well-formed prefix on any malformation. Payload sizes are bounded
    * by the archive size by construction (Content-Length beyond the
    * remaining bytes stops the parse). */
  def decode(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 && bytes(0) == GzMagic(0) &&
          bytes(1) == GzMagic(1)) {
        var in: GZIPInputStream = null
        val out = new ByteArrayOutputStream()
        try {
          // the constructor itself reads the member header and throws on
          // corruption past the 2-byte magic check above
          in = new GZIPInputStream(new ByteArrayInputStream(bytes))
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } catch { case _: Exception => () }
        // free the Inflater's native memory NOW on both paths — per-row
        // GC-finalizer debts add up over a corpus of archives
        finally if (in != null) in.close()
        // a corrupt/truncated TAIL member keeps what inflated before it
        // — returning Seq.empty here would discard every intact record
        // and break the documented well-formed-prefix contract for the
        // gzip-membered layout (the usual CommonCrawl form)
        out.toByteArray
      } else bytes
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < plain.length) {
      // skip inter-record CRLFs
      while (pos < plain.length &&
        (plain(pos) == '\r' || plain(pos) == '\n')) pos += 1
      if (pos >= plain.length) ok = false
      else {
        readLine(plain, pos) match {
          case Some((ver, p1)) if ver.startsWith("WARC/") =>
            var p = p1
            val hdrs = Seq.newBuilder[(String, String)]
            var headerOk = true
            var blank = false
            while (headerOk && !blank) {
              readLine(plain, p) match {
                case Some(("", np)) => blank = true; p = np
                case Some((line, np)) =>
                  val i = line.indexOf(':')
                  if (i <= 0) headerOk = false
                  else {
                    hdrs += ((line.substring(0, i).trim,
                      line.substring(i + 1).trim))
                    p = np
                  }
                case None => headerOk = false
              }
            }
            val hm = hdrs.result()
            val len = hm.collectFirst {
              case (k, v) if k.equalsIgnoreCase("Content-Length") => v
            }.flatMap(v => scala.util.Try(v.toLong).toOption)
            len match {
              case Some(n) if headerOk && n >= 0 && p + n <= plain.length =>
                recs += WarcRecord(hm.toMap,
                  java.util.Arrays.copyOfRange(plain, p, p + n.toInt))
                pos = p + n.toInt
              case _ => ok = false
            }
          case _ => ok = false
        }
      }
    }
    recs.result()
  }

  /** CRLF- (or lone-LF-) terminated line starting at `from`; None when
    * no terminator exists before end-of-bytes. */
  private def readLine(b: Array[Byte], from: Int): Option[(String, Int)] = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    if (i >= b.length) None
    else {
      val end = if (i > from && b(i - 1) == '\r') i - 1 else i
      Some((new String(b, from, end - from, "UTF-8"), i + 1))
    }
  }
}
