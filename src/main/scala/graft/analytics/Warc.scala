package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record synthesis and parsing — the Common Crawl
  * ingestion step of a web-scale training pipeline: a crawler hands the
  * pipeline WARC `response` records (WARC headers + captured HTTP
  * response + HTML body), and the first batch job must split headers
  * from payload, validate `Content-Length`, read the HTTP status, and
  * strip markup down to trainable text — all before any dedup or
  * quality operator can run.
  *
  * Same discipline as [[Multimodal]]'s PNG/JPEG/WAV/MP3 fixtures: the
  * GENERATOR derives every header field deterministically from the
  * `documents` row (so the oracle twin computes the expected values
  * arithmetically), while the PARSER recovers them from the record TEXT
  * alone — a real header walk over `\r\n\r\n` boundaries and header
  * lines, not a replay of the fixture. Corruption fixture: every
  * doc_id ≡ 5 (mod 11) record declares a Content-Length 7 bytes long of
  * the truth (a truncated capture), and every doc_id ≡ 3 (mod 7) capture
  * is an HTTP 404 — both must be flagged, not dropped, so the curation
  * gate downstream decides.
  *
  * Scale shape: generation and parsing are pure per-row projections
  * (string ops only, whole-stage codegen, zero UDFs) — no shuffle, no
  * state; at 100 TB this is a map-only pass that rides the scan.
  */
object Warc {

  private val Crlf = "\r\n"
  private val HdrSep = Crlf + Crlf

  /** Attach a `warc` column: a WARC/1.0 `response` record wrapping an
    * HTTP response whose HTML body carries the document text. All
    * metadata derives from (doc_id, source, lang, text) so results are
    * reproducible and oracle-checkable.
    */
  def withWarc(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val status = when(pmod(col("doc_id"), lit(7)) === 3, lit("404 Not Found"))
      .otherwise(lit("200 OK"))
    val uri = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/"), col("doc_id"))
    val title = concat(lit("doc "), col("doc_id"), lit(" ["), col("lang"),
      lit("]"))
    val html = concat(lit("<html><head><title>"), title,
      lit("</title></head><body><p>"), col(textCol),
      lit("</p></body></html>"))
    val http = concat(lit("HTTP/1.1 "), status, lit(Crlf),
      lit("Content-Type: text/html; charset=utf-8"), lit(HdrSep), html)
    // the truncation fixture: a declared length 7 bytes past the actual
    // capture — the parser must CHECK, not trust, the header
    val declaredLen = (length(http) +
      when(pmod(col("doc_id"), lit(11)) === 5, lit(7)).otherwise(lit(0)))
      .cast("long")
    docs.withColumn("warc", concat(
      lit("WARC/1.0"), lit(Crlf),
      lit("WARC-Type: response"), lit(Crlf),
      lit("WARC-Record-ID: <urn:uuid:"),
      lpad(lower(hex(col("doc_id"))), 12, "0"), lit(">"), lit(Crlf),
      lit("WARC-Target-URI: "), uri, lit(Crlf),
      lit("WARC-Date: 2024-03-15T10:00:00Z"), lit(Crlf),
      lit("Content-Length: "), declaredLen, lit(HdrSep),
      http))
  }

  /** Parse WARC records from the record text alone: header/payload split
    * at the first blank line, header-line extraction, Content-Length
    * validation against the actual capture, HTTP status, tag-stripped
    * text extraction, and a `keep` verdict (a 200 whose declared length
    * matches). `doc_id` is re-derived from the target URI — nothing is
    * read from the generator's columns.
    */
  def parseWarc(records: DataFrame, warcCol: String = "warc"): DataFrame = {
    val w = col(warcCol)
    val hdrEnd = instr(w, HdrSep)
    val hdr = w.substr(lit(1), hdrEnd - 1)
    val body = w.substr(hdrEnd + 4, length(w))
    val uri = regexp_extract(hdr, "WARC-Target-URI: ([^\r]+)", 1)
    val declared = regexp_extract(hdr, "Content-Length: ([0-9]+)", 1)
      .cast("long")
    val httpHdrEnd = instr(body, HdrSep)
    val html = body.substr(httpHdrEnd + 4, length(body))
    val extracted = trim(regexp_replace(
      regexp_replace(html, "<[^>]*>", " "), "  +", " "))
    val status = regexp_extract(body, "^HTTP/1\\.1 ([0-9]{3})", 1).cast("int")
    val lengthOk = declared === length(body)
    records.select(
      regexp_extract(uri, "/([0-9]+)$", 1).cast("long").as("doc_id"),
      (substring(w, 1, 10) === ("WARC/1.0" + Crlf)).as("version_ok"),
      regexp_extract(hdr, "WARC-Type: ([^\r]+)", 1).as("warc_type"),
      regexp_extract(hdr, "WARC-Record-ID: <urn:uuid:([0-9a-f]+)>", 1)
        .as("record_id"),
      regexp_extract(uri, "^https://([^/]+)/", 1).as("host"),
      regexp_extract(uri, "^https://[^/]+/([a-z]+)/", 1).as("lang_path"),
      status.as("http_status"),
      declared.as("declared_len"),
      length(body).cast("long").as("actual_len"),
      lengthOk.as("length_ok"),
      regexp_extract(html, "<title>([^<]*)</title>", 1).as("title"),
      length(extracted).cast("long").as("n_extract_chars"),
      size(split(extracted, " ")).cast("long").as("n_extract_words"),
      substring(sha2(extracted, 256), 1, 16).as("extract_sha"),
      (status === 200 && lengthOk).as("keep"))
  }
}
