package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  // the SAME wire-framing builder the planted q251/q252 corpora use —
  // one definition (Warc.record), so the graded construction and these
  // pins cannot drift apart
  private def rec(warcType: String, url: Option[String], payload: String): Array[Byte] =
    Warc.record(warcType, url, payload.getBytes(UTF_8))

  private def gz(b: Array[Byte]): Array[Byte] = Warc.gzipMember(b)

  test("plain multi-record file: types, urls, lengths, payloads, indices") {
    val f = rec("warcinfo", None, "software: graft") ++
      rec("request", Some("http://e.com/a"), "GET /a") ++
      rec("response", Some("http://e.com/a"), "hello body")
    val rs = Warc.walk(7L, f)
    assert(rs.map(_.warc_type) === Seq("warcinfo", "request", "response"))
    assert(rs.map(_.rec_index) === Seq(0L, 1L, 2L))
    assert(rs.head.url === null)
    assert(rs(2).url === "http://e.com/a")
    assert(new String(rs(2).payload, UTF_8) === "hello body")
    assert(rs(2).content_length === 10L)
    assert(rs.forall(_.file_id === 7L))
  }

  test("gzip-member-per-record archives read identically to plain") {
    val plain = rec("response", Some("u1"), "alpha") ++
      rec("response", Some("u2"), "beta")
    val gzPerMember = gz(rec("response", Some("u1"), "alpha")) ++
      gz(rec("response", Some("u2"), "beta"))
    assert(Warc.walk(1L, gzPerMember).map(r => (r.url, new String(r.payload, UTF_8)))
      === Warc.walk(1L, plain).map(r => (r.url, new String(r.payload, UTF_8))))
  }

  test("payloads containing WARC/ and header-like lines are not re-split") {
    // the payload extent comes from Content-Length, never from scanning
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 0\r\n\r\nx"
    val f = rec("response", Some("u"), tricky) ++ rec("response", Some("v"), "tail")
    val rs = Warc.walk(1L, f)
    assert(rs.map(_.url) === Seq("u", "v"))
    assert(new String(rs.head.payload, UTF_8) === tricky)
  }

  test("lying/truncated Content-Length: default drops the tail, opt-in recovery re-walks") {
    val f = rec("response", Some("a"), "first") ++
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: liar\r\n" +
        "Content-Length: 99999\r\n\r\nstub\r\n").getBytes(UTF_8) ++
      rec("response", Some("b"), "second") ++
      rec("response", Some("c"), "third")
    // DEFAULT: a short read is indistinguishable from tail truncation —
    // drop the remainder rather than risk fabricating records out of a
    // truncated payload's bytes
    assert(Warc.walk(1L, f).map(_.url) === Seq("a"))
    // OPT-IN recovery: re-walk the liar's consumed extent, recovering B/C
    val rs = Warc.walk(1L, f, recoverLyingExtents = true)
    assert(rs.map(r => (r.rec_index, r.url, new String(r.payload, UTF_8)))
      === Seq((0L, "a", "first"), (1L, "b", "second"), (2L, "c", "third")))
    // nested lies recover too: a second liar inside the first's extent
    val f2 = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: l1\r\n" +
        "Content-Length: 88888\r\n\r\n").getBytes(UTF_8) ++
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: l2\r\n" +
        "Content-Length: 77777\r\n\r\n").getBytes(UTF_8) ++
      rec("response", Some("d"), "survivor")
    assert(Warc.walk(1L, f2, recoverLyingExtents = true).map(_.url) === Seq("d"))
    // the fabrication hazard the default guards against: a TRUNCATED
    // valid record whose payload quotes a complete WARC record must not
    // surface the quoted record as corpus data
    val quoted = new String(rec("response", Some("fake"), "evil"), UTF_8)
    val truncated = rec("response", Some("real"), "ok") ++
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: cut\r\n" +
        s"Content-Length: ${quoted.length + 500}\r\n\r\n" + quoted).getBytes(UTF_8)
    assert(Warc.walk(1L, truncated).map(_.url) === Seq("real"))
  }

  test("junk between records and malformed records are scanned past") {
    val f = rec("response", Some("u"), "one") ++
      "JUNKJUNKJUNK\r\n".getBytes(UTF_8) ++             // non-record noise
      "WARC/1.0\r\nWARC-Type: broken\r\n\r\n".getBytes(UTF_8) ++ // no Content-Length
      rec("response", Some("v"), "two") ++
      // lying length: declares more payload than the file holds
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: w\r\nContent-Length: 99999\r\n\r\nshort".getBytes(UTF_8)
    val rs = Warc.walk(1L, f)
    assert(rs.map(_.url) === Seq("u", "v"))
    assert(rs.map(_.rec_index) === Seq(0L, 1L)) // malformed consume no index
  }

  test("header keys are case-insensitive; values trimmed") {
    val raw = ("WARC/1.0\r\nwarc-type:  response \r\nWARC-TARGET-URI:\thttp://x\r\n" +
      "content-length: 3\r\n\r\nabc\r\n\r\n").getBytes(UTF_8)
    val rs = Warc.walk(1L, raw)
    assert(rs.map(r => (r.warc_type, r.url, new String(r.payload, UTF_8)))
      === Seq(("response", "http://x", "abc")))
  }

  test("records() and responseText() run as a distributed flatMap") {
    val f1 = gz(rec("warcinfo", None, "meta")) ++
      gz(rec("response", Some("http://a"), "body A"))
    val f2 = rec("response", Some("http://b"), "body B") ++
      rec("request", Some("http://b"), "GET /b")
    val files = Seq((1L, f1), (2L, f2)).toDF("file_id", "content")
    implicit val s = spark
    val rs = Warc.records(files).collect()
    assert(rs.length === 4)
    val texts = Warc.responseText(files).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(5))).toSet
    assert(texts === Set((1L, "http://a", "body A"), (2L, "http://b", "body B")))
    // bare-body payloads carry no HTTP envelope: status/mime are NULL
    assert(Warc.responseText(files).collect()
      .forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("HTTP envelope: status/mime surfaced, headers stripped from text") {
    val page = "<html><p>real body text</p></html>"
    val msg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: x\r\n\r\n" + page).getBytes(UTF_8)
    val (status, mime, text) = Warc.decodeHttpPayload(msg)
    assert(status === Some(200))
    assert(mime === Some("text/html"))
    assert(text === page) // no status line, no headers, in the corpus text
    // 404s surface their status; mime params drop, mime lowercases
    val err = ("HTTP/1.1 404 Not Found\r\nContent-Type: Text/HTML;q=3\r\n\r\ngone")
      .getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(err) === (Some(404), Some("text/html"), "gone"))
  }

  test("HTTP envelope: declared charset decodes, unknown falls back to UTF-8") {
    val latin1Body = "café résumé"
    val l1 = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=ISO-8859-1\r\n\r\n")
      .getBytes(UTF_8) ++ latin1Body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Warc.decodeHttpPayload(l1)._3 === latin1Body)
    // a UTF-8-assuming decode of those bytes would replace 0xE9 — pin that
    // the declared charset, not a fixed UTF-8, picked the decoder
    assert(new String(latin1Body.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1), UTF_8) !== latin1Body)
    // QUOTED + mixed-case charset parameter
    val quoted = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; Charset=\"UTF-8\"\r\n\r\n")
      .getBytes(UTF_8) ++ latin1Body.getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(quoted)._3 === latin1Body)
    // unknown charset name → documented UTF-8 fallback, never a crash
    val bogus = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=x-nope\r\n\r\n")
      .getBytes(UTF_8) ++ latin1Body.getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(bogus)._3 === latin1Body)
    // no charset parameter at all → UTF-8
    val bare = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n").getBytes(UTF_8) ++
      latin1Body.getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(bare) === (Some(200), Some("text/plain"), latin1Body))
  }

  test("HTTP body codings: chunked framing removed, gzip inflated, layered, degrade on corruption") {
    val body = "the real corpus text survives every wire coding"
    def msg(headers: String, b: Array[Byte]) =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$headers\r\n").getBytes(UTF_8) ++ b
    def chunk(b: Array[Byte], size: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < b.length) {
        val n = math.min(size, b.length - i)
        out.write(s"${n.toHexString};ext=v\r\n".getBytes(UTF_8))
        out.write(b, i, n); out.write("\r\n".getBytes(UTF_8)); i += n
      }
      out.write("0\r\n\r\n".getBytes(UTF_8)); out.toByteArray
    }
    // chunked alone: framing lines must not leak
    val c = Warc.decodeHttpPayload(
      msg("Transfer-Encoding: chunked\r\n", chunk(body.getBytes(UTF_8), 5)))
    assert(c === (Some(200), Some("text/plain"), body))
    // gzip alone
    val g = Warc.decodeHttpPayload(
      msg("Content-Encoding: gzip\r\n", Warc.gzipMember(body.getBytes(UTF_8))))
    assert(g._3 === body)
    // layered: chunked framing OUTSIDE the gzip coding (the wire order)
    val both = Warc.decodeHttpPayload(
      msg("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        chunk(Warc.gzipMember(body.getBytes(UTF_8)), 7)))
    assert(both._3 === body)
    // malformed chunk size line: keep the chunks already decoded, never
    // leak framing into text
    // one complete 10-byte chunk ("a;ext=v\r\n" + 10 data + CRLF = 21
    // bytes), then a garbage size line
    val bad = chunk(body.getBytes(UTF_8), 10)
    val cut = bad.take(21) ++ "ZZZ\r\njunk".getBytes(UTF_8)
    val degraded = Warc.decodeHttpPayload(msg("Transfer-Encoding: chunked\r\n", cut))._3
    assert(degraded === body.take(10))
    // corrupt gzip: degrade to empty, not a task kill
    val corrupt = Warc.decodeHttpPayload(
      msg("Content-Encoding: gzip\r\n", Array[Byte](0x1f, 0x8b.toByte, 9, 9)))
    assert(corrupt._3 === "")
    // an UNKNOWN content coding passes bytes through to the charset decode
    val unknown = Warc.decodeHttpPayload(
      msg("Content-Encoding: br\r\n", body.getBytes(UTF_8)))
    assert(unknown._3 === body)
  }

  test("HTTP envelope edges: LFLF terminator, terminator-less message, non-HTTP") {
    // bare-LF servers terminate headers with LFLF
    val lflf = "HTTP/1.0 200 OK\nContent-Type: text/plain\n\nbody".getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(lflf) === (Some(200), Some("text/plain"), "body"))
    // a message with NO blank line is all envelope: empty text, never the
    // raw headers leaking into the corpus
    val cut = "HTTP/1.1 200 OK\r\nContent-Type: text/html".getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(cut) === (Some(200), Some("text/html"), ""))
    // a bare body that merely MENTIONS HTTP/ mid-text is not an envelope
    val bare = "see HTTP/1.1 spec for details".getBytes(UTF_8)
    assert(Warc.decodeHttpPayload(bare) === (None, None, "see HTTP/1.1 spec for details"))
  }

  test("export: conformant conversion records, ordered, deterministic, null text dropped") {
    implicit val s = spark
    val corpus = Seq(
      (0L, 2L, "http://e.com/2", "second doc"),
      (0L, 1L, "http://e.com/1", "first doc"),
      (1L, 3L, "http://e.com/3", "third doc"),
      (1L, 4L, null.asInstanceOf[String], "no url doc"),
      (1L, 5L, "http://e.com/5", null.asInstanceOf[String])) // dropped
      .toDF("file_grp", "doc_id", "url", "text")
    val files = Warc.export(corpus, "file_grp", "doc_id", "text",
      Some("url"), warcDate = "2026-01-01T00:00:00Z", gzip = false).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    assert(files.keySet === Set(0L, 1L))
    // records come back ordered by id within each file, text intact
    val f0 = Warc.walk(0L, files(0L))
    assert(f0.map(r => (r.warc_type, r.url, new String(r.payload, UTF_8)))
      === Seq(("conversion", "http://e.com/1", "first doc"),
              ("conversion", "http://e.com/2", "second doc")))
    // ISO 28500 mandatory headers on every record; null url omitted
    val raw1 = new String(files(1L), UTF_8)
    assert(raw1.contains("WARC-Record-ID: <urn:uuid:"))
    assert(raw1.contains("WARC-Date: 2026-01-01T00:00:00Z"))
    val f1 = Warc.walk(1L, files(1L))
    assert(f1.map(_.url) === Seq("http://e.com/3", null)) // NULL-text row 5 gone
    // distinct records get distinct record ids
    val ids = "<urn:uuid:[^>]+>".r.findAllIn(raw1).toSeq
    assert(ids.distinct.size === ids.size && ids.size === 2)
    // replay determinism: exporting again is byte-identical
    val again = Warc.export(corpus, "file_grp", "doc_id", "text",
      Some("url"), warcDate = "2026-01-01T00:00:00Z", gzip = false).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    assert(files.keys.forall(k => java.util.Arrays.equals(files(k), again(k))))
    // gzip form re-reads identically to plain
    val gz = Warc.export(corpus, "file_grp", "doc_id", "text",
      Some("url"), warcDate = "2026-01-01T00:00:00Z").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    assert(Warc.walk(0L, gz(0L)).map(r => new String(r.payload, UTF_8))
      === f0.map(r => new String(r.payload, UTF_8)))
  }

  test("export hardening: CRLF urls percent-encode, NULL id fails loud, record rejects CRLF") {
    implicit val s = spark
    // a crawl URL carrying CRLF would terminate the header block early
    // and corrupt framing — export percent-encodes it, round-trip intact
    val evil = Seq((0L, 1L, "http://e.com/a\r\nContent-Length: 0\r\n\r\n", "doc"))
      .toDF("file_grp", "doc_id", "url", "text")
    val f = Warc.export(evil, "file_grp", "doc_id", "text", Some("url"),
      "2026-01-01T00:00:00Z", gzip = false).collect()
    val rs = Warc.walk(0L, f.head.getAs[Array[Byte]](1))
    assert(rs.length === 1 && new String(rs.head.payload, UTF_8) === "doc")
    assert(rs.head.url === "http://e.com/a%0D%0AContent-Length: 0%0D%0A%0D%0A")
    // the low-level builder fails loud instead of framing-corrupting
    intercept[IllegalArgumentException] {
      Warc.record("response", Some("u\r\nX: 1"), "p".getBytes(UTF_8))
    }
    // NULL id is a structural error: clear message, not an encoder NPE
    val nullId = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, null, "u", "t"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_grp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val e = intercept[Exception] {
      Warc.export(nullId, "file_grp", "doc_id", "text", Some("url"),
        "2026-01-01T00:00:00Z").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("doc_id") ||
      e.getCause != null && e.getCause.getMessage.contains("doc_id"))
  }

  test("degrade-don't-kill: empty, null-ish, corrupt gzip, truncated header") {
    assert(Warc.walk(1L, Array.empty[Byte]) === Seq.empty)
    assert(Warc.walk(1L, "no warc here at all".getBytes(UTF_8)) === Seq.empty)
    val corrupt = Array[Byte](0x1f.toByte, 0x8b.toByte, 9, 9, 9, 9)
    assert(Warc.walk(1L, corrupt) === Seq.empty)
    // header runs off the end of the file
    assert(Warc.walk(1L, "WARC/1.0\r\nWARC-Type: response\r\n".getBytes(UTF_8))
      === Seq.empty)
  }
}
