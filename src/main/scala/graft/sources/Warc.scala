package graft.sources

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC container record reader — the one stage between "a CommonCrawl dump
  * on disk" and everything the crawl family already does (WET/main-content
  * extraction, frontier, curation): split a binary WARC file into one row
  * per record.
  *
  * Format (ISO 28500, the crawl interchange format): a WARC file is a
  * sequence of records, each
  * {{{
  *   WARC/1.0<CRLF>
  *   WARC-Type: response<CRLF>
  *   WARC-Target-URI: http://...<CRLF>
  *   Content-Length: N<CRLF>
  *   <CRLF>
  *   <N payload bytes><CRLF><CRLF>
  * }}}
  * and on-the-wire crawl archives are usually `.warc.gz` with EACH RECORD
  * its own gzip member, concatenated — so a reader that gunzips the whole
  * file sees the same plain record sequence (multi-member streams are
  * handled; `java.util.zip.GZIPInputStream` resumes at each member header).
  *
  * Parsing discipline is the [[graft.multimodal.Multimodal.decodeWav]] /
  * `decodeAvi` chunk-walker's, adapted to CRLF framing:
  *
  *  - NO fixed offsets: records are located by their `WARC/` version line
  *    and each record's extent comes from ITS OWN Content-Length header —
  *    junk bytes between records (truncated tails, CRLF padding beyond the
  *    standard two) are scanned past to the next `WARC/` boundary, so a
  *    reader that assumed "previous end + 4" cannot pass the planted gates;
  *  - Content-Length parsed into Long and bounds-checked BEFORE any slice,
  *    so a crafted length cannot wrap an int or overrun the buffer: a
  *    record whose declared payload overruns the file is dropped (the
  *    degrade-don't-kill contract — one truncated tail record must not
  *    kill a 100 TB scan) and scanning resumes INSIDE its declared extent
  *    (the declaration was a lie, so the next real record may start there);
  *  - header keys are case-insensitive per RFC (WARC inherits HTTP's
  *    header grammar); values are trimmed; a record missing Content-Length
  *    is malformed and skipped the same way.
  *
  * Scale: the input shape is one row per WARC FILE (`spark.read.format
  * ("binaryFile")` or any (id, bytes) frame), and the walk is a narrow
  * per-partition flatMap — records explode in place, no shuffle, no
  * driver involvement; downstream filters on `warc_type` prune before
  * anything touches payloads. Files are the parallelism unit exactly as
  * in the reference crawl pipelines (a CC segment is ~1 GB gzipped —
  * thousands of files spread across executors).
  */
object Warc {

  /** One WARC record. `url` is the WARC-Target-URI (NULL for records that
    * carry none, e.g. warcinfo), `rec_index` the record's position among
    * the file's WELL-FORMED records (junk and malformed records do not
    * consume an index — the oracle-facing count is of usable records). */
  case class WarcRecord(file_id: Long, rec_index: Long, warc_type: String,
                        url: String, content_length: Long, payload: Array[Byte])

  private val GzipMagic0: Byte = 0x1f.toByte
  private val GzipMagic1: Byte = 0x8b.toByte

  /** Gunzip a (possibly multi-member) gzip byte array; non-gzip input is
    * returned as-is. A corrupt gzip stream degrades to the bytes already
    * inflated (usually none) rather than a task kill. */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 2 ||
        bytes(0) != GzipMagic0 || bytes(1) != GzipMagic1) return bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => /* degrade to what inflated */ }
    out.toByteArray
  }

  /** Index of the next `WARC/` version-line boundary at or after `from`
    * (a version line starts the buffer or follows a LF), or -1. */
  private def nextBoundary(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 5 <= b.length) {
      if (b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' && b(i + 3) == 'C' &&
          b(i + 4) == '/' && (i == 0 || b(i - 1) == '\n')) return i
      i += 1
    }
    -1
  }

  /** Walk one (gunzipped) WARC buffer into its well-formed records. */
  private[sources] def walk(fileId: Long, raw: Array[Byte]): Seq[WarcRecord] = {
    val b = gunzipAll(raw)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = nextBoundary(b, 0)
    var idx = 0L
    while (off >= 0) {
      // header block: version line + header lines, terminated by CRLFCRLF
      // (tolerate bare-LF writers: an empty line ends the block either way)
      var lineStart = off
      var warcType: String = null
      var url: String = null
      var contentLength = -1L
      var headerEnd = -1
      var i = off
      var done = false
      while (!done && i < b.length) {
        if (b(i) == '\n') {
          val rawLen = i - lineStart
          val len = if (rawLen > 0 && b(i - 1) == '\r') rawLen - 1 else rawLen
          if (len == 0) { headerEnd = i + 1; done = true }
          else {
            val line = new String(b, lineStart, len, UTF_8)
            val colon = line.indexOf(':')
            if (colon > 0) {
              val k = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
              val v = line.substring(colon + 1).trim
              k match {
                case "warc-type"       => warcType = v
                case "warc-target-uri" => url = v
                case "content-length"  =>
                  contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ =>
              }
            }
          }
          lineStart = i + 1
        }
        i += 1
      }
      if (!done) {
        off = -1 // header ran off the file: truncated tail, stop
      } else if (warcType == null || contentLength < 0 ||
                 headerEnd + contentLength > b.length.toLong) {
        // malformed (missing mandatory headers) or lying/truncated length:
        // drop it and rescan INSIDE the declared extent — the declaration
        // is untrusted, the next real record may start anywhere after the
        // headers
        off = nextBoundary(b, headerEnd)
      } else {
        val end = headerEnd + contentLength.toInt
        out += WarcRecord(fileId, idx, warcType, url, contentLength,
          java.util.Arrays.copyOfRange(b, headerEnd, end))
        idx += 1
        // the standard separator is CRLFCRLF after the payload, but junk
        // between records is in-contract: scan to the next boundary
        off = nextBoundary(b, end)
      }
    }
    out.toSeq
  }

  /** Partition-parallel record split over a (`file_id` LONG, `content`
    * BINARY) frame — the `binaryFile` source's shape after an id
    * projection, or any store of whole WARC files. One narrow flatMap:
    * no shuffle, no driver involvement. */
  def records(files: DataFrame)(implicit spark: SparkSession): Dataset[WarcRecord] = {
    import spark.implicits._
    files.select(files.columns.head, files.columns(1))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) => walk(id, bytes) })
  }

  /** Response-record payloads decoded as UTF-8 text — the bridge from a
    * crawl dump to the HTML/text stages (q224 WET, q239 main content,
    * q250 curation): filter BEFORE decode so non-response members
    * (warcinfo, request, metadata) never materialize a string. */
  def responseText(files: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    records(files).filter(_.warc_type == "response")
      .map(r => (r.file_id, r.rec_index, r.url, new String(r.payload, UTF_8)))
      .toDF("file_id", "rec_index", "url", "text")
  }
}
