package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the crawl pipeline's FIRST dedup key: the
  * same page is fetched as `HTTP://Example.COM:80/a?utm_source=x&b=1#f`
  * and `http://example.com/a?b=1`, and URL-level dedup before any
  * content fetch/compare is the cheapest dedup tier there is (RFC 3986
  * §6 "Normalization and Comparison"; every production crawler —
  * Heritrix, Nutch, CommonCrawl's CDX — ships a variant of exactly
  * these rules). Rules applied, in order:
  *
  *  - trim surrounding ASCII whitespace;
  *  - scheme and host LOWERCASED (RFC 3986 §6.2.2.1 case
  *    normalization; path/query case is significant and preserved);
  *  - fragment dropped (never sent to the server);
  *  - default port dropped (`http:80`, `https:443`; any other port
  *    kept verbatim);
  *  - empty path becomes `/` (§6.2.3 scheme-based normalization);
  *  - query parameters: empty segments dropped, tracking parameters
  *    dropped (name starting `utm_`, or exactly `gclid`/`fbclid`/
  *    `msclkid` — the click-id trio), the REST sorted bytewise and
  *    rejoined (param order is almost never semantic, and sorting is
  *    what makes the key canonical); an emptied query drops its `?`.
  *
  * FAIL-NULL (the ByteUnitsDecode contract): no `scheme://`, an empty
  * host, a non-numeric port, or a userinfo `@` (deliberately
  * unsupported — credentials in URLs are a scrub issue, not a dedup
  * key) return NULL rather than a half-normalized string that would
  * poison the dedup key space silently. The host must be a registered
  * name (letters, digits, '-', '.'): spaces, underscores, bracketed
  * IPv6 literals, and any other character outside the RFC 1123
  * letter-digit-hyphen repertoire fail NULL — crawl frontiers key on
  * names, and a malformed authority is exactly the kind of oddity the
  * NULL queue is for.
  *
  * One codegen'd pass, eval and codegen sharing one JVM helper; the
  * string walk is allocation-light (substring slices + one builder).
  * At 100 TB this fuses into the scan like any narrow projection. */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"UrlNormalize expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UrlNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = graft.functions.UrlNormalize.normalize($s);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlNormalize {

  def apply(c: Column): Column =
    GraftColumnBridge.column(UrlNormalize(GraftColumnBridge.expression(c)))

  /** Host of a CANONICAL url (an [[UrlNormalize]] output): the run
    * between `://` and the first of `/ : ?`. EXACT on canonical form —
    * the normalizer guarantees `scheme://host[:port][/path][?query]`
    * with a validated letter-digit-hyphen host — so the frontier's
    * per-host keys need no second parse of the raw URL; one builtin
    * (codegen'd) regexp over the already-computed canonical column.
    * On a NON-canonical string the result is unspecified — derive
    * hosts downstream of the normalizer, nowhere else. */
  def hostOfCanonical(c: Column): Column =
    org.apache.spark.sql.functions.regexp_extract(c, "^[a-z0-9+.-]+://([^/:?]+)", 1)

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq >= 0) param.substring(0, eq) else param
    name.startsWith("utm_") ||
      name == "gclid" || name == "fbclid" || name == "msclkid"
  }

  /** Shared eval/codegen core. Returns the canonical form, or null when
    * the input is not a normalizable absolute URL (fail-NULL). */
  def normalize(u: UTF8String): UTF8String = {
    val raw = u.toString.trim
    val schemeEnd = raw.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = raw.substring(0, schemeEnd)
    var i = 0
    while (i < scheme.length) {
      val c = scheme.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (i > 0 && ((c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))
      if (!ok) return null
      i += 1
    }
    val schemeLc = scheme.toLowerCase(java.util.Locale.ROOT)

    // strip the fragment before anything else — it is client-side only
    val hashAt = raw.indexOf('#', schemeEnd + 3)
    val noFrag = if (hashAt >= 0) raw.substring(0, hashAt) else raw

    val authStart = schemeEnd + 3
    var authEnd = authStart
    while (authEnd < noFrag.length &&
      noFrag.charAt(authEnd) != '/' && noFrag.charAt(authEnd) != '?') authEnd += 1
    val authority = noFrag.substring(authStart, authEnd)
    if (authority.isEmpty || authority.indexOf('@') >= 0) return null

    val colonAt = authority.lastIndexOf(':')
    val (host, port) =
      if (colonAt < 0) (authority, "")
      else {
        val p = authority.substring(colonAt + 1)
        if (p.isEmpty || !p.forall(c => c >= '0' && c <= '9')) return null
        (authority.substring(0, colonAt), p)
      }
    // the host must be a REGISTERED NAME — letters, digits, '-', '.'
    // (the RFC 1123 letter-digit-hyphen repertoire; RFC 3986 reg-name
    // minus the exotic sub-delims no real hostname uses). Everything
    // else fails NULL, never a half-normalized key: a second colon
    // (bracketed IPv6 literal / malformed authority — 'http://[::1]:8080/'
    // must not pass while the portless spelling of the SAME address
    // fails, splitting one logical URL across the key space and the
    // scrub queue), and equally spaces, underscores, or any other
    // illegal character — 'http://exa mple.com/' normalizing
    // "successfully" would let garbage keys into the dedup key space
    // instead of the documented NULL scrub queue
    if (host.isEmpty || !host.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.')) return null
    val hostLc = host.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((schemeLc == "http" && port == "80") || (schemeLc == "https" && port == "443"))

    val qAt = noFrag.indexOf('?', authEnd)
    val path = if (qAt >= 0) noFrag.substring(authEnd, qAt) else noFrag.substring(authEnd)
    val query = if (qAt >= 0) noFrag.substring(qAt + 1) else ""

    // BYTEWISE (UTF-8, unsigned) param order, not String.compareTo's
    // UTF-16 code-unit order — supplementary characters (surrogate
    // pairs) sort differently under the two, and the canonical key must
    // match a bytewise-sorting engine (the cross-engine contract).
    // Encode each kept param ONCE (not per comparison — this runs per
    // row over crawl-scale corpora).
    val kept = query.split("&", -1).filter(p => p.nonEmpty && !isTracking(p))
      .map(UTF8String.fromString)
    java.util.Arrays.sort(kept,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))

    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(schemeLc).append("://").append(hostLc)
    if (keepPort) sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (kept.nonEmpty) {
      sb.append('?')
      var k = 0
      while (k < kept.length) {
        if (k > 0) sb.append('&')
        sb.append(kept(k))
        k += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
