package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5.2 reference resolution — the step between "an href pulled
  * out of a page" and "a URL a frontier can admit": most outlinks in real
  * HTML are RELATIVE (`../a`, `/b`, `?page=2`, `//cdn.example.com/x`) and
  * must resolve against the page's own URL before canonicalization
  * ([[UrlNormalize]]) and admission. `resolve(base, ref)` returns the
  * absolute target, or NULL when no document-fetching URL results —
  * callers compose `UrlNormalize(UrlResolve(base, ref))` so the frontier
  * sees one canonical key space.
  *
  * Resolution cases (§5.2.2, for the hierarchical http(s)-style URLs a
  * crawl handles):
  *  - `ref` with its own scheme → `ref` verbatim (absolute);
  *  - protocol-relative `//authority/...` → base's scheme + `ref`;
  *  - root-relative `/path` → base's `scheme://authority` + the path with
  *    dot segments removed (§5.2.4);
  *  - query-only `?q` → base's path kept, query replaced;
  *  - relative path → merged with the base path's directory (§5.2.3),
  *    dot segments removed;
  *  - empty or fragment-only `#f` → NULL (a same-document reference
  *    fetches nothing — outlink extraction drops it);
  *  - `ref`'s fragment is stripped in every case (never sent on the wire).
  *
  * FAIL-NULL (the [[UrlNormalize]] contract): a base that is not an
  * absolute hierarchical URL (`scheme://authority...`) resolves nothing —
  * NULL, never a half-resolved string that would poison the frontier key
  * space. Non-hierarchical refs (`mailto:`, `javascript:`, `data:`) carry
  * their own scheme and pass through the first case; the downstream
  * normalize fail-NULLs them out of the frontier.
  *
  * One codegen'd pass, eval and codegen sharing one JVM helper —
  * allocation-light, fuses into the scan like any narrow projection. */
case class UrlResolve(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"UrlResolve expects (string base, string ref), got ($l, $r)")
    }

  /** §5.2.4 remove_dot_segments — inputs here always start with `/`
    * (root-relative refs, or directory-merged relative paths whose
    * directory begins at the root). `..` above the root is ignored per
    * the RFC; a trailing `/.` or `/..` keeps the directory slash. */
  private def removeDotSegments(path: String): String = {
    val segs = path.split("/", -1) // segs(0) is the "" before the root '/'
    val out = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var i = 1
    while (i < segs.length) {
      val last = i == segs.length - 1
      segs(i) match {
        case "." => if (last) out += ""
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (last) out += ""
        case s => out += s
      }
      i += 1
    }
    "/" + out.mkString("/")
  }

  /** remove_dot_segments applied to the PATH of an absolute hierarchical
    * URL (§5.2.2 requires it on every branch, including refs that carry
    * their own scheme/authority — `http://h/a/../b` must key as
    * `http://h/b`, or one logical URL splits across the frontier key
    * space). Non-hierarchical URLs (no `://`) and empty paths pass
    * through untouched. */
  private def withCleanPath(abs: String): String = {
    val se = abs.indexOf("://")
    if (se <= 0) return abs // opaque (mailto:, javascript:) — no path grammar
    var ae = se + 3
    while (ae < abs.length && abs.charAt(ae) != '/' &&
      abs.charAt(ae) != '?' && abs.charAt(ae) != '#') ae += 1
    if (ae >= abs.length || abs.charAt(ae) != '/') return abs // no path
    var pe = abs.indexOf('?', ae)
    if (pe < 0) pe = abs.indexOf('#', ae)
    if (pe < 0) pe = abs.length
    abs.substring(0, ae) + removeDotSegments(abs.substring(ae, pe)) +
      abs.substring(pe)
  }

  def resolve(baseU: UTF8String, refU: UTF8String): UTF8String = {
    val base = baseU.toString.trim
    var ref = refU.toString.trim
    // strip ref's fragment first — client-side only in every case
    val refHash = ref.indexOf('#')
    if (refHash >= 0) ref = ref.substring(0, refHash)
    if (ref.isEmpty) return null // empty/fragment-only: same document

    // ref with its own scheme is already absolute (scheme = ASCII ALPHA
    // then alnum/+/-/. up to ':', before any '/', '?' — §3.1; Unicode
    // letters are NOT scheme chars, so 'é:1/x' resolves as a relative
    // path instead of minting a bogus absolute)
    val colon = ref.indexOf(':')
    if (colon > 0) {
      def asciiAlpha(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      var k = 1
      var isScheme = asciiAlpha(ref.charAt(0))
      while (isScheme && k < colon) {
        val c = ref.charAt(k)
        if (!(asciiAlpha(c) || (c >= '0' && c <= '9') ||
              c == '+' || c == '-' || c == '.'))
          isScheme = false
        k += 1
      }
      val slash = ref.indexOf('/'); val q = ref.indexOf('?')
      if (isScheme && (slash < 0 || colon < slash) && (q < 0 || colon < q))
        return UTF8String.fromString(withCleanPath(ref))
    }

    // the base must be an absolute hierarchical URL
    val schemeEnd = base.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = base.substring(0, schemeEnd)
    val authStart = schemeEnd + 3
    var authEnd = authStart
    while (authEnd < base.length &&
      base.charAt(authEnd) != '/' && base.charAt(authEnd) != '?' &&
      base.charAt(authEnd) != '#') authEnd += 1
    if (authEnd == authStart) return null // empty authority
    val root = base.substring(0, authEnd) // scheme://authority

    if (ref.startsWith("//"))
      return UTF8String.fromString(withCleanPath(scheme + ":" + ref))
    if (ref.startsWith("/")) {
      val q = ref.indexOf('?')
      val (p, qs) = if (q >= 0) (ref.substring(0, q), ref.substring(q)) else (ref, "")
      return UTF8String.fromString(root + removeDotSegments(p) + qs)
    }

    // base path (query/fragment excluded), default "/"
    var pathEnd = base.indexOf('?', authEnd)
    if (pathEnd < 0) pathEnd = base.indexOf('#', authEnd)
    if (pathEnd < 0) pathEnd = base.length
    val basePath = if (pathEnd > authEnd) base.substring(authEnd, pathEnd) else "/"

    if (ref.startsWith("?"))
      return UTF8String.fromString(root + basePath + ref)

    // relative path: merge with the base path's directory (§5.2.3)
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    val q = ref.indexOf('?')
    val (p, qs) = if (q >= 0) (ref.substring(0, q), ref.substring(q)) else (ref, "")
    UTF8String.fromString(root + removeDotSegments(dir + p) + qs)
  }

  override protected def nullSafeEval(b: Any, r: Any): Any =
    resolve(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlResolve", this, classOf[UrlResolve].getName)
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.resolve($b, $r);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlResolve {
  def apply(base: Column, ref: Column): Column =
    GraftColumnBridge.column(UrlResolve(
      GraftColumnBridge.expression(base),
      GraftColumnBridge.expression(ref)))
}
