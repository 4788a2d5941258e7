package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL CANONICALIZATION — the normalization web-crawl curation runs
  * before URL-level dedup (the same page arrives as `HTTP://WWW.X.com`,
  * `http://x.com/?utm_source=feed`, `http://x.com#frag`, …; dedup by
  * raw string misses all of it). One deterministic pass:
  *
  *  - scheme and host LOWERCASE; a leading `www.` strips;
  *  - default ports strip (`:80` for http, `:443` for https);
  *  - the fragment drops entirely (never sent to the server);
  *  - tracking parameters drop (`utm_*`, `gclid`, `fbclid`,
  *    `msclkid`, `ref`) — the de-facto standard scrub list;
  *  - surviving query parameters SORT by (key, value) — param order
  *    is not semantic, and sorting makes equal pages equal strings;
  *  - a trailing `/` on a non-root path strips; an empty path
  *    becomes `/`.
  *
  * Anything that does not look like `scheme://host...` canonicalizes
  * as its trimmed lowercase self — garbage in a crawl column must
  * normalize deterministically, never error (the media_header
  * contract). Native Expression: one pass per row inside the scan,
  * no regex engine, no java.net exceptions on crawl garbage.
  */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"url_canon needs a string input, got ${child.dataType.simpleString}")

  private val tracking = Set("gclid", "fbclid", "msclkid", "ref")

  /** Per-row kernel; public so generated code can call it. */
  def compute(raw: UTF8String): UTF8String = {
    val s = raw.toString.trim
    val sep = s.indexOf("://")
    if (sep <= 0) return UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sep + 3)
    if (rest.isEmpty || !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))
    // split authority / path / query / fragment
    val fragAt = rest.indexOf('#')
    val noFrag = if (fragAt >= 0) rest.substring(0, fragAt) else rest
    val qAt = noFrag.indexOf('?')
    val (hostPath, query) =
      if (qAt >= 0) (noFrag.substring(0, qAt), noFrag.substring(qAt + 1))
      else (noFrag, "")
    val slashAt = hostPath.indexOf('/')
    var authority = (if (slashAt >= 0) hostPath.substring(0, slashAt) else hostPath)
      .toLowerCase(java.util.Locale.ROOT)
    var path = if (slashAt >= 0) hostPath.substring(slashAt) else ""
    if (authority.startsWith("www.")) authority = authority.substring(4)
    if (scheme == "http" && authority.endsWith(":80"))
      authority = authority.dropRight(3)
    if (scheme == "https" && authority.endsWith(":443"))
      authority = authority.dropRight(4)
    if (path.isEmpty) path = "/"
    else if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
    val params = query.split("&").toSeq.filter(_.nonEmpty).filterNot { p =>
      val k = p.indexOf('=') match {
        case -1 => p
        case i  => p.substring(0, i)
      }
      val kl = k.toLowerCase(java.util.Locale.ROOT)
      kl.startsWith("utm_") || tracking(kl)
    }.sorted
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    UTF8String.fromString(s"$scheme://$authority$path$q")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("urlCanon", this, classOf[UrlCanonExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
}

object UrlCanonExpr {
  /** Column API: canonicalize a URL string. */
  def url_canon(url: Column): Column =
    GraftColumnBridge.column(UrlCanonExpr(GraftColumnBridge.expression(url)))
}
