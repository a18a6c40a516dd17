package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Markup → block text extraction, codegen'd — the curation stage a
  * crawl pipeline runs FIRST (round-14, VERDICT r13 item 7): strip
  * tags, drop script/style/comment content wholesale, decode the
  * common entities, and preserve BLOCK structure as newlines so the
  * downstream quality/dedup family sees prose, not markup.
  *
  * One single-pass, allocation-bounded tokenizer per row (static JVM
  * call from generated code, the [[DeflateLen]] pattern — the row
  * stays inside whole-stage codegen):
  *
  *   - `<script>`/`<style>` elements are dropped INCLUDING content
  *     (matching is case-insensitive; a `<` inside script text does
  *     not terminate the element — only the real close tag does);
  *   - `<!-- -->` comments are dropped including content;
  *   - block-level tags (p, div, br, li, headings, table rows, …)
  *     emit a newline; table cells emit a space (so `<td>a</td><td>b`
  *     reads "a b", not "ab"); all other tags — inline markup — emit
  *     nothing (`<b>bo</b>ld` reads "bold");
  *   - attributes are skipped quote-aware (a literal `>` inside a
  *     quoted attribute value does not end the tag);
  *   - entities: the five XML names, `&nbsp;` (→ space), and numeric
  *     `&#NN;` / `&#xHH;` decode; an unknown or unterminated `&`
  *     sequence passes through verbatim;
  *   - whitespace normalizes: runs of spaces/tabs collapse to one
  *     space, blank runs around newlines collapse to ONE newline,
  *     leading/trailing whitespace trims;
  *   - malformed input NEVER throws (the multimodal codec rule): an
  *     unclosed tag, comment, or script drops the dangling remainder
  *     and returns what was extracted before it.
  *
  * Deterministic pure function of the input, but a full tokenizer is
  * not expressible in oracle SQL — the registry therefore carries the
  * pair q_text_html_strip (a regexp-chain approximation with
  * identical semantics in both engines, oracle-checked) and
  * q_text_html_extract (this operator, declared no-oracle,
  * HtmlExtractSpec pins exact planted ground truth including the
  * traps the regexp chain cannot see: quoted `>` in attributes, tags
  * inside script strings).
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "html_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    HtmlText.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HtmlText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  /** Tags whose boundary is a BLOCK boundary (newline). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "table", "thead", "tbody",
    "title", "section", "article", "header", "footer", "blockquote",
    "pre", "hr", "form", "main", "nav", "aside", "figure", "figcaption")

  /** Tags whose boundary separates words but not blocks (space). */
  private val SpaceTags: Set[String] = Set("td", "th", "img", "input")

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(extract(s.toString))

  /** See the class doc for the contract. Never throws. */
  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    // case-insensitive region compare against a lowercase needle
    def matches(at: Int, needle: String): Boolean =
      at + needle.length <= n &&
        html.regionMatches(true, at, needle, 0, needle.length)
    // index AFTER the next occurrence of a case-insensitive needle,
    // or n (drop the dangling remainder — degrade, never throw)
    def skipPast(from: Int, needle: String): Int = {
      var j = from
      while (j <= n - needle.length) {
        if (html.regionMatches(true, j, needle, 0, needle.length))
          return j + needle.length
        j += 1
      }
      n
    }
    // the element's content is dropped wholesale: only the REAL close
    // tag ends it, then skip to that tag's '>'
    def skipElement(from: Int, name: String): Int = {
      val close = skipPast(from, "</" + name)
      if (close >= n) n else skipPast(close, ">")
    }
    // quote-aware scan to the tag-closing '>' (a '>' inside a quoted
    // attribute value does not terminate the tag)
    def skipTag(from: Int): Int = {
      var j = from
      while (j < n) {
        html.charAt(j) match {
          case '>' => return j + 1
          case q @ ('"' | '\'') =>
            j += 1
            while (j < n && html.charAt(j) != q) j += 1
            if (j < n) j += 1
          case _ => j += 1
        }
      }
      n
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // A '/>'-terminated script/style is treated as an EMPTY
        // element. This diverges DELIBERATELY from HTML5 in one way
        // and matches it in another (round 17, ADVICE r16 low):
        //  - divergence: a real parser IGNORES the self-closing slash
        //    on non-void elements (<script src="x"/> stays OPEN and a
        //    browser hunts </script>). Honoring it is the lesser evil
        //    for a text cleaner — treating the tag as open when no
        //    close tag follows would silently drop the rest of the
        //    document (the round-15 EOF-drop bug this predicate
        //    exists to avoid).
        //  - spec-matched: an UNQUOTED attribute value consumes a
        //    trailing '/' (<script data-x=a/> has value "a/" and the
        //    tag is NOT self-closed), so the '/' only counts when it
        //    follows the tag name, a bare attribute name, or a quoted
        //    value end — decided by a forward scan over the tag body.
        // `tagStart` is the index after the tag name, `end` the index
        // AFTER the open tag's '>'; whitespace may sit between '/'
        // and '>' (lenient, like the rest of this degrader).
        def selfClosed(tagStart: Int, end: Int): Boolean = {
          if (end > n || end < 2 || html.charAt(end - 1) != '>') return false
          var k = end - 2
          while (k >= tagStart && Character.isWhitespace(html.charAt(k))) k -= 1
          if (k < tagStart || html.charAt(k) != '/') return false
          // is that '/' inside an unquoted attribute value?
          var j = tagStart
          var inUnquoted = false
          var afterEq = false
          while (j < k) {
            val ch = html.charAt(j)
            if (inUnquoted) {
              if (Character.isWhitespace(ch)) inUnquoted = false
            } else if ((ch == '"' || ch == '\'') && afterEq) {
              var q = j + 1
              while (q < k && html.charAt(q) != ch) q += 1
              j = q
              afterEq = false
            } else if (ch == '=') afterEq = true
            else if (!Character.isWhitespace(ch) && afterEq) {
              inUnquoted = true
              afterEq = false
            }
            j += 1
          }
          !inUnquoted
        }
        if (matches(i, "<!--")) i = skipPast(i + 4, "-->")
        else if (matches(i, "<script") &&
          (i + 7 >= n || !Character.isLetterOrDigit(html.charAt(i + 7)))) {
          val end = skipTag(i + 7)
          i = if (selfClosed(i + 7, end)) end else skipElement(end, "script")
        }
        else if (matches(i, "<style") &&
          (i + 6 >= n || !Character.isLetterOrDigit(html.charAt(i + 6)))) {
          val end = skipTag(i + 6)
          i = if (selfClosed(i + 6, end)) end else skipElement(end, "style")
        }
        else if (i + 1 < n && (Character.isLetter(html.charAt(i + 1)) ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?')) {
          var j = i + 1
          if (html.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (BlockTags.contains(name)) out.append('\n')
          else if (SpaceTags.contains(name)) out.append(' ')
          i = skipTag(j)
        } else { out.append(c); i += 1 } // bare '<' is text
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val entity =
          if (semi > i && semi - i <= 8) html.substring(i + 1, semi)
          else null
        val decoded: String = entity match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case e if e.length > 1 && e.charAt(0) == '#' =>
            try {
              val cp =
                if (e.charAt(1) == 'x' || e.charAt(1) == 'X')
                  Integer.parseInt(e.substring(2), 16)
                else Integer.parseInt(e.substring(1))
              if (Character.isValidCodePoint(cp))
                new String(Character.toChars(cp))
              else null
            } catch { case _: NumberFormatException => null }
          case _ => null
        }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 } // unknown entity: verbatim
      } else { out.append(c); i += 1 }
    }
    normalize(out)
  }

  /** Collapse space/tab runs to one space, blank runs around newlines
    * to one newline; trim. */
  private def normalize(raw: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var pendingNewline = false
    var i = 0
    while (i < raw.length) {
      raw.charAt(i) match {
        case '\n' => pendingNewline = true
        case ' ' | '\t' | '\r' => pendingSpace = true
        case ch =>
          if (out.length > 0) {
            if (pendingNewline) out.append('\n')
            else if (pendingSpace) out.append(' ')
          }
          pendingNewline = false; pendingSpace = false
          out.append(ch)
      }
      i += 1
    }
    out.toString
  }

  def apply(c: Column): Column = Bridge.column(HtmlText(Bridge.expression(c)))
}
