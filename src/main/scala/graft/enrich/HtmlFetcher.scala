package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Real HTML fetcher: reproduces the reference's page scrape — title
  * validation, showcase-vs-traditional layout detection, and label→value
  * field extraction (test_parquet_processor.py:132-266) — over plain
  * HTTP + HTML-fragment scanning instead of a browser.
  *
  * Faithful behaviors:
  *  - a page whose &lt;title&gt; does not contain "Showcase Media" is
  *    rejected ("Not a valid MorphoSource media page", :153-155);
  *  - layout detection probes showcase first, then traditional, by
  *    locating the "Media type" label with a value div of the layout's
  *    value class (:166-199); neither → "Could not determine page layout
  *    or media type";
  *  - field values come from the label's NEXT div, first text line,
  *    trimmed (:238-259); absent labels surface as absent keys (the
  *    Enricher null-fills and masks to the media type's sections).
  *
  * The HTML transport is pluggable (`fetchHtml`) so tests run hermetically
  * against canned fixtures; the default is a `java.net.http` GET with a
  * per-request timeout. One instance per partition (Enricher contract)
  * reuses one HttpClient, mirroring the one-driver-per-batch reuse.
  */
final class HtmlFetcher(fetchHtml: String => String = HtmlFetcher.httpGet())
    extends Fetcher {

  override def fetch(url: String): Map[String, String] = {
    val html = fetchHtml(url)
    val title = HtmlFetcher.title(html)
    if (!title.contains("Showcase Media"))
      throw new RuntimeException("Not a valid MorphoSource media page")
    val layout = HtmlFetcher.detectLayout(html).getOrElse(
      throw new RuntimeException("Could not determine page layout or media type"))
    val pairs = HtmlFetcher.labelValuePairs(html, layout)
    val mediaType = pairs.collectFirst {
      case (label, value) if label.toLowerCase.contains("media type") => value
    }.getOrElse(
      throw new RuntimeException("Could not determine page layout or media type"))
    pairs.toMap + ("Media Type" -> mediaType)
  }
}

object HtmlFetcher {

  /** Layout descriptors (test_parquet_processor.py:166-177): class of the
    * label div and of the media-type value div used for detection.
    */
  private[enrich] case class Layout(name: String, labelClass: String, valueClass: String)
  private[enrich] val Showcase = Layout("showcase", "showcase-label", "showcase-value")
  private[enrich] val Traditional = Layout("traditional", "field-name", "field-value")

  /** Default transport: GET with a 10 s timeout (the reference's
    * per-record budget), following redirects.
    */
  def httpGet(timeoutMs: Long = 10000): String => String = {
    lazy val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()
    url => {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  private val TitleRe =
    """(?is)<title[^>]*>(.*?)</title>""".r

  private[enrich] def title(html: String): String =
    TitleRe.findFirstMatchIn(html).map(m => text(m.group(1))).getOrElse("")

  /** A div whose class attribute contains `cls`, capturing its inner
    * HTML non-greedily. Label divs must be leaf elements (they are, in
    * both reference layouts — and in [[detectLayout]] the value-class
    * match only probes existence); VALUE extraction goes through
    * [[nextDivInner]], which handles nested markup.
    */
  private def divWithClass(cls: String) =
    ("""(?is)<div[^>]*class="[^"]*""" + java.util.regex.Pattern.quote(cls) +
      """[^"]*"[^>]*>(.*?)</div>""").r

  private val OpenDiv = """(?is)<div[^>]*>""".r
  private val DivTag = """(?is)<(/?)div\b[^>]*>""".r

  /** Inner HTML of the next `<div>` element at or after `from`, spanning
    * to its MATCHING close tag via a depth-counting scan — a value div
    * containing nested markup (`<div>`/`<span>`/`<a>`) is extracted
    * whole, where a non-greedy regex would truncate at the first inner
    * `</div>` (the reference's XPath `following-sibling::div[1]` gets
    * this for free from a real DOM). An unclosed div runs to the end of
    * the document, like a browser's recovery parse.
    */
  private def nextDivInner(html: String, from: Int): Option[String] = {
    // Matcher.region, not html.substring(from): the substring form copied
    // the page tail TWICE per label, O(labels × page bytes) of transient
    // char[] churn on a label-dense page; region scans in place
    val open = OpenDiv.pattern.matcher(html)
    open.region(from, html.length)
    if (!open.find()) None
    else {
      val bodyStart = open.end
      var depth = 1
      var end = html.length
      val tags = DivTag.pattern.matcher(html)
      tags.region(bodyStart, html.length)
      while (end == html.length && tags.find()) {
        depth += (if (tags.group(1).isEmpty) 1 else -1)
        if (depth == 0) end = tags.start
      }
      Some(html.substring(bodyStart, end))
    }
  }

  /** Probe showcase then traditional: the layout whose "Media type" label
    * is followed by a value div of the layout's value class wins
    * (`following-sibling::div[contains(@class, value-class)]`,
    * test_parquet_processor.py:168-199).
    */
  private[enrich] def detectLayout(html: String): Option[Layout] =
    Seq(Showcase, Traditional).find { layout =>
      divWithClass(layout.labelClass).findAllMatchIn(html).exists { m =>
        text(m.group(1)).contains("Media type") && {
          val vm = divWithClass(layout.valueClass).pattern.matcher(html)
          vm.region(m.end, html.length)
          vm.find()
        }
      }
    }

  /** All (label, value) pairs of the layout: each label div's value is
    * the next div element's first text line (extract_page_data's
    * `following-sibling::div[1]` + `.split('\n')[0]`). The value div is
    * delimited by [[nextDivInner]]'s depth-counting scan, so nested
    * markup inside a value survives intact.
    */
  private[enrich] def labelValuePairs(html: String, layout: Layout): Seq[(String, String)] =
    divWithClass(layout.labelClass).findAllMatchIn(html).flatMap { m =>
      val label = text(m.group(1))
      nextDivInner(html, m.end).map { inner =>
        label -> text(inner).linesIterator.nextOption().getOrElse("").trim
      }
    }.toSeq

  /** Tag-strip + minimal entity unescape + trim. `&amp;` is unescaped
    * LAST so entity-escaped sequences unescape exactly once (`&amp;lt;`
    * → `&lt;`, not `<`), matching a browser's single-pass decode.
    */
  private[enrich] def text(fragment: String): String =
    fragment.replaceAll("(?is)<[^>]+>", " ")
      .replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")
      .replaceAll("[ \\t\\x0B\\f\\r]+", " ")
      .trim
}
