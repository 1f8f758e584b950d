package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WebCuration

/** Crafted-fixture coverage for the HTML→text extractor (the S5 real-page
  * pathway): tag classes, entity decode order, the jusText link-density
  * gate boundary, malformed-input determinism, and the map-only plan
  * guarantee. The sf-scale oracle (`web_html_text`) covers the planted
  * corpus; these pin the per-rule semantics on adversarial pages. */
class HtmlTextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def extract(html: String, maxLd: Long = 50L): (Long, Long, String) = {
    val r = WebCuration.htmlTextReport(
      Seq((1L, html)).toDF("doc_id", "html"), maxLd).collect()(0)
    (r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("script/style/comment blocks vanish (case-insensitive, with attrs); " +
    "block tags split lines; inline tags strip without splitting") {
    val page = "<HTML><BODY><SCRIPT type=\"text/javascript\">var a='<p>';" +
      "</SCRIPT><style media=\"all\">h1{x:1}</style><!-- note\nspans lines -->" +
      "<p>alpha <b>bold</b> and <span class=\"x\">span</span> text</p>" +
      "<h2>Section two</h2></BODY></HTML>"
    val (n, k, txt) = extract(page)
    assert(n == 2L && k == 2L)
    assert(txt == "alpha bold and span text\nSection two")
  }

  test("pure-navigation line (density 100) drops; prose line with an " +
    "embedded link survives; density boundary is inclusive at the max") {
    // t = "xxxxx yyyy" (10), a = "xxxxx" (5) -> 50, kept at the default 50
    val atBoundary = "<p><a href=\"/x\">xxxxx</a> yyyy</p>"
    // t = "xxxxxx yyy" (10), a = "xxxxxx" (6) -> 60, dropped
    val overBoundary = "<p><a href=\"/x\">xxxxxx</a> yyy</p>"
    val nav = "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a></div>"
    val (n, k, txt) = extract(
      "<body>" + nav + atBoundary + overBoundary + "<p>plain prose line</p></body>")
    assert(n == 4L && k == 2L)
    assert(txt == "xxxxx yyyy\nplain prose line")
  }

  test("anchor text inside inline markup still counts toward link density") {
    // anchor carries <b> inside: a = "Home About" (10) over t = "Home About" -> 100
    val (_, k, txt) = extract(
      "<div><a href=\"/a\"><b>Home</b></a> <a href=\"/b\">About</a></div><p>keep me</p>")
    assert(k == 1L && txt == "keep me")
  }

  test("entity decode: fixed set, &amp; last — double-encoded &amp;lt; " +
    "yields literal &lt;, &#39; decodes to an apostrophe") {
    val (_, _, txt) = extract(
      "<p>a &lt;tag&gt; &quot;q&quot; it&#39;s A&nbsp;B &amp; C &amp;lt;kept&amp;gt;</p>")
    assert(txt == "a <tag> \"q\" it's A B & C &lt;kept&gt;")
  }

  test("empty, whitespace-only, and text-free pages yield zero lines") {
    assert(extract("") == (0L, 0L, ""))
    assert(extract("  \n\t ") == (0L, 0L, ""))
    assert(extract("<html><body><p>   </p></body></html>") == (0L, 0L, ""))
  }

  test("malformed HTML is deterministic, never an error: a stray '<' with " +
    "no closing '>' stays literal text") {
    val (n, k, txt) = extract("<p>broken < tag stays</p>")
    assert(n == 1L && k == 1L && txt == "broken < tag stays")
  }

  test("<br/> and <hr> split lines; headings h1..h6 all split") {
    val (_, _, txt) = extract(
      "<p>one<br/>two<hr>three</p><h6>deep heading</h6>")
    assert(txt == "one\ntwo\nthree\ndeep heading")
  }

  test("htmlToText column form equals the report's plain_text") {
    val pages = Seq(
      (1L, "<body><p>alpha</p><div><a href=\"/x\">Nav</a></div></body>"),
      (2L, "<p>beta &amp; gamma</p>"),
      (3L, "")).toDF("doc_id", "html")
    val viaCol = pages.select(col("doc_id"),
      WebCuration.htmlToText(col("html")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaReport = WebCuration.htmlTextReport(pages).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(viaCol == viaReport && viaCol(1L) == "alpha")
  }

  test("extraction of tag-free, entity-free, single-line text is exactly " +
    "whitespace normalization (the no-op boundary of the extractor)") {
    import graft.functions.TextFunctions.normalizeWhitespace
    val docs = Tables.documents(spark, sfDir)
      .where(!col("text").contains("<") && !col("text").contains("&") &&
        !col("text").contains("\n"))
    val n = docs.count()
    assert(n > 0, "corpus unexpectedly empty of plain docs")
    val mismatches = docs.select(
        WebCuration.htmlToText(col("text")).as("ext"),
        normalizeWhitespace(col("text")).as("norm"))
      .where(col("ext") =!= col("norm")).count()
    assert(mismatches == 0L, s"$mismatches/$n plain docs changed by extraction")
  }

  test("plan canary: the extraction report is map-only — no Exchange " +
    "anywhere (the page never enters a shuffle)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val plan = WebCuration.htmlTextReport(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction plan shuffles:\n$plan")
  }
}
