package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.TextFunctions._

/** Scalar layer unit + property tests (SURVEY.md §2.2/§2.6 operators).
  * Fixtures carried over from the reference's inline test articles
  * (FIXTURES.md §1.2; `test_pipeline.py:119-126`,
  * `test_production_pipeline.py:114-131`). */
class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  /** Minimal property loop over scalacheck generators (the
    * scalatest-scalacheck bridge artifact isn't in the offline cache). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.cast("string")).as[String].head()

  test("P7 whitespace normalize collapses runs and trims") {
    assert(eval1(normalizeWhitespace(col("s")), "  a \t b\n\nc  ") == "a b c")
  }

  test("P7 is idempotent (property)") {
    forAllSampled(Gen.asciiPrintableStr) { s =>
      val once = eval1(normalizeWhitespace(col("s")), s)
      val twice = eval1(normalizeWhitespace(lit(once)), "x")
      assert(once == twice)
    }
  }

  test("unicode cleanup canonicalizes quotes/dashes/spaces, strips invisibles, idempotent") {
    val dirty = "\u201CHi\u201D \u2018there\u2019 \u2014 a\u00A0b c" +
      "\u200Bd\u0007 ef\u2003g"
    val got = eval1(normalizeUnicode(col("s")), dirty)
    assert(got == "\"Hi\" 'there' - a b cd ef g")
    // idempotent: a second pass changes nothing
    assert(eval1(normalizeUnicode(lit(got)), "x") == got)
    // clean ASCII passes through untouched (modulo whitespace collapse)
    assert(eval1(normalizeUnicode(col("s")), "plain  text") == "plain text")
  }

  test("P8 category cleanup strips prefix, trims, drops empties") {
    val got = Seq(Seq("Category:Science", " Category:Art ", "", "Category:  ", "Plain"))
      .toDF("cats")
      .select(cleanCategories(col("cats")))
      .as[Seq[String]].head()
    // reference semantics (src/data_processor.py:75-79): the prefix is only
    // stripped when it starts the raw string — " Category:Art " keeps its
    // prefix (startswith fails) and is merely trimmed
    assert(got == Seq("Science", "Category:Art", "Plain"))
  }

  test("P8 never lengthens an element (property)") {
    forAllSampled(Gen.listOf(Gen.asciiPrintableStr)) { xs =>
      val got = Seq(xs).toDF("cats").select(cleanCategories(col("cats")))
        .as[Seq[String]].head()
      assert(got.size <= xs.size)
      got.foreach(e => assert(e.nonEmpty))
    }
  }

  test("P5 article URL uses underscore form") {
    assert(eval1(articleUrl(col("s")), "Albert Einstein") ==
      "https://en.wikipedia.org/wiki/Albert_Einstein")
  }

  test("F1/F5 validator and redirect predicate") {
    val df = Seq(
      ("Test Article", "This is test content"), // valid (test_pipeline.py:119-126)
      ("", "content"),                          // empty title
      ("t", ""),                                // empty content
      ("t", "#REDIRECT [[X]]"),                 // redirect, upper
      ("t", "#redirect [[X]]")                  // redirect, lower
    ).toDF("title", "text")
    val n = df.where(isValid(col("title"), col("text")) && !isRedirect(col("text"))).count()
    assert(n == 1)
  }

  test("U1 wikitext strip on the reference's markup fixture") {
    // test_production_pipeline.py:114-131 shape: template, bold, links, ref, heading
    val wt = "{{Infobox|name=Test}} '''Bold''' and ''italic'' see " +
      "[[Page|linked text]] and [[Direct]]<ref name=a>cite</ref> == Heading == tail"
    assert(eval1(wikitextToPlain(col("s")), wt) ==
      "Bold and italic see linked text and Direct Heading tail")
  }

  test("charPolyHash matches the cross-engine reference value") {
    // same value DuckDB computes via list_reduce over unicode(c): probed 204910434
    val h = Seq("hello world").toDF("s").select(charPolyHash(col("s"))).as[Long].head()
    assert(h == 204910434L)
  }

  test("charPolyHash equals the built-in HOF fold it replaces (property)") {
    val hof = (s: org.apache.spark.sql.Column) => aggregate(
      split(s, ""), lit(0L),
      (h, ch) => (h * lit(31L) + ascii(ch).cast("long")) % lit(HashMod))
    forAllSampled(Gen.asciiPrintableStr.suchThat(_.nonEmpty), 20) { s =>
      val df = Seq(s).toDF("s")
      val a = df.select(charPolyHash(col("s"))).as[Long].head()
      val b = df.select(hof(col("s"))).as[Long].head()
      assert(a == b)
    }
  }

  test("contentHash combines the two independent folds injectively (property)") {
    // JVM-side replay of both folds — the same arithmetic the DuckDB
    // oracle's poly2 mirrors; also pins that h1 recovers via DIV 1e9+9
    def ref(s: String): Long = {
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h1 = (h1 * 31L + cp) % 1000000007L
        h2 = (h2 * 131L + cp) % 1000000009L
        i += Character.charCount(cp)
      }
      h1 * 1000000009L + h2
    }
    forAllSampled(Gen.asciiPrintableStr, 20) { s =>
      val df = Seq(s).toDF("s")
      val got = df.select(graft.functions.TextFunctions.contentHash(col("s")))
        .as[Long].head()
      assert(got == ref(s))
      val h1 = df.select(charPolyHash(col("s"))).as[Long].head()
      assert(got / 1000000009L == h1)
      assert(got >= 0L) // max ≈ 1.000000015e18 < Long.MaxValue, never wraps
    }
  }

  test("shingles: distinct n-grams, short text yields empty") {
    val got = Seq("a b c b a b c").toDF("s")
      .select(shingles(col("s"), 3)).as[Seq[String]].head()
    assert(got.sorted == Seq("a b c", "b a b", "b c b", "c b a").sorted)
    val short = Seq("a b").toDF("s").select(shingles(col("s"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("word/line counts match reference semantics") {
    val df = Seq("one two\nthree  four\n").toDF("s")
    assert(df.select(wordCount(col("s"))).as[Int].head() == 4)
    assert(df.select(lineCount(col("s"))).as[Int].head() == 3) // trailing \n => empty last
    assert(Seq("").toDF("s").select(wordCount(col("s"))).as[Int].head() == 0)
  }

  test("lineChunks tiles exactly (property): re-joined chunks == tokens, " +
    "every chunk but the last is full width, null/empty -> zero chunks") {
    val tok = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAllSampled(Gen.choose(0, 47).flatMap(n => Gen.listOfN(n, tok)), 25) {
      toks =>
        val w = 1 + toks.length % 7 // widths 1..7, co-varying with length
        val chunks = Seq(Tuple1(toks)).toDF("toks")
          .select(lineChunks(col("toks"), w))
          .as[Seq[String]].head()
        assert(chunks.flatMap(_.split(" ").filter(_.nonEmpty)) == toks,
          s"w=$w tiling must lose/duplicate nothing")
        assert(chunks.length == (toks.length + w - 1) / w)
        assert(chunks.dropRight(1).forall(_.split(" ").length == w),
          s"w=$w only the last chunk may run short")
    }
    val nullChunks = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
      .select(lineChunks(col("toks"), 5)).as[Seq[String]].head()
    assert(nullChunks.isEmpty)
  }
}
