package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level scalar layer (SURVEY.md §2.2 / §2.6).
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd,
  * whole-stage-compatible) — no Scala UDFs in the hot path. Each function
  * cites the reference behavior it reproduces (file:line into /root/reference).
  */
object TextFunctions {

  /** P7 whitespace normalize — `' '.join(s.split())`,
    * reference `src/data_processor.py:58-66`. Idempotent. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Whitespace tokenizer over normalized text (basis of P11/U-layer ops). */
  def tokens(c: Column): Column =
    split(normalizeWhitespace(c), " ")

  /** One (keep..., `tokAlias`) row per token of `text` — the token array
    * is materialized as a BOUND column before the explode (the
    * Dedup.shingleTable posture): Generate's inferred `size(...) > 0`
    * filter substitutes its child expressions when pushed down, so an
    * inline `explode(tokens(text))` runs the regexp tokenizer twice per
    * row (filter + generate), and anything with a per-element lambda over
    * an inlined tokenize re-runs it per ELEMENT. Every corpus-wide token
    * explode with a per-element lambda downstream should go through here
    * (pure explode→agg shapes are FASTER direct — the binding projection
    * is not free; A/B per site).
    *
    * `keep` is column NAMES, not Columns: the kept columns are selected in
    * BOTH the binding projection and the explode projection, which is only
    * well-defined for plain attribute references — an aliased or computed
    * Column would resolve against the wrong input in the second select, so
    * the signature forbids it. */
  def explodeTokens(docs: DataFrame, tokAlias: String,
                    keep: String*): DataFrame = {
    val keepCols = keep.map(col)
    docs.select(keepCols :+ tokens(col("text")).as("__toks"): _*)
      .select(keepCols :+ explode(col("__toks")).as(tokAlias): _*)
  }

  /** Unicode cleanup — the punctuation/space canonicalization pass web
    * corpora need before any hash-based dedup (a curly quote makes two
    * otherwise-identical docs distinct): curly quotes → straight, long
    * dashes → hyphen, exotic spaces → plain space, zero-width and control
    * characters → removed, then whitespace-normalized. Every class is an
    * explicit codepoint list (no locale-dependent regex classes — Java and
    * RE2 must agree char for char). Map-only, codegen'd, idempotent. */
  def normalizeUnicode(c: Column): Column = {
    val singles = regexp_replace(c, "[\u2018\u2019\u201A\u201B]", "'")
    val doubles = regexp_replace(singles, "[\u201C\u201D\u201E]", "\"")
    val dashes = regexp_replace(doubles, "[\u2013\u2014\u2015]", "-")
    val spaces = regexp_replace(dashes,
      "[\u00A0\u2000-\u200A\u202F\u3000]", " ")
    val zeroWidth = regexp_replace(spaces,
      "[\u200B\u200C\u200D\uFEFF]", "")
    val controls = regexp_replace(zeroWidth,
      "[\u0000-\u0008\u000B\u000C\u000E-\u001F\u007F]", "")
    normalizeWhitespace(controls)
  }

  /** P8 category cleanup — drop falsy, strip `Category:` prefix, trim, drop
    * empties; reference `src/data_processor.py:68-83`. Pure higher-order
    * array functions, no shuffle, no UDF. */
  def cleanCategories(c: Column): Column =
    filter(
      transform(c, x => trim(regexp_replace(x, "^Category:", ""))),
      x => x.isNotNull && x =!= "")

  /** P5 URL construction — `https://en.wikipedia.org/wiki/` + title with
    * spaces as underscores (MediaWiki canonical form); reference
    * `src/mediawiki_client.py:162`. The reference uses percent-encoding via
    * `urllib.parse.quote`; we use the title-path form (documented deviation —
    * MediaWiki treats them identically). */
  def articleUrl(title: Column): Column =
    concat(lit("https://en.wikipedia.org/wiki/"), regexp_replace(title, " ", "_"))

  /** F1 required-fields validator — row passes iff all of the given columns
    * are non-null and non-empty; reference `src/data_processor.py:48-56`. */
  def isValid(cols: Column*): Column =
    cols.map(c => c.isNotNull && c =!= "").reduce(_ && _)

  /** F5 redirect predicate — reference `src/mediawiki_client.py:150` checks
    * `#REDIRECT`/`#redirect`; we normalize case (strictly more correct). */
  def isRedirect(content: Column): Column =
    lower(content).startsWith("#redirect")

  /** P11 text statistics — reference `src/production_data_processor.py:169-182`. */
  def wordCount(c: Column): Column =
    when(normalizeWhitespace(c) === "", lit(0))
      .otherwise(size(tokens(c)))
  def lineCount(c: Column): Column = size(split(c, "\n"))

  /** U1 wikitext → plain text, as a codegen'd regexp chain (no UDF).
    * Reproduces the observable effect of `wikitextparser.plain_text()` on the
    * reference's fixtures (`src/production_mediawiki_client.py:107-118`,
    * `test_production_pipeline.py:114-131`): strip templates (2 nesting
    * levels), piped links `[[a|b]]`→b, plain links `[[a]]`→a, external links,
    * refs, bold/italic quote runs, headings markup, then normalize
    * whitespace. A fixed chain (vs a recursive parser) keeps it
    * whole-stage-codegen and oracle-expressible. */
  def wikitextToPlain(c: Column): Column = {
    val noTmpl1 = regexp_replace(c, "\\{\\{[^{}]*\\}\\}", " ")
    val noTmpl2 = regexp_replace(noTmpl1, "\\{\\{[^{}]*\\}\\}", " ")
    val noRef   = regexp_replace(noTmpl2, "<ref[^>]*>.*?</ref>|<ref[^>]*/>", " ")
    val pipedLk = regexp_replace(noRef, "\\[\\[[^\\]|]*\\|([^\\]]*)\\]\\]", "$1")
    val plainLk = regexp_replace(pipedLk, "\\[\\[([^\\]]*)\\]\\]", "$1")
    val extLk   = regexp_replace(plainLk, "\\[https?://[^\\s\\]]*( ([^\\]]*))?\\]", "$2")
    val quotes  = regexp_replace(extLk, "'{2,}", "")
    val heading = regexp_replace(quotes, "={2,}", "")
    normalizeWhitespace(heading)
  }

  /** Portable polynomial string hash: fold chars as
    * `h = (h*31 + codepoint) mod 1e9+7`, h0=0. Deterministic and expressible
    * identically in DuckDB (`list_reduce` over `unicode(c)`) — the
    * cross-engine-checkable hash underlying minhash/simhash/fingerprints.
    * Implemented as a codegen'd Catalyst expression
    * ([[graft.plans.CharPolyHashExpr]]); the equivalent (slower) built-in
    * form is `aggregate(split(s,''), 0L, (h,c) => (h*31+ascii(c)) % M)`.
    * At 100 TB `xxhash64` is the drop-in upgrade if oracle parity is not
    * needed. */
  val HashMod = 1000000007L
  def charPolyHash(s: Column): Column =
    graft.plans.ArrayExpressions.charPolyHash(s)

  /** Wide (≈2^60) content-identity hash — two independent polynomial folds
    * combined injectively into one 8-byte key; the grouping key wherever a
    * FULL DOCUMENT's identity is at stake (exact dedup, funnels, snapshot
    * diffs). See [[graft.plans.ContentHashExpr]] for the collision math
    * and the cross-engine replay. */
  def contentHash(s: Column): Column =
    graft.plans.ArrayExpressions.contentHash(s)

  /** Portable token-sequence rolling hash: fold token hashes as
    * `h = (h*131 + charPolyHash(tok)) mod 1e9+7` — the document fingerprint. */
  def tokenSeqHash(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, t) => (h * lit(131L) + charPolyHash(t)) % lit(HashMod))

  /** Distinct word n-gram shingles from an already-materialized token-array
    * column. IMPORTANT: pass a bound attribute (a column produced by a prior
    * select), not an inline `tokens(text)` expression — subexpressions are
    * inlined into the transform lambda and would re-tokenize the whole text
    * for every element_at (observed 10× slowdown). */
  /** Fixed-width "lines" of a token array: chunks of `wordsPerLine` tokens
    * re-joined with single spaces — the shared line unit of
    * [[graft.operators.Dedup.lineTable]] and
    * [[graft.operators.WebCuration.templateLineStrip]] (the synthetic
    * corpus has no newlines; real web text would `split(text, '\n')`
    * instead). A NULL or empty token array yields an EMPTY chunk array:
    * `size(NULL)` is NULL (so the un-guarded arithmetic would NULL the
    * whole column), and a plain `<= 0` guard would let
    * `sequence(0, nChunks−1)` DESCEND to `[0, −1]` and fabricate two
    * phantom null lines. */
  def lineChunks(toks: Column, wordsPerLine: Int): Column = {
    require(wordsPerLine >= 1,
      s"wordsPerLine $wordsPerLine < 1: the (size+w-1)/w chunk count would " +
        "divide by zero (non-ANSI NULL), silently nulling every chunk array")
    val w = wordsPerLine
    when(toks.isNull || size(toks) <= 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), (size(toks) + (w - 1)).divide(w).cast("int") - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
  }

  def shinglesFromToks(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array().cast("array<string>")).otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))

  /** Distinct word n-gram shingles of the normalized text (dedup unit).
    * Convenience form; in per-row hot paths materialize the tokens first
    * and call [[shinglesFromToks]]. */
  def shingles(text: Column, n: Int): Column = shinglesFromToks(tokens(text), n)

  /** The i-th minhash permutation of a base hash `h`:
    * `((1000003*(i+1))*h + 12345 + 7919*i) mod 1e9+7`. Fits in Long
    * (coeff ≤ ~2e8, h < 1e9+7 → product < 2^63). */
  def minhashPerm(i: Column, h: Column): Column =
    ((lit(1000003L) * (i + 1)) * h + lit(12345L) + lit(7919L) * i) % lit(HashMod)
}
