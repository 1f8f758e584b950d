package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.ADT
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** Codegen'd Catalyst expressions for the engine's hot inner loops.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback — every fold step is an interpreted lambda call with
  * boxing. These expressions compile the same arithmetic, in the same
  * evaluation order, into whole-stage-codegen Java loops:
  *
  *  - [[DotProductExpr]] — sequential Σ a[i]·b[i] over two double arrays;
  *    bit-identical to the left fold it replaces (and to DuckDB's
  *    `list_dot_product`), so the oracle contract is unchanged.
  *  - [[CharPolyHashExpr]] — h = (h·31 + codepoint) mod 1e9+7 over a
  *    string's codepoints; bit-identical to the `aggregate(split(s,''))`
  *    fold it replaces (and to DuckDB's `list_reduce` over `unicode(c)`).
  *
  * Registered for SQL via [[GraftExtensions]] (`graft_dot`, `graft_hash`).
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // the analyzer casts array<float> etc. to array<double> — without this,
  // getDouble over a float array would return reinterpreted garbage
  override def inputTypes: Seq[ADT] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CharPolyHashExpr(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[ADT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharPolyHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPolyHashExpr {
  /** Called from generated code (static, branch-free inner loop). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }
}

/** Wide CONTENT-IDENTITY hash: two independent char-polynomial folds
  * (base 31 mod 1e9+7, base 131 mod 1e9+9) combined injectively as
  * `h1 * (1e9+9) + h2` — one pass over the codepoints, one 8-byte key.
  * Key space is ~1e18 (≈2^60), so expected false merges are n²/2e18:
  * none below ~1e9 distinct documents (vs ~45k for a single mod-1e9+7
  * fold). Used wherever a FULL DOCUMENT's identity rides a shuffle or a
  * group key ([[graft.operators.Dedup.exactDuplicates]] and friends);
  * single-fold [[CharPolyHashExpr]] remains the key for bounded-impact
  * uses (shingles, salts) where a collision perturbs one count, not a
  * document's identity. Both folds replay exactly in DuckDB, keeping
  * the oracle convention: a (now astronomically rare) collision merges
  * two texts identically on both engines. Corpora beyond ~1e9 distinct
  * docs should swap in a 128-bit hash (e.g. two seeded xxhash64 calls)
  * at the same call sites, trading oracle replayability for width. */
case class ContentHashExpr(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[ADT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_content_hash"

  override def nullSafeEval(input: Any): Any =
    ContentHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ContentHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ContentHashExpr {
  /** Called from generated code (static, one pass for both folds). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 31L + cp) % 1000000007L
      h2 = (h2 * 131L + cp) % 1000000009L
      i += Character.charCount(cp)
    }
    // max h1*(1e9+9)+h2 ≈ 1.000000015e18 < Long.MaxValue — no overflow
    h1 * 1000000009L + h2
  }
}

/** One-pass multi-language stopword scoring over a token array.
  *
  * Replaces k independent `size(filter(toks, _.isin(words)))` higher-order
  * calls (each a CodegenFallback interpreted lambda re-walking the array)
  * with a single codegen'd pass: for each token, one hash-set probe per
  * language. Semantics are identical to the per-language `IN`-filter counts
  * (a token may score for several languages), so the relational DuckDB
  * oracle is unchanged. Output: array<long> of counts, one per word set,
  * in constructor order.
  */
case class StopwordScoresExpr(tokens: Expression, wordSets: Seq[Seq[String]])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = tokens
  override def inputTypes: Seq[ADT] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_stopword_scores"

  // UTF8String sets built once per executor (transient: rebuilt after ship)
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    wordSets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  def score(toks: ArrayData): ArrayData = {
    val counts = new Array[Long](sets.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordScorer", this,
      classOf[StopwordScoresExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

/** All random-hyperplane LSH buckets for one unit vector, in one pass.
  *
  * Replaces the literal-matrix formulation (an `array(array(lit...))` of
  * `tables·planes·dim` literals referenced once per plane — ~10⁶ expression
  * nodes after expansion, multi-MiB task binaries, and seconds of
  * optimizer/codegen time per plan) with a single expression that carries
  * the plane matrix as a *referenced object* (`ctx.addReferenceObj`, the
  * [[StopwordScoresExpr]] pattern): the plan holds one node, the task binary
  * holds one `double[]`, and the generated code makes one virtual call per
  * row.
  *
  * Semantics are unchanged from the composed form: plane weight for global
  * plane `g = t·planes + p`, component `d` is the deterministic LCG
  * `((1103515245·(g·dim+d+1)+12345) mod 2²¹)/2²¹ − 0.5` (identical to
  * `Similarity.planeWeight`, mirrored by the DuckDB oracles), each dot is
  * the same sequential left-fold as [[DotProductExpr]], and bucket `t` packs
  * `planes` sign bits (`dot > 0`). Output: `array<long>` of length `tables`.
  */
case class MultiPlaneBucketsExpr(child: Expression, planes: Int, tables: Int,
                                 dim: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(planes >= 1 && planes <= 62, "bucket is packed into one long")
  require(tables >= 1 && dim >= 1, "tables and dim must be positive")

  override def inputTypes: Seq[ADT] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_plane_buckets"

  // row-major (tables·planes) × dim; @transient: rebuilt from the three ints
  // after executor ship instead of serialized (64 KiB saved per task at the
  // defaults, and the rebuild is a few µs once per executor)
  @transient private lazy val w: Array[Double] = {
    val m = new Array[Double](tables * planes * dim)
    var g = 0
    while (g < tables * planes) {
      var d = 0
      while (d < dim) {
        m(g * dim + d) =
          ((1103515245L * (g.toLong * dim + d + 1) + 12345L) % 2097152L)
            .toDouble / 2097152.0 - 0.5
        d += 1
      }
      g += 1
    }
    m
  }

  /** Called from generated code; one sequential fold per plane, same
    * IEEE evaluation order as [[DotProductExpr]] over the literal rows. */
  def buckets(vn: ArrayData): ArrayData = {
    val n = math.min(vn.numElements(), dim)
    val out = new Array[Long](tables)
    var g = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = g * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += vn.getDouble(d) * w(base + d); d += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
        g += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeBuckets", this,
      classOf[MultiPlaneBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.buckets($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trained-BPE segmentation bill for a whole token array, in one pass.
  *
  * Replaces the composed form in `TextAnalysis.bpeSegmentCounts` — one
  * `aggregate(...)` fold per merge, so expression depth grows with
  * |merges| and every fold step is an interpreted lambda — with a single
  * expression that carries the merge table as a referenced object (the
  * [[StopwordScoresExpr]] pattern). A production tokenizer's 10⁴-entry
  * merge table becomes one `String[]` in the task binary and one virtual
  * call per row, instead of 10⁴ stacked CodegenFallback folds.
  *
  * Semantics are identical to the composed form (and to the DuckDB oracle
  * replay): per non-empty token, split into code-point symbols, then for
  * each merge (x, y) IN ORDER one greedy left-to-right pass — a symbol `y`
  * merges iff the previously-written symbol is exactly `x`; the merged
  * `x+y` immediately becomes eligible for later positions of the SAME
  * pass and for later merges. Output: Σ surviving symbols over all
  * tokens; empty tokens contribute 0.
  */
case class BpeSegmentCountExpr(tokens: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = tokens
  override def inputTypes: Seq[ADT] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  // flat (x0, y0, x1, y1, ...) — rebuilt after executor ship
  @transient private lazy val m: Array[String] = {
    val a = new Array[String](merges.length * 2)
    var i = 0
    merges.foreach { case (x, y) => a(i) = x; a(i + 1) = y; i += 2 }
    a
  }

  /** Called from generated code. */
  def count(toks: ArrayData): Long = {
    var total = 0L
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val tok = toks.getUTF8String(t).toString
        if (tok.nonEmpty) {
          // initial symbols: one per code point
          var syms = new Array[String](tok.codePointCount(0, tok.length))
          var i = 0
          var k = 0
          while (i < tok.length) {
            val cp = tok.codePointAt(i)
            val w = Character.charCount(cp)
            syms(k) = tok.substring(i, i + w)
            k += 1
            i += w
          }
          var len = syms.length
          var mi = 0
          while (mi < m.length) {
            val x = m(mi); val y = m(mi + 1)
            var w = 0
            var r = 0
            while (r < len) {
              if (w > 0 && syms(r) == y && syms(w - 1) == x) syms(w - 1) = x + y
              else { syms(w) = syms(r); w += 1 }
              r += 1
            }
            len = w
            mi += 2
          }
          total += len
        }
      }
      t += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegmenter", this,
      classOf[BpeSegmentCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

/** Column wrappers (the library-facing surface). */
/** Optimal (Viterbi) segmentation bill for ONE word against a piece
  * vocabulary — the unigram-LM decoding DP ([[TextAnalysis.wordpieceVocab]]
  * supplies the pieces) with EXACT integer scoring: minimize billed pieces,
  * tie-break minimum unknown-character fallbacks. This is the unigram
  * tokenizer's Viterbi decode under a uniform piece prior; a real −log p
  * cost table plugs into the same DP, but the uniform objective keeps the
  * score integral and therefore bit-identical cross-engine (no float logs).
  *
  * DP over character positions, O(|w|·maxPieceLen) with a hashed vocab
  * probe: `best[p] = min over matching pieces (s..p] of best[s] + STEP`,
  * plus the always-available single-unknown-char step at `STEP + 1`; costs
  * encode as `pieces·2³² + unknowns` so one BIGINT min is the
  * lexicographic (pieces, unknowns) min. The vocabulary rides as a
  * referenced object ([[BpeSegmentCountExpr]] pattern) — one hash set in
  * the task binary, one virtual call per row, whole-stage codegen intact.
  * Positions are Java chars (== DuckDB character semantics on BMP text;
  * the corpus tokenizer lowercases to BMP).
  */
case class ViterbiSegmentExpr(word: Expression, vocab: Seq[String])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = word
  override def inputTypes: Seq[ADT] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_viterbi_segment"

  // rebuilt after executor ship
  @transient private lazy val terms: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(vocab.size * 2, 16))
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  private val STEP = 1L << 32 // pieces·2³² + unknowns stays exact to |w|<2³¹

  /** Called from generated code. Returns [pieces, unknowns]. */
  def segment(w0: UTF8String): ArrayData = {
    val w = w0.toString
    val n = w.length
    val best = new Array[Long](n + 1)
    var p = 1
    while (p <= n) {
      // unknown single char: always a candidate; when the 1-char piece IS
      // in the vocabulary the match candidate below dominates it, so
      // offering it unconditionally never changes the min
      var b = best(p - 1) + STEP + 1L
      val lmax = math.min(maxPieceLen, p)
      var l = 1
      while (l <= lmax) {
        if (terms.contains(w.substring(p - l, p))) {
          val c = best(p - l) + STEP
          if (c < b) b = c
        }
        l += 1
      }
      best(p) = b
      p += 1
    }
    ArrayData.toArrayData(Array(best(n) >>> 32, best(n) & 0xffffffffL))
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbiSegmenter", this,
      classOf[ViterbiSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(word = newChild)
}

object ArrayExpressions {
  import org.apache.spark.sql.GraftColumnBridge._

  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def charPolyHash(s: Column): Column =
    column(CharPolyHashExpr(expression(s)))

  def contentHash(s: Column): Column =
    column(ContentHashExpr(expression(s)))

  def gopherRepetition(toks: Column): Column =
    column(GopherRepetitionExpr(expression(toks)))

  def stopwordScores(toks: Column, wordSets: Seq[Seq[String]]): Column =
    column(StopwordScoresExpr(expression(toks), wordSets))

  def planeBuckets(vn: Column, planes: Int, tables: Int, dim: Int): Column =
    column(MultiPlaneBucketsExpr(expression(vn), planes, tables, dim))

  def bpeSegmentCount(toks: Column, merges: Seq[(String, String)]): Column =
    column(BpeSegmentCountExpr(expression(toks), merges))

  def viterbiSegment(word: Column, vocab: Seq[String]): Column =
    column(ViterbiSegmentExpr(expression(word), vocab))
}

/** SessionExtensions hook: `spark.sql("SELECT graft_dot(a, b)")` etc.
  * Wire with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; for a session that
  * already exists (driver-owned, notebooks), [[GraftExtensions.register]]
  * installs the same functions imperatively. */
object GraftExtensions {
  /** Register every graft_* SQL function into an existing session —
    * the same (identifier, info, builder) triples the extensions hook
    * injects at build time, installed via the bridge into the session's
    * function registry. Idempotent: re-registration overwrites with
    * identical builders. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftColumnBridge.registerExtensionFunctions(ext, spark)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case x if x.foldable => x.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_plane_buckets"),
      new ExpressionInfo(classOf[MultiPlaneBucketsExpr].getName, "graft_plane_buckets"),
      (exprs: Seq[Expression]) => MultiPlaneBucketsExpr(exprs.head,
        intLit(exprs(1), "graft_plane_buckets", "planes"),
        intLit(exprs(2), "graft_plane_buckets", "tables"),
        intLit(exprs(3), "graft_plane_buckets", "dim"))))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_hash"),
      new ExpressionInfo(classOf[CharPolyHashExpr].getName, "graft_hash"),
      (exprs: Seq[Expression]) => CharPolyHashExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_content_hash"),
      new ExpressionInfo(classOf[ContentHashExpr].getName, "graft_content_hash"),
      (exprs: Seq[Expression]) => ContentHashExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName,
        "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        val bytes = exprs.head match {
          case x if x.foldable => x.eval() match {
            case b: Array[Byte] => b
            case other => throw new IllegalArgumentException(
              "graft_bloom_might_contain: filter must be a binary literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_bloom_might_contain: filter must be a binary literal")
        }
        BloomMightContainExpr(exprs(1), bytes)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeSegmentCountExpr].getName, "graft_bpe_count"),
      (exprs: Seq[Expression]) => {
        val pairs = exprs.drop(1).map {
          case x if x.foldable => x.eval() match {
            case s: UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"graft_bpe_count: merge entries must be string literals, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_bpe_count: merge entries must be string literals")
        }
        require(pairs.length % 2 == 0,
          "graft_bpe_count: merges come as (x, y) literal pairs")
        BpeSegmentCountExpr(exprs.head,
          pairs.grouped(2).map(p => (p(0), p(1))).toSeq)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (exprs: Seq[Expression]) =>
        MinHashAgg(exprs.head, intLit(exprs(1), "graft_minhash", "k"))))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (exprs: Seq[Expression]) =>
        TopKAgg(exprs.head, exprs(1), intLit(exprs(2), "graft_topk", "k"))))
    e.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsAgg].getName, "graft_cms"),
      (exprs: Seq[Expression]) => CmsAgg(exprs.head,
        intLit(exprs(1), "graft_cms", "d"), intLit(exprs(2), "graft_cms", "w"))))
    e.injectFunction((
      FunctionIdentifier("graft_mg"),
      new ExpressionInfo(classOf[MgAgg].getName, "graft_mg"),
      (exprs: Seq[Expression]) =>
        MgAgg(exprs.head, intLit(exprs(1), "graft_mg", "k"))))
  }
}
