package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.ADT
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass word-n-gram repetition statistics for the Gopher quality
  * filters' repetition half (Rae et al. 2021, "Scaling Language Models",
  * appendix A1.1, second rule block): per document,
  *
  *  - for n = 2..4, the occurrence count and character length (token
  *    characters, separators excluded) of the MOST FREQUENT word n-gram
  *    (ties broken by the codepoint-lexicographically smallest n-gram —
  *    DuckDB's binary string order, so the oracle replays the tie), and
  *  - for n = 5..10, the characters covered by DUPLICATED n-grams: the sum
  *    of token lengths over token positions lying inside at least one
  *    occurrence of an n-gram that occurs ≥ 2 times — a positional UNION,
  *    so overlapping duplicate n-grams never double-count a character
  *    (the faithful "fraction of characters contained within" reading of
  *    the paper, not the sum-over-n-grams approximation),
  *
  * plus the total token character count as the shared denominator.
  *
  * Output layout (array<long>, 13 slots):
  * `[top2_cnt, top2_chars, top3_cnt, top3_chars, top4_cnt, top4_chars,
  *   dup5_chars, dup6_chars, dup7_chars, dup8_chars, dup9_chars,
  *   dup10_chars, total_chars]` — a slot is 0 when the document has fewer
  * than n tokens.
  *
  * Why an expression and not a relational plan: the signals are per-row
  * fixed points of the token array — computing them relationally would
  * explode every document into 9 n-gram tables and shuffle each on
  * (doc, n-gram). As a codegen'd expression the whole rule family rides
  * the scan map-only at any corpus size, O(Σ_n tokens) per document with
  * one token-array materialization. The DuckDB oracle takes exactly that
  * relational form (explode → count → position union), which makes the
  * cross-check non-circular.
  */
case class GopherRepetitionExpr(toks: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = toks
  override def inputTypes: Seq[ADT] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gopher_repetition"

  override def nullSafeEval(input: Any): Any =
    GopherRepetitionExpr.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.GopherRepetitionExpr.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(toks = newChild)
}

object GopherRepetitionExpr {

  /** Codepoint-lexicographic comparison (== UTF-8 binary order, DuckDB's
    * default collation); Java String.compareTo is UTF-16 code-unit order,
    * which disagrees for supplementary characters. */
  private def cpLess(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** Called from generated code. See the class doc for the slot layout. */
  def stats(toksData: ArrayData): ArrayData = {
    val n = toksData.numElements()
    val toks = new Array[String](n)
    val lens = new Array[Int](n)
    var tot = 0L
    var i = 0
    while (i < n) {
      val u = toksData.getUTF8String(i)
      val s = if (u == null) "" else u.toString
      toks(i) = s
      lens(i) = s.codePointCount(0, s.length)
      tot += lens(i)
      i += 1
    }
    val out = new Array[Long](13)
    out(12) = tot
    var g = 2
    while (g <= 10) {
      if (n >= g) {
        val m = n - g + 1
        // n-gram keys once per position (space-joined; tokens are
        // whitespace-split so the separator is unambiguous)
        val keys = new Array[String](m)
        val counts = new java.util.HashMap[String, Integer](m * 2)
        i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder(lens(i) + 8 * g)
          var j = i
          while (j < i + g) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          val k = sb.toString
          keys(i) = k
          counts.merge(k, 1, (a, b) => a + b)
          i += 1
        }
        if (g <= 4) {
          // most frequent n-gram; ties → codepoint-smallest key
          var bestKey: String = null
          var bestCnt = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.intValue()
            if (c > bestCnt || (c == bestCnt && cpLess(e.getKey, bestKey)))
              { bestKey = e.getKey; bestCnt = c }
          }
          out((g - 2) * 2) = bestCnt.toLong
          // token chars of the n-gram = joined length − (g−1) separators
          out((g - 2) * 2 + 1) =
            (bestKey.codePointCount(0, bestKey.length) - (g - 1)).toLong
        } else {
          // positional union of duplicated n-grams' token coverage
          val covered = new Array[Boolean](n)
          i = 0
          while (i < m) {
            if (counts.get(keys(i)).intValue() >= 2) {
              var j = i
              while (j < i + g) { covered(j) = true; j += 1 }
            }
            i += 1
          }
          var s = 0L
          i = 0
          while (i < n) { if (covered(i)) s += lens(i); i += 1 }
          out(g + 1) = s
        }
      }
      g += 1
    }
    ArrayData.toArrayData(out)
  }
}
