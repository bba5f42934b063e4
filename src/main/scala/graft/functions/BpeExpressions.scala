package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding token counting — the number every training-data
  * pipeline actually budgets by (the regex run-length proxy in
  * `text_token_count` approximates it; this is the algorithm).
  *
  * The tokenizer is the standard BPE ENCODER: split a word into character
  * symbols, then apply a ranked merge list in order — each merge is one
  * left-to-right non-overlapping pass replacing the adjacent symbol pair
  * `(a, b)` with `ab`. A single pass per rank is exact because a merge's
  * operands can only be produced by LOWER-ranked merges (the vocab is
  * well-formed by construction), so no earlier rank ever becomes
  * applicable again. Token count = surviving symbols, summed over
  * whitespace words.
  *
  * [[BpeOps.Merges]] is the ranked merge list a real pipeline would load
  * from its tokenizer's vocab file — here a compile-time constant learned
  * offline over the corpus vocabulary (greedy most-frequent-pair,
  * lexicographic tie-break — fully deterministic, so the list is
  * reproducible from the data). The same list generates the DuckDB oracle:
  * wrap each symbol as `(sym)` and the rank-k merge is literally
  * `replace(s, '(a)(b)', '(ab)')` — string replace IS the left-to-right
  * non-overlapping pass, so the SQL chain is the identical algorithm and
  * the driver hash-compares the two engines exactly.
  *
  * Per-row fold, no shuffle, no UDF: the count is a scan-speed projection
  * (the TokenCounts / SketchOps pattern), codegen'd via a reference-object
  * call like every sketch expression here.
  */
object BpeOps {

  /** Ranked BPE merges (rank = position). Learned offline over the corpus
    * word distribution with deterministic tie-breaks; stands in for the
    * tokenizer vocab file of a real pipeline. */
  val Merges: IndexedSeq[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"))

  /** BPE token count of one word (no whitespace inside). Empty → 0.
    *
    * Symbols are CODEPOINTS, not UTF-16 units — DuckDB's
    * `string_split(w, '')` splits codepoints, so a non-BMP char must count
    * as ONE symbol in both engines. `'('` and `')'` are reserved by the
    * oracle's paren-wrapped encoding and stripped identically here (they
    * never appear inside a merge symbol, so stripping cannot change any
    * merge outcome). */
  def countWord(w: String): Int = {
    if (w.isEmpty) return 0
    val cps = w.codePoints().filter(cp => cp != '(' && cp != ')').toArray
    if (cps.isEmpty) return 0
    val syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    var len = cps.length
    var m = 0
    while (m < Merges.length && len > 1) {
      val (a, b) = Merges(m)
      // one left-to-right non-overlapping merge pass for this rank
      var r = 0
      var wr = 0
      while (r < len) {
        if (r < len - 1 && syms(r) == a && syms(r + 1) == b) {
          syms(wr) = a + b; r += 2
        } else {
          syms(wr) = syms(r); r += 1
        }
        wr += 1
      }
      len = wr
      m += 1
    }
    len
  }

  /** Total BPE token count of a text: sum of countWord over the
    * space-separated words (empty splits contribute 0). */
  def countText(t: UTF8String): Int = {
    val s = t.toString
    var total = 0
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += countWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  def bpeTokenCount(text: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text)))

  /** The DuckDB mirror of [[countText]], generated from the SAME merge
    * list: per word, strip the wrapper-reserved `(` `)` (mirroring
    * [[countWord]]), wrap each remaining codepoint as `(c)`, apply the
    * ranked replace chain, and count surviving `(` markers. The empty
    * guard covers words that were ONLY parens (the bare encoding of ''
    * would be '()', which counts 1). */
  def duckdbCountExpr(wordVar: String): String = {
    val stripped = s"replace(replace($wordVar, '(', ''), ')', '')"
    val enc = s"'(' || array_to_string(string_split($stripped, ''), ')(') || ')'"
    val chain = Merges.foldLeft(enc) { case (acc, (a, b)) =>
      s"replace($acc, '($a)($b)', '($a$b)')"
    }
    s"CASE WHEN len($stripped) = 0 THEN 0 ELSE len($chain) - len(replace($chain, '(', '')) END"
  }
}

/** `INT`: total BPE token count of `child: STRING` under
  * [[BpeOps.Merges]]. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got $other")
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BpeOps.countText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.countText($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
