package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity / normalization expressions for the
  * entity-resolution and corpus-cleanup paths. Both are ordinary
  * codegen'd scalar expressions — they ride whole-stage codegen inside
  * the scan projection, so a 100 TB fuzzy-match or cleanup pass costs
  * one function call per row with no UDF serialization boundary.
  *
  *  - [[JaroWinklerSim]]: the standard Jaro similarity (half-width
  *    match window, transpositions halved) with the Winkler common-
  *    prefix boost (p = 0.1, prefix capped at 4, boost only above the
  *    classical 0.7 threshold) — semantics chosen to mirror DuckDB's
  *    `jaro_winkler_similarity`, which the oracle leans on directly.
  *  - [[NfcClean]]: strip the invisible code points that plague scraped
  *    training text (ZWSP/ZWNJ/ZWJ/BOM) and compose the remainder to
  *    Unicode NFC via `java.text.Normalizer` — the canonical pre-
  *    tokenization cleanup step; DuckDB mirrors with `nfc_normalize`
  *    after the same strips.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.jw(l.asInstanceOf[UTF8String].toString,
                      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinklerSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.jw($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerSim {
  /** Jaro-Winkler similarity in [0, 1]; p = 0.1, prefix ≤ 4, boost
    * applied only when the Jaro score exceeds 0.7.
    */
  def jw(s: String, t: String): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - trans / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n, m)) &&
           s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class NfcClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_clean expects string, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(NfcClean.clean(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcClean.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$cls.clean($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_clean"
}

object NfcClean {
  /** Drop ZWSP/ZWNJ/ZWJ/BOM, then compose to NFC. The strip runs first
    * so a zero-width joiner can never block a composition the cleaned
    * text should have.
    */
  def clean(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\u200B' && c != '\u200C' && c != '\u200D' && c != '\uFEFF')
        sb.append(c)
      i += 1
    }
    java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
  }
}

/** Column-DSL face of the string expressions. */
object StringSimilarity {
  private def bridge = org.apache.spark.sql.graft.Bridge

  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerSim(bridge.expression(a), bridge.expression(b)))

  def nfcClean(s: Column): Column =
    bridge.column(NfcClean(bridge.expression(s)))
}
