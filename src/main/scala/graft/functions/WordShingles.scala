package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle generator (UDTF surface, SURVEY §2.12): expands a
  * token array into its space-joined n-gram rows — the row-expander under
  * MinHash and n-gram-Jaccard dedup.
  *
  * Why a custom `Generator` and not the HOF formulation
  * (`explode(transform(sequence(...), i -> concat_ws(...)))`,
  * `TextOps.shingles`): Spark evaluates higher-order-function lambdas
  * through an interpreted closure per element and materializes the full
  * shingle array per row before explode — on the dedup corpus this is the
  * single hottest stage. The generator emits rows directly from one
  * compiled loop over the ArrayData, no intermediate array, no interpreted
  * lambda, and `UTF8String.concatWs` never round-trips through
  * java.lang.String. Row-for-row equivalent to the HOF formulation
  * (property-tested in OperatorSpec): docs shorter than n yield no rows,
  * null input yields no rows.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    if (m < n) return Nil
    val out = new Array[InternalRow](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      out(i) = InternalRow(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
