package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sketch expressions for the dedup pipelines.
  *
  * The round-1..4 formulations computed document signatures RELATIONALLY:
  * explode the tokens/shingles to one row each, shuffle them, and fold the
  * signature back per doc_id with aggregate functions. That shape shuffles
  * millions of scalar rows to compute what is fundamentally a per-document
  * fold — a signature only ever depends on ONE row's token array. These
  * expressions do the fold inside the row (one compiled loop, no explode,
  * no shuffle, no aggregation state): at 100 TB the signature stage becomes
  * a pure scan-speed projection, embarrassingly parallel, and the only
  * shuffles left in a dedup pipeline are the banded candidate join and the
  * candidate verify — both bounded by LSH collisions, not corpus size.
  * Measured at sf0.1: the minhash signature stage dropped from ~96
  * executor-CPU-seconds (3M exploded rows × 32 min-aggregates) to <1.
  *
  * Hash parity: every hash here reproduces Spark's own `xxhash64(...)`
  * expression bit-for-bit (same `XXH64` primitives, same seed-42 fold), so
  * signatures, band keys, and therefore candidate sets and recall are
  * IDENTICAL to the relational formulation they replace — asserted
  * per-element against the `xxhash64` column in OperatorSpec.
  */
object SketchOps {
  /** Sorted-distinct 64-bit shingle-hash set of a token array (the
    * `explode(shingles) → xxhash64 → distinct` pipeline, per row).
    */
  def shingleHashes(toks: Column, n: Int): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(toks), n))

  /** 32-element MinHash signature of a shingle-hash set. */
  def minhashSig(hs: Column): Column =
    Bridge.column(MinHashSig(Bridge.expression(hs)))

  /** 64-bit SimHash signature of a token array. */
  def simhashSig(toks: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(toks)))

  /** Shannon entropy (nats) of the per-character distribution of a string. */
  def charEntropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))

  /** Membership probe against a pre-built Bloom sketch. */
  def bloomMightContain(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))

  /** Per-row term-frequency table (term-sorted ARRAY<STRUCT<term,cnt>>). */
  def tokenCounts(toks: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(toks)))

  /** |a ∩ b| of two SORTED-DISTINCT ARRAY<LONG> columns (the
    * `ShingleHashSet` output contract) — the allocation-free merge-count
    * replacement for `size(array_intersect(a, b))` in the dedup verify
    * joins. Equal by construction on sorted-unique inputs (asserted
    * against `size(array_intersect(...))` in SketchParitySpec).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** Null elements are legal in any SQL-supplied array (split()'s declared
    * element type is nullable); every sketch here skips them, matching the
    * relational explode form where a null token/hash row falls out of the
    * aggregate. Returns the input untouched when it has no nulls — the
    * common case pays one scan, no copy.
    */
  private[functions] def dropNullElements(v: ArrayData, et: DataType): ArrayData = {
    val m = v.numElements()
    var nulls = 0
    var i = 0
    while (i < m) { if (v.isNullAt(i)) nulls += 1; i += 1 }
    if (nulls == 0) return v
    val out = new Array[Any](m - nulls)
    var w = 0
    i = 0
    while (i < m) {
      if (!v.isNullAt(i)) { out(w) = v.get(i, et); w += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `ARRAY<LONG>`: the sorted DISTINCT `xxhash64` values of the space-joined
  * word n-grams of `child: ARRAY<STRING>`. Fewer than n tokens → empty
  * array (the generator formulation yields no rows there).
  */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(v0: ArrayData): ArrayData = {
    // SQL-exposed: the input array may carry null elements (split()'s
    // declared type allows them even though it never produces one). Skip
    // them — the generator formulation's null token hashes to a null row
    // the downstream distinct/aggregate drops.
    val v = SketchOps.dropNullElements(v0, StringType)
    val m = v.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = v.getUTF8String(i + k); k += 1 }
      // same bytes as the WordShingles row, same seed-42 hash as xxhash64()
      hs(i) = XXH64.hashUTF8String(UTF8String.concatWs(space, parts: _*), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w + 1))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashSet", this, classOf[ShingleHashSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BIGINT`: |a ∩ b| of two SORTED-DISTINCT `ARRAY<LONG>` columns via a
  * single merge pass — no per-row hash set, no intersection-array
  * allocation (what `size(array_intersect(a, b))` pays per candidate pair
  * in the dedup verify joins: measured ~2× the whole verify stage's CPU
  * at sf0.1). PRECONDITION: both inputs ascending-sorted and duplicate-free
  * — exactly the `ShingleHashSet` output contract (it sorts and dedups);
  * on such inputs the merge count equals `size(array_intersect)`
  * (asserted in SketchParitySpec). Not safe for arbitrary arrays.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType

  // An actual NULL element must fail loudly, never silently read as 0 and
  // diverge from size(array_intersect). The check is emitted ONLY for
  // inputs whose type allows null elements (parquet round-trips of
  // ShingleHashSet output widen containsNull to true; direct expression
  // output keeps false and pays nothing).
  private def leftNullable = left.dataType.asInstanceOf[ArrayType].containsNull
  private def rightNullable = right.dataType.asInstanceOf[ArrayType].containsNull
  private def nullElem(): Nothing = throw new IllegalArgumentException(
    "sorted_intersect_count: null array element — inputs must be the " +
      "non-null sorted-distinct sets ShingleHashSet produces")
  // codegen helper (reached via the reference object below)
  def failNullElem(): Long = nullElem()

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0L
    while (i < na && j < nb) {
      if ((leftNullable && a.isNullAt(i)) || (rightNullable && b.isNullAt(j)))
        nullElem()
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { cnt += 1L; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt")
      val guard =
        if (!leftNullable && !rightNullable) ""
        else {
          val ref = ctx.addReferenceObj("slic", this,
            classOf[SortedLongIntersectCount].getName)
          val lchk = if (leftNullable) s"$a.isNullAt($i)" else "false"
          val rchk = if (rightNullable) s"$b.isNullAt($j)" else "false"
          s"if ($lchk || $rchk) { $ref.failNullElem(); }"
        }
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $j < $nb) {
         |  $guard
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; } else if ($x > $y) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `ARRAY<LONG>` of 32 MinHash minima over `child: ARRAY<LONG>` (the
  * shingle-hash set): element i is `min over h of xxhash64(i, h)` — the
  * same two-child seed-42 fold as the `min(xxhash64(lit(i), col("h")))`
  * aggregate it replaces, with the int-literal prefix hash precomputed.
  *
  * An EMPTY hash set (after null elements are skipped) yields NULL, not
  * the sentinel minima: the relational form emits no row for a sub-n-token
  * doc, and two such docs must not band-collide as perfect near-dups
  * through the SQL-exposed `minhash_sig`.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  import MinHashSig.NumHashes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  def compute(v: ArrayData): Any = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val m = v.numElements()
    var seen = false
    var j = 0
    while (j < m) {
      if (!v.isNullAt(j)) {
        seen = true
        val h = v.getLong(j)
        var i = 0
        while (i < NumHashes) {
          val hv = XXH64.hashLong(h, MinHashSig.seeds(i))
          if (hv < mins(i)) mins(i) = hv
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    // freshName: a fixed-name local would collide when two instances of
    // this expression compile into one whole-stage function (non-nullable
    // children inline the snippet without a brace scope)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val NumHashes = 32
  // xxhash64(lit(i), col(h)) folds seed 42 through the INT literal first;
  // that prefix is constant per i.
  private val seeds: Array[Long] =
    Array.tabulate(NumHashes)(i => XXH64.hashInt(i, 42L))
}

/** 64-bit SimHash of `child: ARRAY<STRING>` tokens: per token the seed-42
  * `xxhash64` string hash votes its bits; bit i of the result is set iff
  * MORE tokens set it than clear it (ties clear) — identical to
  * `SimHashAgg` over the exploded token rows.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<string>, got $other")
  }
  override def dataType: DataType = LongType

  def compute(v0: ArrayData): Long = {
    // skip null tokens (and exclude them from the majority denominator),
    // matching the exploded SimHashAgg form where a null token row's null
    // hash drops out of the vote
    val v = SketchOps.dropNullElements(v0, StringType)
    val counts = new Array[Int](64)
    val m = v.numElements()
    var j = 0
    while (j < m) {
      val h = XXH64.hashUTF8String(v.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) { counts(i) += ((h >>> i) & 1L).toInt; i += 1 }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) * 2 > m) sig |= 1L << i; i += 1 }
    sig
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashSig", this, classOf[SimHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ARRAY<STRUCT<term STRING, cnt INT>>`: the term-frequency table of
  * `child: ARRAY<STRING>` computed inside the row (sort the tokens in
  * binary UTF-8 order, run-length encode) — the per-row form of
  * `explode(toks) → groupBy(doc, term) → count`, with identical counts.
  * Entries are term-sorted, so the array itself is deterministic.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts expects array<string>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)

  def compute(v0: ArrayData): ArrayData = {
    // null tokens would NPE the natural-order sort; skip them like the
    // explode form, whose null term rows fall out of the groupBy count
    val v = SketchOps.dropNullElements(v0, StringType)
    val m = v.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = v.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[UTF8String]())
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && toks(j) == toks(i)) j += 1
      out.add(org.apache.spark.sql.catalyst.InternalRow(toks(i), j - i))
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCounts", this, classOf[TokenCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BOOLEAN`: membership probe of `child: STRING` against a pre-built
  * Bloom filter (`org.apache.spark.util.sketch.BloomFilter`, the public
  * sketch `DataFrame.stat.bloomFilter` returns). The filter rides the
  * expression as a codegen reference object — the same mechanism Spark's
  * own runtime-filter `BloomFilterMightContain` uses — so the probe stays
  * inside whole-stage codegen and the scan it guards. Probes the string's
  * UTF-8 bytes, matching how the builder side hashes string columns.
  */
case class BloomMightContain(child: Expression,
                             bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  def compute(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shannon entropy (nats, DOUBLE) of the per-character distribution of
  * `child: STRING` — the per-row form of the
  * `explode(split(text, '')) → count per (doc, ch) → -Σ (c/n)·ln(c/n)`
  * pipeline. Characters are UTF-16 units, exactly like Spark's
  * `split(text, "")` (identical for all BMP text, which is all the split
  * formulation itself handles). NULL for the empty string — the relational
  * form emits no group there, so the row must drop, not read 0.0.
  *
  * Term order is fixed (sorted by character), and every term is the same
  * `(c/n)·Math.log(c/n)` double the relational form computes; the ≤1-ulp
  * summation-order difference vanishes at the query's 6-dp round.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(s: UTF8String): Double = {
    val chars = s.toString.toCharArray
    java.util.Arrays.sort(chars)
    val n = chars.length.toDouble
    var acc = 0.0
    var i = 0
    while (i < chars.length) {
      var j = i + 1
      while (j < chars.length && chars(j) == chars(i)) j += 1
      val p = (j - i) / n
      acc += p * math.log(p)
      i = j
    }
    // single-character-class input: keep +0.0 (a negated 0.0 sum would
    // hash-diverge from the relational/DuckDB form's plain 0.0)
    if (acc == 0.0) 0.0 else -acc
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes() == 0) null else compute(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numBytes() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.compute($c);
         |}
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
