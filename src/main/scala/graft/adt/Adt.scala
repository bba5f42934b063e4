package graft.adt

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Algebraic data types (sum types) as first-class column values — the
  * reference's defining feature, re-based on Spark's columnar model.
  *
  * Encoding (SURVEY §1.2): `STRUCT(tag STRING, <one nullable struct per
  * variant>)`. Constructors, predicates and pattern matches are pure
  * `Column` combinators over built-in expressions (`struct`/`when`), so ADT
  * queries stay fully inside Catalyst optimization and whole-stage codegen —
  * there is no interpreter, no UDF, and the encoding is columnar at rest
  * (parquet nested groups) exactly like any other struct column.
  *
  * A variant with no payload carries a single `present BOOLEAN` field so the
  * struct stays non-empty (parquet forbids empty groups).
  */
object Adt {

  /** A variant definition: constructor tag + named payload expressions. */
  final case class Variant(tag: String, payload: Seq[(String, Column)]) {
    private[adt] def field: String = tag.toLowerCase
    private[adt] def payloadStruct: Column =
      if (payload.isEmpty) struct(lit(true).as("present"))
      else struct(payload.map { case (n, c) => c.as(n) }: _*)
  }

  def variant(tag: String)(payload: (String, Column)*): Variant =
    Variant(tag, payload)

  /** Construct an ADT column from `(condition, variant)` cases; the first
    * matching condition wins (rows matching no case get a null tag).
    */
  def construct(cases: (Column, Variant)*): Column = {
    val tags = cases.map(_._2.tag)
    require(tags.distinct == tags, s"duplicate variant tags: $tags")
    val tagCol = cases.foldRight(lit(null).cast("string")) {
      case ((cond, v), acc) => when(cond, lit(v.tag)).otherwise(acc)
    }
    // A variant's payload is populated only when that variant WINS (its
    // condition holds and no earlier case matched) — with overlapping
    // conditions, gating on the raw condition alone would fill a losing
    // variant's payload and break payload()'s null-unless-is() contract.
    val payloads = cases.zipWithIndex.map { case ((cond, v), i) =>
      val wins = cases.take(i).map(_._1).foldLeft(cond)((c, earlier) => c && !earlier)
      when(wins, v.payloadStruct).as(v.field)
    }
    struct(tagCol.as("tag") +: payloads: _*)
  }

  def tagOf(adt: Column): Column = adt.getField("tag")

  /** Predicate: does the value carry this variant? */
  def is(adt: Column, tag: String): Column = tagOf(adt) === tag

  /** The payload struct of one variant (null unless `is(adt, tag)`). */
  def payload(adt: Column, tag: String): Column = adt.getField(tag.toLowerCase)

  /** Pattern match: one `(tag, payload => result)` arm per variant.
    * Non-exhaustive matches yield null (callers can append a default arm
    * keyed to any remaining tag). Compiles to a single CASE chain.
    */
  def matchOn(adt: Column)(arms: (String, Column => Column)*): Column = {
    require(arms.nonEmpty, "matchOn needs at least one arm")
    val (t0, f0) = arms.head
    arms.tail.foldLeft(when(is(adt, t0), f0(payload(adt, t0)))) {
      case (acc, (t, f)) => acc.when(is(adt, t), f(payload(adt, t)))
    }
  }
}
