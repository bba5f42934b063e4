package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the standard remedy when a shuffle join's key
  * distribution has hot keys (a handful of values carrying most rows), so
  * hash-partitioning on the key alone would pile those rows onto a few
  * straggler tasks. The fact side is salted into `salts` deterministic
  * subkeys; the (smaller, but not broadcastable) dim side is replicated
  * once per salt; the join runs on `(keys…, salt)` and therefore spreads
  * each hot key over `salts` partitions.
  *
  * When to reach for this instead of the alternatives:
  *  - dim fits in executor memory → just `broadcast(dim)`; no salt needed.
  *  - skew is runtime-surprising → AQE's skew-join split handles it.
  *  - skew is STRUCTURAL (a key column with few values, known at authoring
  *    time — e.g. an event-type or language code on a fact table), dim too
  *    big to broadcast → this operator: the plan is skew-proof by
  *    construction, not dependent on runtime stats, and the replication
  *    cost is exactly `salts × |dim|` rows.
  */
object Salted {

  /** Join `fact` to `dim` on `keys`, spreading each key over `salts`
    * subkeys. Supported join types: inner, left, left_semi, left_anti —
    * the fact side keeps exactly one salt per row, so fact-preserving
    * semantics are unchanged; dim-preserving types (right/full) would see
    * the replicated dim and are rejected.
    *
    * The salt is `pmod(hash(every fact column), salts)` — deterministic
    * for a given row (re-runs and retried tasks salt identically, which a
    * `rand()` salt would not guarantee), uniform because `hash` mixes all
    * columns, and never null (`hash` is null-tolerant).
    */
  def join(fact: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int,
           joinType: String = "inner"): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
              .contains(joinType.toLowerCase.replace("_", "")),
      s"salted join preserves the fact side only; joinType '$joinType' would " +
      "duplicate dim-preserved rows across salts (use broadcast or AQE skew handling)")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    // hash every hashable fact column for per-row spread (hashing only the
    // join keys would give one salt per key — no spread at all); MapType is
    // the one type Spark's hash rejects, and it cannot carry the key anyway
    val hashable = fact.schema.fields.filterNot(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(f => col(f.name))
    require(hashable.nonEmpty, "fact table has no hashable (non-map) columns to salt on")
    val saltedFact = fact.withColumn(
      "__salt", pmod(hash(hashable.toIndexedSeq: _*), lit(salts)))
    // one dim copy per salt; hint MERGE so the planner keeps the shuffle
    // join this operator exists to de-skew (auto-broadcast of a small test
    // dim would silently hide the salted shape being demonstrated)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .hint("merge")
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }

  val decls: Map[String, Decl] = Map(
    // Enrich each event with its type's aggregate stats. event_type has 5
    // values — a shuffle join on it alone lands everything on 5 of the
    // cluster's partitions no matter how many executors exist; salting by
    // 8 fans each hot key over 8 partitions (ScaleSpec asserts the salt is
    // in the physical join key). The dim here is groupBy-derived (tiny at
    // test scale) purely so the query is self-contained and oracled; the
    // operator targets dims too big to broadcast.
    "join_salted_skew" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
        val typeStats = ev.groupBy("event_type").agg(
          count(lit(1)).as("type_n"),
          round(avg(col("value")), 4).as("type_avg"))
        Tables.canon(
          join(ev.select("event_id", "event_type", "value"), typeStats,
               Seq("event_type"), salts = 8)
            .select(col("event_id"), col("event_type"), col("type_n"),
                    col("type_avg"),
                    round(col("value") - col("type_avg"), 4).as("dev")))
      },
      Some("""SELECT e.event_id, e.event_type, t.type_n, t.type_avg,
             |round(e.value - t.type_avg, 4) AS dev
             |FROM events e
             |JOIN (SELECT event_type, count(*) AS type_n,
             |             round(avg(value), 4) AS type_avg
             |      FROM events GROUP BY event_type) t
             |USING (event_type)
             |ORDER BY ALL NULLS FIRST""".stripMargin)))
}
