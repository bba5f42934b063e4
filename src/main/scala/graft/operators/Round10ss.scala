package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 49: sequence-pattern analytics (the MATCH_RECOGNIZE-
  * shaped regex funnel over per-user event strings) and nested-struct
  * field surgery (withField/dropFields — the schema-evolution API for
  * struct columns).
  *
  * Scale shape: the pattern keys build one ordered event string per
  * user — per-key state is bounded by a user's own activity (the
  * ts_session_path class), gathered by a single map-side-combined
  * collect_list; no window ever spans users, and the regex match is
  * per-row codegen'd work. The struct key is a pure projection.
  *
  * Determinism: event initials are unique per type (click/error/
  * purchase/signup/view → c,e,p,s,v), order is (epoch micros, event_id)
  * — a total key — and both engines run the same anchored-free regex
  * find semantics (Java regex and RE2 agree on this alternation-free
  * fragment).
  */
object Round10ss {

  val decls: Map[String, Decl] = Map(
    // Regex funnel per user over the complete ordered event-type string:
    // strict = a contiguous view→clicks→purchase run ('vc+p'), subseq =
    // the lazy anywhere-order funnel ('v.*c.*p'). This is the
    // MATCH_RECOGNIZE workload expressed Spark-first: sequences built by
    // one aggregate, pattern evaluated as a scalar — not a per-row NFA
    // operator the optimizer can't see through.
    "ts_pattern_match_regex" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
               expr("array_join(transform(array_sort(collect_list(" +
                    "struct(us, event_id, event_type))), " +
                    "p -> substring(p.event_type, 1, 1)), '')").as("seq"))
          .select(col("user_id"), col("n_events"), col("seq"),
                  when(col("seq").rlike("vc+p"), 1L).otherwise(0L).as("strict"),
                  when(col("seq").rlike("v.*c.*p"), 1L).otherwise(0L).as("subseq"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       string_agg(substring(event_type, 1, 1), ''
             |                  ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
             |         AS seq,
             |       CAST(CASE WHEN regexp_matches(
             |              string_agg(substring(event_type, 1, 1), ''
             |                ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id),
             |              'vc+p') THEN 1 ELSE 0 END AS BIGINT) AS strict,
             |       CAST(CASE WHEN regexp_matches(
             |              string_agg(substring(event_type, 1, 1), ''
             |                ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id),
             |              'v.*c.*p') THEN 1 ELSE 0 END AS BIGINT) AS subseq
             |FROM events
             |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin)),

    // The funnel report on top of the same sequences: population counts
    // and exact-integer ppm rates (half-up integer div, the repo's
    // terminal-rounding discipline for rates).
    "ts_funnel_regex_rates" -> Decl(
      (s, d) => {
        val seqs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
          .groupBy("user_id")
          .agg(expr("array_join(transform(array_sort(collect_list(" +
                    "struct(us, event_id, event_type))), " +
                    "p -> substring(p.event_type, 1, 1)), '')").as("seq"))
        seqs.agg(
            count(lit(1)).as("n_users"),
            sum(when(col("seq").rlike("vc+p"), 1L).otherwise(0L)).as("n_strict"),
            sum(when(col("seq").rlike("v.*c.*p"), 1L).otherwise(0L)).as("n_subseq"))
          .select(col("n_users"), col("n_strict"), col("n_subseq"),
                  expr("(n_strict * 2000000L + n_users) div (2L * n_users)")
                    .as("strict_ppm"),
                  expr("(n_subseq * 2000000L + n_users) div (2L * n_users)")
                    .as("subseq_ppm"))
      },
      Some("""WITH seqs AS (
             |  SELECT string_agg(substring(event_type, 1, 1), ''
             |           ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS seq
             |  FROM events GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(CASE WHEN regexp_matches(seq, 'vc+p')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_strict,
             |       CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c.*p')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_subseq,
             |       CAST((sum(CASE WHEN regexp_matches(seq, 'vc+p')
             |                      THEN 1 ELSE 0 END) * 2000000 + count(*))
             |            // (2 * count(*)) AS BIGINT) AS strict_ppm,
             |       CAST((sum(CASE WHEN regexp_matches(seq, 'v.*c.*p')
             |                      THEN 1 ELSE 0 END) * 2000000 + count(*))
             |            // (2 * count(*)) AS BIGINT) AS subseq_ppm
             |FROM seqs""".stripMargin)),

    // Nested-struct field surgery: build a struct column, then evolve it
    // in place — withField ADDS a derived cents field, dropFields REMOVES
    // the float it replaced (the nested schema-evolution idiom for deeply
    // structured telemetry, where re-building the whole struct by hand
    // is the bug-prone alternative). The evolved struct's fields are
    // flattened for the output (nested values are hash-fragile across
    // engines; the spec asserts the intermediate struct schema).
    "scalar_struct_fields" -> Decl(
      (s, d) => {
        val evolved = Tables.events(s, d)
          .select(col("event_id"),
                  struct(col("event_type").as("et"),
                         col("value").as("v"),
                         col("user_id").as("uid")).as("payload"))
          .withColumn("payload",
            col("payload")
              .withField("v_cents",
                         round(col("payload.v") * 100).cast("bigint"))
              .dropFields("v"))
        Tables.canon(
          evolved.select(col("event_id"),
                         col("payload.et").as("et"),
                         col("payload.uid").as("uid"),
                         col("payload.v_cents").as("v_cents")))
      },
      Some("""SELECT event_id, event_type AS et, user_id AS uid,
             |       CAST(round(value * 100) AS BIGINT) AS v_cents
             |FROM events ORDER BY ALL NULLS FIRST""".stripMargin))
  )
}
