package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 thirteenth wave: link prediction with ordered-fold float
  * determinism, ADT Result-chaining (the reference's sum-type discipline
  * applied to fallible pipelines), and session path analysis.
  */
object Round10m {

  private val MaxPartDf = 40

  val decls: Map[String, Decl] = Map(
    // Adamic–Adar link prediction on the co-purchase graph: for the
    // top-20 common-neighbor pairs (the graph_jaccard_neighbors pair
    // machinery, df-capped), score = Σ 1/ln(deg(z)) over shared parts z.
    // FLOAT DETERMINISM: the per-pair contributions are sorted and folded
    // in ORDER (array_sort + HOF fold here, list(... ORDER BY) +
    // list_sum there) so the sum's association order is identical in
    // both engines — no parallel-merge reduction ever touches a double.
    "graph_adamic_adar" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val edges = Tables(s, d, "orders")
          .join(Tables(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct()
        val pdeg = edges.groupBy("p").agg(count(lit(1)).as("df"))
          .filter(col("df") <= MaxPartDf && col("df") >= 2)
        val e = edges.join(pdeg, "p").repartition(n, col("p"))
          .localCheckpoint(true)
        // the weight 1/ln(df) takes ≤39 distinct values (df ∈ 2..40), so
        // the float NEVER rides the corpus: aggregate exact integer
        // (df, count) cells per pair, then fold the ≤39 terms in df
        // order — same sorted-fold determinism, none of the per-row
        // double-list collection (10.9 s → aggregate-only)
        val contrib = e.as("x")
          .join(e.as("y"),
                col("x.p") === col("y.p") && col("x.c") < col("y.c"))
          .groupBy(col("x.c").as("a"), col("y.c").as("b"), col("x.df").as("df"))
          .agg(count(lit(1)).as("cnt"))
        contrib.groupBy("a", "b")
          .agg(sum(col("cnt")).as("common"),
               array_sort(collect_list(struct(col("df"), col("cnt")))).as("cells"))
          .select(col("a"), col("b"), col("common"),
                  round(expr(
                    "aggregate(cells, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.cnt / ln(CAST(p.df AS DOUBLE)))"), 6)
                    .as("adamic_adar"))
          .orderBy(col("adamic_adar").desc, col("a"), col("b"))
          .limit(20)
      },
      Some(s"""WITH edges AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
             |               FROM orders JOIN lineitem
             |                 ON o_orderkey = l_orderkey),
             |pdeg AS (SELECT p, count(*) AS df FROM edges GROUP BY p
             |         HAVING count(*) <= $MaxPartDf AND count(*) >= 2),
             |e AS (SELECT c, edges.p, df FROM edges JOIN pdeg USING (p)),
             |contrib AS (
             |  SELECT x.c AS a, y.c AS b, x.df AS df, count(*) AS cnt
             |  FROM e x JOIN e y ON x.p = y.p AND x.c < y.c
             |  GROUP BY 1, 2, 3),
             |scored AS (
             |  SELECT a, b, sum(cnt) AS common,
             |         round(list_sum(list(cnt / ln(CAST(df AS DOUBLE))
             |                             ORDER BY df)), 6) AS adamic_adar
             |  FROM contrib GROUP BY a, b)
             |SELECT a, b, CAST(common AS BIGINT) AS common, adamic_adar
             |FROM scored
             |ORDER BY adamic_adar DESC, a, b LIMIT 20""".stripMargin)),

    // Result-chained fallible pipeline over the ADT discipline: each
    // order flows through two fallible steps — unit-price derivation
    // (fails on zero quantity-proxy) then a domain check (fails above a
    // bound) — encoded as Ok(value) | Err(stage, reason), pattern-matched
    // into an error taxonomy census plus the Ok-mean. The tag algebra is
    // the reference's sum-type semantics (SURVEY §2.10) on a pipeline
    // shape instead of a storage shape.
    "adt_result_chain" -> Decl(
      (s, d) => {
        val step1Err = col("qty") === 0L
        // `div`, never `/`: Column./ is double division and a truncated
        // double can disagree with exact integer floor at scale
        val unit = expr("cents div qty")
        val step2Err = unit > 5000000L
        Tables(s, d, "orders")
          .select(col("o_orderkey"), (col("o_orderkey") % 7L).as("qty"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
          .select(col("o_orderkey"),
                  when(step1Err, lit("Err"))
                    .when(step2Err, lit("Err")).otherwise(lit("Ok")).as("tag"),
                  when(step1Err, lit("div_zero"))
                    .when(step2Err, lit("domain_bound")).as("reason"),
                  when(!step1Err && !step2Err, unit).as("unit_cents"))
          .groupBy("tag", "reason")
          .agg(count(lit(1)).as("n"),
               sum(col("unit_cents")).as("ok_cents_sum"))
          .orderBy(col("tag"), col("reason"))
      },
      Some("""WITH r AS (
             |  SELECT o_orderkey,
             |         o_orderkey % 7 AS qty,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |t AS (SELECT o_orderkey,
             |        CASE WHEN qty = 0 THEN 'Err'
             |             WHEN cents // qty > 5000000 THEN 'Err'
             |             ELSE 'Ok' END AS tag,
             |        CASE WHEN qty = 0 THEN 'div_zero'
             |             WHEN cents // qty > 5000000 THEN 'domain_bound' END AS reason,
             |        CASE WHEN qty <> 0 AND cents // qty <= 5000000
             |             THEN cents // qty END AS unit_cents
             |      FROM r)
             |SELECT tag, reason, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(unit_cents) AS BIGINT) AS ok_cents_sum
             |FROM t GROUP BY tag, reason
             |ORDER BY tag, reason""".stripMargin)),

    // Session path analysis: per 10-minute-gap session, the ordered
    // event-type trail (capped at 8 hops) — the product-analytics "what
    // do users actually do" query. The trail is assembled from a SORTED
    // collect (struct sort by (us, event_id)) so both engines emit the
    // identical string; sessions reuse the gaps-and-islands machinery.
    "ts_session_path" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
        val brk = when(col("us") - lag(col("us"), 1).over(w) > 600000000L, 1L)
          .otherwise(0L)
        val sess = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
          .withColumn("sid",
            sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy("user_id", "sid")
          .agg(count(lit(1)).as("depth"),
               array_join(slice(expr(
                 "transform(array_sort(collect_list(struct(us, event_id, event_type))), p -> p.event_type)"),
                 1, 8), "->").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_sessions"), max(col("depth")).as("max_depth"))
          .filter(col("n_sessions") >= 2)
          .orderBy("path")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             CAST(epoch_us(ts) AS BIGINT) AS us
             |           FROM events),
             |m AS (SELECT user_id, event_id, event_type, us,
             |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id
             |               ORDER BY us, event_id) > 600000000
             |             THEN 1 ELSE 0 END AS brk
             |      FROM e),
             |s AS (SELECT user_id, event_id, event_type, us,
             |        sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m),
             |paths AS (SELECT user_id, sid, count(*) AS depth,
             |            array_to_string(list(event_type ORDER BY us, event_id)[1:8],
             |                            '->') AS path
             |          FROM s GROUP BY 1, 2)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(max(depth) AS BIGINT) AS max_depth
             |FROM paths GROUP BY path HAVING count(*) >= 2
             |ORDER BY path""".stripMargin))
  )
}
