package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-10 sixteenth wave: SLA attainment, embedding-cluster cohesion,
  * and temporal referential integrity. Integer ppm ratios by floor
  * division; float cosines rounded per-term then folded in sorted order.
  */
object Round10p {

  val decls: Map[String, Decl] = Map(
    // SLA attainment: share of orders whose FIRST shipment lands within
    // the priority's SLA window — the operations KPI. Exact day
    // arithmetic, attainment as integer ppm floor division.
    "ts_sla_attainment" -> Decl(
      (s, d) => {
        val sla = when(col("o_orderpriority") === "1-URGENT", 7L)
          .when(col("o_orderpriority") === "2-HIGH", 14L)
          .when(col("o_orderpriority") === "3-MEDIUM", 30L)
          .when(col("o_orderpriority") === "4-NOT SPECIFIED", 60L)
          .otherwise(90L)
        Tables(s, d, "lineitem")
          .groupBy("l_orderkey").agg(min(col("l_shipdate")).as("first_ship"))
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"), sla.as("sla_days"),
                  when(datediff(col("first_ship").cast("date"),
                                col("o_orderdate").cast("date")) <= sla, 1L)
                    .otherwise(0L).as("ok"))
          .groupBy("o_orderpriority")
          .agg(max(col("sla_days")).as("sla_days"),
               count(lit(1)).as("n_orders"), sum(col("ok")).as("n_attained"))
          .select(col("o_orderpriority"), col("sla_days"), col("n_orders"),
                  col("n_attained"),
                  expr("n_attained * 1000000L div n_orders").as("attain_ppm"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship
             |           FROM lineitem GROUP BY l_orderkey),
             |j AS (SELECT o_orderpriority,
             |        CASE o_orderpriority WHEN '1-URGENT' THEN 7
             |          WHEN '2-HIGH' THEN 14 WHEN '3-MEDIUM' THEN 30
             |          WHEN '4-NOT SPECIFIED' THEN 60 ELSE 90 END AS sla_days,
             |        CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
             |               CAST(first_ship AS DATE))
             |             <= CASE o_orderpriority WHEN '1-URGENT' THEN 7
             |                  WHEN '2-HIGH' THEN 14 WHEN '3-MEDIUM' THEN 30
             |                  WHEN '4-NOT SPECIFIED' THEN 60 ELSE 90 END
             |             THEN 1 ELSE 0 END AS ok
             |      FROM f JOIN orders ON l_orderkey = o_orderkey)
             |SELECT o_orderpriority, CAST(max(sla_days) AS BIGINT) AS sla_days,
             |       CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(ok) AS BIGINT) AS n_attained,
             |       CAST(sum(ok) * 1000000 // count(*) AS BIGINT) AS attain_ppm
             |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Cluster cohesion: mean cosine of each label's members to their own
    // (6-dp-rounded) centroid — the embedding-quality diagnostic. The
    // centroid is the agg_vector_centroid surface assembled into an
    // ordered array; per-member cosines round at 6 dp BEFORE a sorted
    // fold, so the float mean is engine-identical.
    "vec_cluster_cohesion" -> Decl(
      (s, d) => {
        val cent = Tables(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), col("pos"))
          .agg(round(avg(col("v").cast("double")), 6).as("coord"))
          .groupBy("label")
          .agg(expr("transform(array_sort(collect_list(struct(pos, coord))), p -> p.coord)")
            .as("centroid"))
        // double-precision HOF cosine (probed EXACT-MATCH against DuckDB's
        // list_cosine_similarity at 6 dp) — the float-typed vec_dot would
        // quantize the centroid and diverge from the oracle's doubles
        val dot = expr(
          "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), centroid, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        def norm(c: String) = sqrt(expr(
          s"aggregate(transform(CAST($c AS ARRAY<DOUBLE>), x -> x * x), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
        Tables(s, d, "embeddings")
          .join(broadcast(cent), "label")
          .select(col("label"),
                  round(dot / (norm("embedding") * norm("centroid")), 6).as("cos"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_members"),
               array_sort(collect_list(col("cos"))).as("cs"))
          .select(col("label"), col("n_members"),
                  round(expr("aggregate(cs, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
                        / col("n_members"), 6).as("cohesion"))
          .orderBy("label")
      },
      Some("""WITH cent AS (
             |  SELECT label, list(coord ORDER BY pos) AS centroid
             |  FROM (SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 6) AS coord
             |        FROM (SELECT label, unnest(embedding) AS v,
             |                     generate_subscripts(embedding, 1) AS pos
             |              FROM embeddings)
             |        GROUP BY label, pos)
             |  GROUP BY label),
             |m AS (SELECT e.label,
             |        round(list_cosine_similarity(e.embedding, c.centroid), 6) AS cos
             |      FROM embeddings e JOIN cent c USING (label))
             |SELECT label, CAST(count(*) AS BIGINT) AS n_members,
             |       round(list_sum(list(cos ORDER BY cos)) / count(*), 6) AS cohesion
             |FROM m GROUP BY label ORDER BY label""".stripMargin)),

    // Temporal referential integrity: lineitems shipping BEFORE their
    // order was placed, audited per order year — the time-travel data
    // bug every warehouse load must gate on. Exact integer censuses and
    // a ppm floor division.
    "quality_temporal_integrity" -> Decl(
      (s, d) => {
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(year(col("o_orderdate")).cast("bigint").as("yr"),
                  when(col("l_shipdate").cast("date") < col("o_orderdate").cast("date"), 1L)
                    .otherwise(0L).as("bad"))
          .groupBy("yr")
          .agg(count(lit(1)).as("n_lines"), sum(col("bad")).as("n_violations"))
          .select(col("yr"), col("n_lines"), col("n_violations"),
                  expr("n_violations * 1000000L div n_lines").as("violation_ppm"))
          .orderBy("yr")
      },
      Some("""WITH j AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |             CASE WHEN CAST(l_shipdate AS DATE)
             |                       < CAST(o_orderdate AS DATE)
             |                  THEN 1 ELSE 0 END AS bad
             |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT yr, CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(bad) AS BIGINT) AS n_violations,
             |       CAST(sum(bad) * 1000000 // count(*) AS BIGINT) AS violation_ppm
             |FROM j GROUP BY yr ORDER BY yr""".stripMargin))
  )
}
