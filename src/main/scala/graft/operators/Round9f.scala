package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 sixth wave: rolling-window distinct users (the DAU/WAU
  * problem), market-basket association rules, inter-purchase gap
  * histogram, and URL-slug normalization.
  */
object Round9f {

  val decls: Map[String, Decl] = Map(
    // Rolling 24-hour distinct users per hour — the product-analytics DAU
    // curve, and the canonical "rolling distinct doesn't merge" problem.
    // The scale path: collapse the corpus ONCE to distinct (user, hour)
    // pairs (bounded by active-users × hours, not events), fan each pair
    // out to the ≤24 anchor hours it can serve via a generated sequence
    // (bounded 24× expansion of the bounded table — never a range join's
    // nested loop), keep anchors that are REAL observed hours, and
    // count-distinct per anchor. Output is one row per observed hour.
    "ts_rolling_dau" -> Decl(
      (s, d) => {
        val uh = Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts) div 3600000000L").as("hr"))
          .distinct()
        val anchors = uh.select(col("hr").as("a")).distinct()
        uh.select(col("user_id"),
                  explode(expr("sequence(hr, hr + 23L)")).as("a"))
          .join(anchors, "a")
          .groupBy("a")
          .agg(countDistinct(col("user_id")).as("dau24"))
          .select(col("a").as("hr"), col("dau24"))
          .orderBy("hr")
      },
      Some("""WITH uh AS (SELECT DISTINCT user_id,
             |              epoch_us(ts) // 3600000000 AS hr
             |            FROM events),
             |anchors AS (SELECT DISTINCT hr AS a FROM uh)
             |SELECT a AS hr,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS dau24
             |FROM anchors JOIN uh
             |  ON uh.hr BETWEEN anchors.a - 23 AND anchors.a
             |GROUP BY a ORDER BY hr""".stripMargin)),

    // Market-basket association rules — support / confidence / lift for
    // the 10 most frequent part pairs bought in the same order. Pair
    // generation is the within-order self-join (fan-out bounded by
    // basket size squared — baskets are small at any corpus scale, so
    // the pair space is O(orders), not O(parts²)); per-part supports
    // aggregate once and broadcast onto the 10 surviving rows. Supports
    // are exact BIGINTs; confidence and lift are each one fixed double
    // tree rounded to 6 dp.
    "agg_assoc_rules" -> Decl(
      (s, d) => {
        val items = Tables(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint(true)
        val nOrders = items.select(countDistinct(col("ok")).as("n_orders"))
        val supp = items.groupBy("pk").agg(count(lit(1)).as("supp"))
        val top = items.as("x")
          .join(items.as("y"),
                col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
          .agg(count(lit(1)).as("supp_ab"))
          .orderBy(col("supp_ab").desc, col("a"), col("b"))
          .limit(10)
        broadcast(broadcast(top)
            .join(supp.select(col("pk").as("a"), col("supp").as("supp_a")), "a"))
          .join(supp.select(col("pk").as("b"), col("supp").as("supp_b")), "b")
          .crossJoin(broadcast(nOrders))
          .select(col("a"), col("b"), col("supp_ab"), col("supp_a"), col("supp_b"),
                  round(col("supp_ab").cast("double") / col("supp_a").cast("double"), 6)
                    .as("confidence"),
                  round((col("supp_ab") * col("n_orders")).cast("double") /
                        (col("supp_a") * col("supp_b")).cast("double"), 6).as("lift"))
          .orderBy(col("supp_ab").desc, col("a"), col("b"))
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |               FROM lineitem),
             |n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
             |supp AS (SELECT pk, count(*) AS supp FROM items GROUP BY pk),
             |top AS (SELECT x.pk AS a, y.pk AS b, count(*) AS supp_ab
             |        FROM items x JOIN items y
             |          ON x.ok = y.ok AND x.pk < y.pk
             |        GROUP BY x.pk, y.pk
             |        ORDER BY supp_ab DESC, a, b LIMIT 10)
             |SELECT a, b, CAST(supp_ab AS BIGINT) AS supp_ab,
             |       CAST(sa.supp AS BIGINT) AS supp_a,
             |       CAST(sb.supp AS BIGINT) AS supp_b,
             |       round(CAST(supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE), 6)
             |         AS confidence,
             |       round(CAST(supp_ab * n.n_orders AS DOUBLE) /
             |             CAST(sa.supp * sb.supp AS DOUBLE), 6) AS lift
             |FROM top JOIN supp sa ON sa.pk = top.a
             |         JOIN supp sb ON sb.pk = top.b
             |         CROSS JOIN n
             |ORDER BY supp_ab DESC, a, b""".stripMargin)),

    // Inter-purchase gap histogram — the repeat-behavior distribution:
    // days between a customer's consecutive orders (lag over order date
    // with the unique-key tie-break), bucketed into capped weeks. Dates
    // ride as integer day diffs end to end; the histogram is bounded (13
    // buckets) at any scale, and the one window partitions by
    // high-cardinality o_custkey.
    "ts_interpurchase_hist" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("dt").asc, col("o_orderkey").asc)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
                  col("o_orderdate").cast("date").as("dt"))
          .withColumn("prev", lag(col("dt"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(least(floor(datediff(col("dt"), col("prev")) / 7).cast("bigint"),
                        lit(12L)).as("gap_weeks"))
          .groupBy("gap_weeks")
          .agg(count(lit(1)).as("n"))
          .orderBy("gap_weeks")
      },
      Some("""WITH p AS (
             |  SELECT CAST(o_orderdate AS DATE) AS dt,
             |         lag(CAST(o_orderdate AS DATE)) OVER w AS prev
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey
             |               ORDER BY CAST(o_orderdate AS DATE) ASC,
             |                        o_orderkey ASC)),
             |g AS (SELECT least(CAST(floor(date_diff('day', prev, dt) / 7)
             |                        AS BIGINT), 12) AS gap_weeks
             |      FROM p WHERE prev IS NOT NULL)
             |SELECT gap_weeks, CAST(count(*) AS BIGINT) AS n
             |FROM g GROUP BY gap_weeks ORDER BY gap_weeks""".stripMargin)),

    // URL-slug normalization — the id/path-minting string pass of web
    // pipelines: lowercase, collapse every non-alphanumeric run to one
    // hyphen, strip edge hyphens. Pure per-row regex projection (patterns
    // in the Java∩RE2 subset), rides the scan at any scale.
    "scalar_slugify" -> Decl(
      (s, d) => {
        Tables(s, d, "part")
          .select(col("p_partkey"),
                  regexp_replace(regexp_replace(lower(col("p_name")),
                                                "[^a-z0-9]+", "-"),
                                 "^-+|-+$", "").as("slug"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  regexp_replace(regexp_replace(lower(p_name),
             |                                '[^a-z0-9]+', '-', 'g'),
             |                 '^-+|-+$', '', 'g') AS slug
             |FROM part ORDER BY p_partkey""".stripMargin))
  )
}
