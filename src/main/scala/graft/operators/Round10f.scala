package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 sixth wave: marketing attribution, id codecs, market
  * concentration, and co-occurrence statistics. Integer micros/cents/counts
  * end-to-end; terminal rounded floats only (one ln / ratio per row over a
  * bounded grid); total ORDER BY.
  */
object Round10f {

  private val Alpha =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  val decls: Map[String, Decl] = Map(
    // Last-touch attribution: each purchase credits the user's most recent
    // non-purchase event in the preceding 7 days; purchases with no
    // touchpoint stay '(none)'. The candidate join fans a purchase out to
    // its OWN user's recent events only (per-user history, bounded), and
    // the pick is one row_number over (purchase, ts desc, event_id desc)
    // — exact integer ordering, no ties possible on the unique id.
    "ts_attribution_lasttouch" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
                  expr("unix_micros(ts)").as("us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
        val priors = ev.filter(col("event_type") =!= "purchase")
        val w = Window.partitionBy("p_id")
          .orderBy(col("us").desc, col("event_id").desc)
        val touch = purchases.join(priors, "user_id")
          .filter(col("us") < col("p_us") &&
                  col("us") >= col("p_us") - 604800000000L)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("p_id"), col("event_type").as("channel"))
        purchases.join(touch, Seq("p_id"), "left")
          .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
          .agg(count(lit(1)).as("n_credits"))
          .orderBy("channel")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, event_id,
             |              CAST(epoch_us(ts) AS BIGINT) AS us
             |            FROM events),
             |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
             |      WHERE event_type = 'purchase'),
             |touch AS (
             |  SELECT p_id, event_type AS channel,
             |         row_number() OVER (PARTITION BY p_id
             |           ORDER BY us DESC, event_id DESC) AS rk
             |  FROM p JOIN ev USING (user_id)
             |  WHERE ev.event_type <> 'purchase'
             |    AND us < p_us AND us >= p_us - 604800000000)
             |SELECT coalesce(t.channel, '(none)') AS channel,
             |       CAST(count(*) AS BIGINT) AS n_credits
             |FROM p LEFT JOIN (SELECT p_id, channel FROM touch WHERE rk = 1) t
             |       USING (p_id)
             |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Base62 shortlink codec: encode each order key as a fixed 6-char
    // base62 code (positional div/mod unrolled — no loops, no UDF) and
    // decode it back via alphabet position arithmetic; the roundtrip is
    // asserted by the oracle hash (decoded == o_orderkey on every row).
    // Pure per-row integer/string work riding the scan.
    "scalar_base62_codec" -> Decl(
      (s, d) => {
        def digit(i: Int) = // i-th most significant of 6 digits
          substring(lit(Alpha),
            (expr(s"o_orderkey div ${math.pow(62, 5 - i).toLong}") % 62L + 1L)
              .cast("int"), lit(1))
        def decDigit(i: Int) =
          (instr(lit(Alpha), substring(col("code"), i + 1, 1)) - 1).cast("bigint") *
            lit(math.pow(62, 5 - i).toLong)
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  concat((0 to 5).map(digit): _*).as("code"))
          .select(col("o_orderkey"), col("code"),
                  (0 to 5).map(decDigit).reduce(_ + _).as("decoded"))
          .orderBy("o_orderkey")
      },
      Some {
        val alpha = Alpha
        val enc = (0 to 5).map { i =>
          val p = math.pow(62, 5 - i).toLong
          s"substr('$alpha', CAST(o_orderkey // $p % 62 + 1 AS INT), 1)"
        }.mkString(" || ")
        val dec = (0 to 5).map { i =>
          val p = math.pow(62, 5 - i).toLong
          s"(strpos('$alpha', substr(code, ${i + 1}, 1)) - 1) * $p"
        }.mkString(" + ")
        s"""WITH c AS (SELECT o_orderkey, $enc AS code FROM orders)
           |SELECT o_orderkey, code, CAST($dec AS BIGINT) AS decoded
           |FROM c ORDER BY o_orderkey""".stripMargin
      }),

    // Herfindahl–Hirschman concentration of customer revenue within each
    // market segment: Σ shareᵢ² from exact per-customer dollar sums
    // (dollars, not cents, keep Σxᵢ² < 2⁶³). Two shuffles on natural keys
    // (customer, then segment), one terminal ratio of exact integers.
    "agg_hhi_concentration" -> Decl(
      (s, d) => {
        val rev = Tables(s, d, "orders")
          .join(Tables(s, d, "customer"),
                col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "c_custkey")
          .agg(sum(round(col("o_totalprice")).cast("bigint")).as("dol"))
        rev.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
               sum(col("dol")).as("total_dol"),
               sum(col("dol") * col("dol")).as("sum_sq"))
          .select(col("c_mktsegment"), col("n_customers"), col("total_dol"),
                  round(col("sum_sq").cast("double")
                        / (col("total_dol").cast("double") * col("total_dol")), 6)
                    .as("hhi"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH rev AS (
             |  SELECT c_mktsegment, c_custkey,
             |         sum(CAST(round(o_totalprice) AS BIGINT)) AS dol
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2)
             |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(sum(dol) AS BIGINT) AS total_dol,
             |       round(CAST(sum(dol * dol) AS DOUBLE)
             |             / (CAST(sum(dol) AS DOUBLE) * sum(dol)), 6) AS hhi
             |FROM rev GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Pointwise mutual information of event-type pairs co-occurring in
    // the same user-hour basket: the co-occurrence statistic behind
    // word-vector pipelines, on the bounded 5×5 pair grid. Baskets are
    // distinct (user, hour, type) triples; all counts exact BIGINT; one
    // terminal ln per surviving pair.
    "agg_cooccurrence_pmi" -> Decl(
      (s, d) => {
        val basket = Tables.events(s, d)
          .select(col("user_id"),
                  expr("unix_micros(ts) div 3600000000L").as("hr"),
                  col("event_type"))
          .distinct()
          .localCheckpoint(true)
        val nB = basket.select("user_id", "hr").distinct()
          .agg(count(lit(1)).as("n"))
        val cx = basket.groupBy(col("event_type").as("x")).agg(count(lit(1)).as("cx"))
        val pair = basket.as("a")
          .join(basket.as("b"),
                col("a.user_id") === col("b.user_id") &&
                col("a.hr") === col("b.hr") &&
                col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("x"), col("b.event_type").as("y"))
          .agg(count(lit(1)).as("cxy"))
        pair
          .join(broadcast(cx), "x")
          .join(broadcast(cx.select(col("x").as("y"), col("cx").as("cy"))), "y")
          .crossJoin(broadcast(nB))
          .select(col("x"), col("y"), col("cxy"),
                  round(log((col("cxy") * col("n")).cast("double")
                            / (col("cx") * col("cy")).cast("double")), 6)
                    .as("pmi"))
          .orderBy("x", "y")
      },
      Some("""WITH basket AS (
             |  SELECT DISTINCT user_id,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         event_type
             |  FROM events),
             |nb AS (SELECT count(*) AS n FROM
             |        (SELECT DISTINCT user_id, hr FROM basket)),
             |cx AS (SELECT event_type AS x, count(*) AS cx
             |       FROM basket GROUP BY 1),
             |pair AS (SELECT a.event_type AS x, b.event_type AS y,
             |                count(*) AS cxy
             |         FROM basket a JOIN basket b
             |           ON a.user_id = b.user_id AND a.hr = b.hr
             |          AND a.event_type < b.event_type
             |         GROUP BY 1, 2)
             |SELECT pair.x, pair.y, CAST(cxy AS BIGINT) AS cxy,
             |       round(ln(CAST(cxy * n AS DOUBLE)
             |                / CAST(cx.cx * cy.cx AS DOUBLE)), 6) AS pmi
             |FROM pair
             |     JOIN cx ON cx.x = pair.x
             |     JOIN cx cy ON cy.x = pair.y
             |     CROSS JOIN nb
             |ORDER BY pair.x, pair.y""".stripMargin))
  )
}
