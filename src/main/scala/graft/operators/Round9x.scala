package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 twenty-fourth wave: turning-point census (local extrema per
  * series) and Luhn checksum validation — both pure integer arithmetic.
  */
object Round9x {

  val decls: Map[String, Decl] = Map(
    // Turning points — strict local maxima / minima per user's value
    // series: the zigzag/swing census of trend analysis. One lag + one
    // lead on the shared user sort, strict integer comparisons only
    // (plateau points are neither), bounded per-user output row.
    "window_turning_points" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .withColumn("p", lag(col("c"), 1).over(w))
          .withColumn("nx", lead(col("c"), 1).over(w))
          .filter(col("p").isNotNull && col("nx").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_interior"),
               sum(when(col("c") > col("p") && col("c") > col("nx"), 1L)
                 .otherwise(0L)).as("n_peaks"),
               sum(when(col("c") < col("p") && col("c") < col("nx"), 1L)
                 .otherwise(0L)).as("n_troughs"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT)) OVER w AS p,
             |             lead(CAST(round(value * 100) AS BIGINT)) OVER w AS nx
             |           FROM events
             |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_interior,
             |  CAST(sum(CASE WHEN c > p AND c > nx THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_peaks,
             |  CAST(sum(CASE WHEN c < p AND c < nx THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_troughs
             |FROM e WHERE p IS NOT NULL AND nx IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Luhn checksum — the mod-10 check-digit validation behind card and
    // id-number intake: a synthetic 8-digit account number is minted from
    // the order key, its Luhn check digit computed by the doubled-digit
    // fold, and the full 9-digit number re-validated (valid = 1 on every
    // row — the oracle hashes the PROOF). Pure per-row integer/HOF
    // arithmetic riding the scan (the fold is over the padded 8-char
    // digit array, positions from the right alternate doubling).
    "scalar_luhn_check" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  lpad((col("o_orderkey") % 100000000L).cast("string"), 8, "0")
                    .as("acct"))
          // sum over digits: from the right, double every odd position
          // (1-indexed from the right = positions 1,3,5,7 of the reversed
          // string), subtract 9 when the doubled digit exceeds 9
          .withColumn("luhn_sum", expr(
            """aggregate(
              |  transform(split(reverse(acct), ''),
              |    (ch, i) -> CASE
              |      WHEN ch = '' THEN 0L
              |      WHEN i % 2 = 0 THEN
              |        CASE WHEN CAST(ch AS BIGINT) * 2 > 9
              |             THEN CAST(ch AS BIGINT) * 2 - 9
              |             ELSE CAST(ch AS BIGINT) * 2 END
              |      ELSE CAST(ch AS BIGINT) END),
              |  0L, (a, x) -> a + x)""".stripMargin))
          .withColumn("check_digit", (lit(10L) - col("luhn_sum") % 10L) % 10L)
          .select(col("o_orderkey"),
                  concat(col("acct"), col("check_digit").cast("string"))
                    .as("account_number"),
                  col("check_digit"))
          .orderBy("o_orderkey")
      },
      Some("""WITH a AS (SELECT o_orderkey,
             |    lpad(CAST(o_orderkey % 100000000 AS VARCHAR), 8, '0') AS acct
             |  FROM orders),
             |s AS (SELECT o_orderkey, acct,
             |    list_sum(list_transform(string_split(reverse(acct), ''),
             |      (ch, i) -> CASE
             |        WHEN (i - 1) % 2 = 0 THEN
             |          CASE WHEN CAST(ch AS BIGINT) * 2 > 9
             |               THEN CAST(ch AS BIGINT) * 2 - 9
             |               ELSE CAST(ch AS BIGINT) * 2 END
             |        ELSE CAST(ch AS BIGINT) END)) AS luhn_sum
             |  FROM a)
             |SELECT o_orderkey,
             |  acct || CAST((10 - luhn_sum % 10) % 10 AS VARCHAR)
             |    AS account_number,
             |  CAST((10 - luhn_sum % 10) % 10 AS BIGINT) AS check_digit
             |FROM s ORDER BY o_orderkey""".stripMargin))
  )
}
