package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-first wave: robust smoothing and serial-correlation
  * diagnostics, both fully exact until one terminal division.
  */
object Round10u {

  val decls: Map[String, Decl] = Map(
    // Tukey median-of-three smoother over each user's value stream: the
    // robust pre-filter that kills single-sample spikes before any
    // model sees them. median(a,b,c) = a+b+c − max − min stays in exact
    // integer cents; endpoints pass through unsmoothed.
    "window_median3_smooth" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("p", lag(col("x"), 1).over(w))
          .withColumn("nx", lead(col("x"), 1).over(w))
        ev.select(col("user_id"), col("event_id"), col("x"),
                  when(col("p").isNull || col("nx").isNull, col("x"))
                    .otherwise(col("p") + col("x") + col("nx")
                      - greatest(col("p"), col("x"), col("nx"))
                      - least(col("p"), col("x"), col("nx"))).as("x_smooth"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |n AS (SELECT user_id, event_id, x,
             |        lag(x) OVER w AS p, lead(x) OVER w AS nx
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
             |SELECT user_id, event_id, x,
             |       CAST(CASE WHEN p IS NULL OR nx IS NULL THEN x
             |                 ELSE p + x + nx - greatest(p, x, nx)
             |                      - least(p, x, nx) END AS BIGINT) AS x_smooth
             |FROM n ORDER BY user_id, event_id""".stripMargin)),

    // Durbin–Watson serial-correlation statistic of the hourly count
    // series per event type. The mean-centering stays EXACT by the
    // scale-cancelling transform y_t = n·c_t − S (integers): DW =
    // Σ(y_t − y_{t−1})² / Σy_t² is invariant to the n scaling, so no
    // float enters before the one terminal division. DW ≈ 2 means no
    // serial correlation; < 2 positive.
    "ts_durbin_watson" -> Decl(
      (s, d) => {
        val spine = Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
        val tot = spine.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("ss"))
        val w = Window.partitionBy("event_type").orderBy("hr")
        spine.join(broadcast(tot), "event_type")
          .withColumn("y", col("n") * col("c") - col("ss"))
          .withColumn("py", lag(col("y"), 1).over(w))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_hours"),
               sum(when(col("py").isNotNull,
                        (col("y") - col("py")) * (col("y") - col("py")))
                 .otherwise(0L)).as("num"),
               sum(col("y") * col("y")).as("den"))
          .select(col("event_type"), col("n_hours"), col("num"), col("den"),
                  round(col("num").cast("double") / col("den"), 6).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH spine AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT event_type, count(*) AS n, sum(c) AS ss
             |        FROM spine GROUP BY event_type),
             |y AS (SELECT spine.event_type, hr, n, n * c - ss AS y
             |      FROM spine JOIN tot USING (event_type)),
             |l AS (SELECT event_type, n, y,
             |        lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS py
             |      FROM y)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n_hours,
             |       CAST(sum(CASE WHEN py IS NOT NULL
             |                     THEN (y - py) * (y - py) ELSE 0 END) AS BIGINT)
             |         AS num,
             |       CAST(sum(y * y) AS BIGINT) AS den,
             |       round(CAST(sum(CASE WHEN py IS NOT NULL
             |                           THEN (y - py) * (y - py) ELSE 0 END)
             |                  AS DOUBLE) / sum(y * y), 6) AS dw
             |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
