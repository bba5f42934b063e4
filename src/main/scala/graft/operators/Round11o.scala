package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 71: RAKE keyphrase extraction (Rapid Automatic Keyword
  * Extraction — candidate phrases are maximal stopword-free token runs,
  * scored by the sum of member-word degree/frequency ratios; the
  * no-model keyphrase baseline every corpus-exploration pipeline ships)
  * and the spectral periodogram of the daily purchase series (power at
  * the Fourier frequencies — the frequency-domain complement to the
  * autocorrelation/Ljung-Box diagnostics already in the ts family).
  *
  * Determinism: stopwords are the corpus top-15 by (count desc, word);
  * phrase runs come from the gap-islands trick (pos − row_number inside
  * each doc); every float summation folds a POSITION-ORDERED list
  * (sort_array + aggregate here, list(... ORDER BY) + list_sum in the
  * oracle) so no shuffle-order double addition exists on either side.
  * Periodogram trig runs on the same IEEE doubles in both engines and
  * reports power SHARES rounded at 4 dp.
  *
  * Scale shape: RAKE is two token-granularity shuffles (word stats,
  * phrase grouping) — both map-side combined; the stoplist and the
  * word-score table are vocabulary-bounded broadcasts. The periodogram
  * reduces the corpus to the 30-day grid in one aggregate; the 14×30
  * trig table is constant-sized.
  */
object Round11o {

  val decls: Map[String, Decl] = Map(
    "text_keyphrase_rake" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Pipeline.docsWithTokens(s, d)
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "word")))
        val stop = toks.groupBy("word").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("word").asc).limit(15)
          .select(col("word").as("sw"))
        val content = toks
          .join(broadcast(stop), col("word") === col("sw"), "left_anti")
        // gap-islands: runs of consecutive content tokens inside a doc
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        val runs = content
          .withColumn("grp", col("pos") - row_number().over(wDoc))
        val phrases = runs
          .groupBy(col("doc_id"), col("grp"))
          .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("word"))))
                 .getField("word")).as("phrase"),
               count(lit(1)).as("len"))
          .filter(col("len").between(2, 4))
          .localCheckpoint(true)
        // RAKE word stats over OCCURRENCE-level members: freq = total
        // appearances, degree = Σ phrase length over containing phrases
        val membersOcc = phrases
          .select(col("phrase"), col("len"),
                  posexplode(split(col("phrase"), " ")).as(Seq("wpos", "word")))
        val wordScore = membersOcc.groupBy("word")
          .agg((sum(col("len")).cast("double") /
                count(lit(1)).cast("double")).as("ws"))
        // phrase score: fold member scores in POSITION order, once per
        // DISTINCT phrase (occurrences are reported as n_occ, not
        // multiplied into the score)
        val scored = phrases.select("phrase").distinct()
          .select(col("phrase"),
                  posexplode(split(col("phrase"), " ")).as(Seq("wpos", "word")))
          .join(broadcast(wordScore), "word")
          .groupBy(col("phrase"))
          .agg(aggregate(array_sort(collect_list(struct(col("wpos"), col("ws"))))
                           .getField("ws"),
                         lit(0.0), (acc, x) => acc + x).as("score"))
        val occ = phrases.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
        scored.join(occ, "phrase")
          .select(col("phrase"), col("n_occ"),
                  round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("phrase").asc)
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, u.word, u.pos FROM (
             |    SELECT doc_id,
             |           unnest(string_split(text, ' ')) AS word,
             |           generate_subscripts(string_split(text, ' '), 1) AS pos
             |    FROM documents) u(doc_id, word, pos)),
             |stop AS (SELECT word FROM (
             |  SELECT word, count(*) AS c FROM tok GROUP BY 1
             |  ORDER BY c DESC, word LIMIT 15)),
             |content AS (SELECT t.* FROM tok t
             |            WHERE t.word NOT IN (SELECT word FROM stop)),
             |runs AS (SELECT doc_id, word, pos,
             |                pos - row_number() OVER (PARTITION BY doc_id
             |                                         ORDER BY pos) AS grp
             |         FROM content),
             |phrases AS (SELECT doc_id, grp,
             |                   string_agg(word, ' ' ORDER BY pos) AS phrase,
             |                   count(*) AS len
             |            FROM runs GROUP BY 1, 2
             |            HAVING count(*) BETWEEN 2 AND 4),
             |members AS (SELECT phrase, len,
             |                   unnest(string_split(phrase, ' ')) AS word,
             |                   generate_subscripts(string_split(phrase, ' '), 1)
             |                     AS wpos
             |            FROM phrases),
             |ws AS (SELECT word, CAST(sum(len) AS DOUBLE) / count(*) AS ws
             |       FROM members GROUP BY 1),
             |dm AS (SELECT phrase,
             |              unnest(string_split(phrase, ' ')) AS word,
             |              generate_subscripts(string_split(phrase, ' '), 1) AS wpos
             |       FROM (SELECT DISTINCT phrase FROM phrases)),
             |scored AS (SELECT m.phrase,
             |                  list_sum(list(ws.ws ORDER BY m.wpos)) AS score
             |           FROM dm m JOIN ws ON ws.word = m.word
             |           GROUP BY m.phrase),
             |occ AS (SELECT phrase, count(*) AS n_occ FROM phrases GROUP BY 1)
             |SELECT s.phrase, o.n_occ,
             |       round(s.score, 6) AS score
             |FROM scored s JOIN occ o ON o.phrase = s.phrase
             |ORDER BY score DESC, s.phrase ASC
             |LIMIT 20""".stripMargin)),

    // Periodogram of the 30-day purchase-cents series at Fourier
    // frequencies k = 1..14: share of total (mean-removed) power per
    // frequency. Trig sums fold the day-ordered list on both sides.
    "ts_spectral_periodogram" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(sum(round(col("value") * 100).cast("bigint")).as("c"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("c"), lit(0L)).as("c"))
          .orderBy("t").collect()
        val y = spine.map(r => r.getLong(1).toDouble / 100.0)
        val n = y.length
        val mean = y.sum / n
        val yc = y.map(_ - mean)
        val pk = (1 to 14).map { k =>
          var cs = 0.0; var sn = 0.0
          (1 to n).foreach { t =>
            val ang = 2.0 * math.Pi * k * t / n
            cs += yc(t - 1) * math.cos(ang)
            sn += yc(t - 1) * math.sin(ang)
          }
          (k.toLong, cs * cs + sn * sn)
        }
        val total = pk.map(_._2).sum
        def r4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        pk.map { case (k, p) => (k, r4(p / total)) }
          .toDF("freq", "power_share")
          .orderBy("freq")
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS c
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |y AS (SELECT g.t, CAST(coalesce(c, 0) AS DOUBLE) / 100.0 AS y
             |      FROM generate_series(1, 30) AS g(t)
             |      LEFT JOIN daily ON daily.t = g.t),
             |m AS (SELECT list_sum(list(y ORDER BY t)) / 30.0 AS mu FROM y),
             |yc AS (SELECT t, y - m.mu AS v FROM y CROSS JOIN m),
             |cssn AS (SELECT k,
             |    list_sum(list(v * cos(2 * pi() * k * t / 30.0) ORDER BY t)) AS cs,
             |    list_sum(list(v * sin(2 * pi() * k * t / 30.0) ORDER BY t)) AS sn
             |  FROM yc CROSS JOIN generate_series(1, 14) AS g(k)
             |  GROUP BY k),
             |pk AS (SELECT k, cs * cs + sn * sn AS p FROM cssn),
             |tot AS (SELECT list_sum(list(p ORDER BY k)) AS tp FROM pk)
             |SELECT k AS freq, round(p / tot.tp, 4) AS power_share
             |FROM pk CROSS JOIN tot
             |ORDER BY freq""".stripMargin))
  )
}
