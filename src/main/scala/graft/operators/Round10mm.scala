package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 43: token-budget corpus selection — the "fill each
  * language's training-mix slot with the best documents until the token
  * budget runs out" step every pretraining data pipeline ends with.
  *
  * Ranking is per-language by integer lexical density (1000·|distinct
  * tokens| div |tokens| — an exact integer, no float ever sorts), doc_id
  * tiebreak; the keep decision is `cumulative tokens ≤ budget` under
  * that order.
  *
  * Scale shape: the cumulative sum is the distributed two-pass
  * [[PrefixSum]] over the ONE global total order (lang, density desc,
  * doc_id) — languages are a handful of values, so a
  * `Window.partitionBy(lang)` would funnel each language's whole corpus
  * through one task (the exact shape the round-9 verdict flagged and
  * the ScaleSpec gate now rejects). Per-language cumulative = global
  * cumulative − the language's base offset, recovered from a bounded
  * (#langs-row) broadcast aggregate.
  */
object Round10mm {

  private val Budget = 10000L

  val decls: Map[String, Decl] = Map(
    "mix_token_budget" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("toks"),
            expr("CAST(size(array_distinct(split(text, ' '))) * 1000L " +
              "div size(split(text, ' ')) AS BIGINT)").as("density"))
        val order = Seq(col("lang").asc, col("density").desc, col("doc_id").asc)
        val cum = PrefixSum.cumsumLong(docs, order, col("toks"), "gcum")
        // per-lang base: the language's first row in the total order has
        // the minimal global cum; its in-language cumulative is its own
        // token count, so base = min(gcum) − min_by(toks, gcum)
        val base = cum.groupBy("lang")
          .agg((min(col("gcum")) - min_by(col("toks"), col("gcum"))).as("base"))
        cum.join(broadcast(base), "lang")
          .select(col("lang"), col("doc_id"), col("toks"), col("density"),
                  (col("gcum") - col("base")).as("cum_toks"))
          .filter(col("cum_toks") <= Budget)
          .orderBy("lang", "cum_toks")
      },
      Some(s"""SELECT lang, doc_id, toks, density, cum_toks FROM (
             |  SELECT lang, doc_id, toks, density,
             |         -- R12: window sum is HUGEINT in DuckDB; cast to BIGINT
             |         CAST(sum(toks) OVER (PARTITION BY lang
             |                              ORDER BY density DESC, doc_id)
             |              AS BIGINT) AS cum_toks
             |  FROM (
             |    SELECT doc_id, lang,
             |           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             |           CAST(len(list_distinct(string_split(text, ' '))) * 1000
             |                // len(string_split(text, ' ')) AS BIGINT) AS density
             |    FROM documents))
             |WHERE cum_toks <= $Budget
             |ORDER BY lang, cum_toks""".stripMargin))
  )
}
