package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 58: average precision (the PR-AUC that matters under
  * class imbalance, where ROC-AUC flatters) and MATTR — the
  * moving-average type-token ratio, the windowed lexical-diversity
  * metric that fixes plain TTR's length bias.
  *
  * Determinism: AP folds integer-scaled per-threshold terms
  * (picotask-quantized at 1e-12 — the quantization error is ≤ one part
  * in 1e12 per distinct score, orders below the 6-dp round); MATTR is
  * exact half-up ppm integer arithmetic per document. No float ever
  * crosses an aggregation merge in either key.
  *
  * Scale shape: AP reduces to the same distinct-score grid + PrefixSum
  * cumulatives as the ROC family; MATTR is pure per-row HOF work inside
  * whole-stage codegen (O(tokens × window) per document, no shuffle at
  * all before the final sort).
  */
object Round11b {

  val decls: Map[String, Decl] = Map(
    // Average precision = Σ_g (recall increment of group g) × (precision
    // at g's threshold), groups descending by score. With cumulatives
    // from the distributed prefix sum the term is p_g/P · cp_g/cn_g;
    // scaled by 1e12 and floor-divided per group it stays BIGINT —
    // Σ terms / 1e12 = AP with ≤ |grid|/1e12 quantization (sub-ulp here).
    // BIGINT-safe through sf1; wider scale is the documented
    // DECIMAL(38,0) swap.
    "agg_pr_auc" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("r", lit(1L))
        val scored = Tables(s, d, "customer")
          .select(col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("score"))
          .join(resp, Seq("c_custkey"), "left")
          .select(col("score"), coalesce(col("r"), lit(0L)).as("r"))
        val grid = scored.groupBy("score")
          .agg(count(lit(1)).as("n"), sum(col("r")).as("p"))
        val tot = scored.agg(count(lit(1)).as("nt"), sum(col("r")).as("pt"))
        PrefixSum.cumsumLongs(grid, Seq(col("score").desc),
                              Seq(col("n") -> "cn", col("p") -> "cp"))
          .join(broadcast(tot))
          .select(col("p"), col("cp"), col("cn"), col("pt"))
          .agg(sum(expr("(p * cp * 1000000000000L) div (pt * cn)"))
                 .as("ap_pico"),
               max(col("pt")).as("n_pos"))
          .select(col("n_pos"),
                  expr("(ap_pico + 500000L) div 1000000L").as("ap_ppm"),
                  round(col("ap_pico").cast("double") / 1e12, 6)
                    .as("average_precision"))
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS r
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |scored AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS score,
             |                  coalesce(r, 0) AS r
             |           FROM customer LEFT JOIN resp USING (c_custkey)),
             |grid AS (SELECT score, count(*) AS n, sum(r) AS p
             |         FROM scored GROUP BY score),
             |tot AS (SELECT count(*) AS nt, sum(r) AS pt FROM scored),
             |cum AS (SELECT p,
             |          sum(n) OVER (ORDER BY score DESC
             |            ROWS UNBOUNDED PRECEDING) AS cn,
             |          sum(p) OVER (ORDER BY score DESC
             |            ROWS UNBOUNDED PRECEDING) AS cp
             |        FROM grid),
             |ap AS (SELECT sum((p * cp * 1000000000000) // (pt * cn))
             |                AS ap_pico,
             |              max(pt) AS n_pos
             |       FROM cum CROSS JOIN tot)
             |SELECT CAST(n_pos AS BIGINT) AS n_pos,
             |       CAST((ap_pico + 500000) // 1000000 AS BIGINT) AS ap_ppm,
             |       round(CAST(ap_pico AS DOUBLE) / 1e12, 6)
             |         AS average_precision
             |FROM ap""".stripMargin)),

    // MATTR with a 40-token window: slide over every start position,
    // count distinct types in each window, average — all exact integers
    // (Σ distinct-counts over K windows, mattr = S/(W·K) as half-up
    // ppm). Documents shorter than the window fall back to plain TTR
    // (one window of the whole document).
    "text_mattr_diversity" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"),
                  col("toks"))
          .withColumn("w", least(col("n_tokens"), lit(40L)))
          .withColumn("k", col("n_tokens") - col("w") + 1L)
          .withColumn("sdist", expr(
            """aggregate(
              |  transform(sequence(1L, n_tokens - w + 1L),
              |            i -> size(array_distinct(
              |                   slice(toks, cast(i as int), cast(w as int))))),
              |  0L, (acc, x) -> acc + cast(x as bigint))""".stripMargin))
          .select(col("doc_id"), col("n_tokens"), col("k").as("n_windows"),
                  expr("(sdist * 2000000L + w * k) div (2L * w * k)")
                    .as("mattr_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks,
             |         len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |w AS (SELECT doc_id, toks, n_tokens,
             |             least(n_tokens, 40) AS w,
             |             n_tokens - least(n_tokens, 40) + 1 AS k
             |      FROM base),
             |s AS (SELECT doc_id, n_tokens, w, k,
             |             list_sum(list_transform(range(1, k + 1),
             |               i -> len(list_distinct(toks[i:i+w-1])))) AS sdist
             |      FROM w)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |       CAST(k AS BIGINT) AS n_windows,
             |       CAST((sdist * 2000000 + w * k) // (2 * w * k) AS BIGINT)
             |         AS mattr_ppm
             |FROM s ORDER BY doc_id""".stripMargin))
  )
}
