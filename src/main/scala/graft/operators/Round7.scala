package graft.operators

import graft.{Decl, Tables}
import graft.functions.BpeOps
import org.apache.spark.sql.functions._

/** Round-7 additions: real subword tokenization. */
object Round7 {

  val decls: Map[String, Decl] = Map(
    // Real BPE token counting — the budget number of every training-data
    // pipeline (the regex run-length proxy in text_token_count is the
    // cheap approximation; this is the algorithm). Per-row native
    // expression (BpeTokenCount: ranked greedy merges, one compiled fold,
    // no shuffle — scan-speed like every sketch expression), with the
    // DuckDB oracle GENERATED from the same merge list: each rank-k merge
    // is one literal replace over paren-wrapped symbols, which reproduces
    // the left-to-right non-overlapping merge pass exactly, so the two
    // engines hash-match on the real algorithm rather than a proxy.
    // chars_per_token uses the word-chars only (whitespace carries no
    // subword), guarded against empty texts in both engines.
    "text_bpe_token_count" -> Decl(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
                BpeOps.bpeTokenCount(col("text")).as("bpe_tokens"),
                size(filter(split(col("text"), " "), w => length(w) > 0))
                  .cast("int").as("ws_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |CAST(coalesce(list_sum(list_transform(
              |  list_filter(string_split(text, ' '), w -> len(w) > 0),
              |  w -> ${BpeOps.duckdbCountExpr("w")})), 0) AS INT) AS bpe_tokens,
              |CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS INT)
              |  AS ws_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)))
}
