package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 second wave: shuffle-free co-located bucketed join, two
  * rank/variance statistical tests on the exact integer-cents grid,
  * common-neighbor link prediction over the customer–part co-occurrence
  * graph, and a bit-exact dyadic EWMA window.
  */
object Round8b {

  /** Hot-part guardrail for the co-occurrence self-join: a part bought by
    * df customers contributes df² candidate pairs, so one viral part
    * (df = 10⁶ at corpus scale) would dominate the whole pair space.
    * Capping df bounds per-key fan-out at Cap² and total pairs at
    * Cap·|edges| — the MaxShingleDf discipline applied to co-purchase.
    * 40 BINDS on this fixture (max df 49–53), so the exclusion path is
    * oracle-exercised, not dead scale insurance.
    */
  private val MaxPartDf = 40

  val decls: Map[String, Decl] = Map(
    // Co-located bucketed join — the canonical 100 TB shuffle eliminator:
    // both sides are written ONCE bucketed (and bucket-sorted) on the join
    // key, so every subsequent join on that key reads bucket i against
    // bucket i with ZERO exchange on either side — the repeated-join
    // workload (fact⋈dim every hour) pays the shuffle once at layout time
    // instead of per query. ScaleSpec pins the plan: the SortMergeJoin
    // subtree contains no ShuffleExchange. Table names are unique per
    // invocation (scratch sequence) so re-runs in one session never race;
    // the in-memory catalog entry dies with the session and the files with
    // the JVM (shared scratch shutdown hook).
    "join_bucketed_colocated" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_bktwh")
        val tag = dir.getFileName.toString.filter(_.isDigit)
        val ot = s"graft_bkt_orders_$tag"
        val ct = s"graft_bkt_customer_$tag"
        Tables(s, d, "orders")
          .write.format("parquet").mode("overwrite")
          .option("path", dir.resolve("orders").toString)
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ot)
        Tables(s, d, "customer")
          .write.format("parquet").mode("overwrite")
          .option("path", dir.resolve("customer").toString)
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(ct)
        s.table(ot).hint("merge")
          .join(s.table(ct), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
               sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .orderBy("c_mktsegment")
      },
      // CAST the sum back to BIGINT: DuckDB's sum(BIGINT) yields HUGEINT,
      // which the driver's pandas bridge renders as float ("…e+10") and
      // hash-mismatches Spark's exact integer (round-8 advice).
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Mann–Whitney U (click vs error values) — the rank-sum companion to
    // agg_ks_test/agg_ttest_welch: nonparametric location shift with tie
    // handling. Midranks make U a half-integer, so both engines carry 2U
    // as an exact BIGINT: on the bounded distinct-cents grid, each value v
    // contributes c1(v)·(2·r2(v) − c2(v)) to 2U₁ (r2 = inclusive
    // cumulative count of the other sample — the same single window over
    // the grid KS uses), and 2U₁ + 2U₂ = 2n₁n₂ by construction. No float
    // enters until the one terminal halving, which is exact (.0/.5).
    "agg_mann_whitney" -> Decl(
      (s, d) => {
        val w = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(round(col("value") * 100).cast("bigint").as("cents"),
                  col("event_type"))
        ev.groupBy("cents")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
               sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("c2"))
          .select(col("c1"), col("c2"),
                  sum(col("c1")).over(w).as("r1"), sum(col("c2")).over(w).as("r2"))
          .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
               sum(col("c1") * (lit(2L) * col("r2") - col("c2"))).as("u1_x2"),
               sum(col("c2") * (lit(2L) * col("r1") - col("c1"))).as("u2_x2"))
          .select(col("n1"), col("n2"), col("u1_x2"), col("u2_x2"),
                  (col("u1_x2").cast("double") / 2.0).as("u1"))
      },
      Some("""WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             |                   event_type
             |            FROM events WHERE event_type IN ('click', 'error')),
             |grid AS (SELECT cents,
             |           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             |           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c2
             |         FROM ev GROUP BY cents),
             |r AS (SELECT c1, c2,
             |        sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r1,
             |        sum(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r2
             |      FROM grid)
             |SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
             |       CAST(sum(c1 * (2 * r2 - c2)) AS BIGINT) AS u1_x2,
             |       CAST(sum(c2 * (2 * r1 - c1)) AS BIGINT) AS u2_x2,
             |       CAST(sum(c1 * (2 * r2 - c2)) AS DOUBLE) / 2.0 AS u1
             |FROM r""".stripMargin)),

    // One-way ANOVA F across all five event types — does mean value differ
    // by type? Per-group sufficient statistics (n, Σcents, Σcents²) are
    // exact BIGINTs (lossless partial aggregation at any scale, the
    // ttest_welch machinery widened to k groups); the bounded known group
    // set is pivoted to columns so the F formula is ONE fixed arithmetic
    // tree evaluated identically in both engines — never a float SUM over
    // rows whose order an engine could choose. Σsᵢ² stays in BIGINT
    // (≲1.4e18 at SF 1; the 100 TB variant would widen s to DECIMAL(38)
    // or carry group means, same plan shape).
    "agg_anova_f" -> Decl(
      (s, d) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val st = Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
               sum(col("c") * col("c")).as("q"))
        val pivCols = types.zipWithIndex.flatMap { case (t, i) =>
          Seq(max(when(col("event_type") === t, col("n"))).as(s"n$i"),
              max(when(col("event_type") === t, col("s"))).as(s"s$i"),
              max(when(col("event_type") === t, col("q"))).as(s"q$i"))
        }
        val piv = st.agg(pivCols.head, pivCols.tail: _*)
        val bg = (0 until 5).map(i =>
          s"CAST(s$i * s$i AS DOUBLE) / n$i").mkString(" + ")
        piv.selectExpr(
            "n0 + n1 + n2 + n3 + n4 AS nn",
            "q0 + q1 + q2 + q3 + q4 AS qq",
            "s0 + s1 + s2 + s3 + s4 AS ss",
            s"$bg AS bg")
          .selectExpr(
            "nn AS n",
            "round(((bg - CAST(ss * ss AS DOUBLE) / nn) / 4) / " +
              "((qq - bg) / (nn - 5)), 6) AS f_stat")
      },
      Some {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val piv = types.zipWithIndex.map { case (t, i) =>
          s"""max(CASE WHEN event_type = '$t' THEN n END) AS n$i,
             |max(CASE WHEN event_type = '$t' THEN s END) AS s$i,
             |max(CASE WHEN event_type = '$t' THEN q END) AS q$i""".stripMargin
        }.mkString(",\n")
        val bg = (0 until 5).map(i =>
          s"CAST(s$i * s$i AS DOUBLE) / n$i").mkString(" + ")
        s"""WITH st AS (SELECT event_type, count(*) AS n,
           |              sum(CAST(round(value * 100) AS BIGINT)) AS s,
           |              sum(CAST(round(value * 100) AS BIGINT) *
           |                  CAST(round(value * 100) AS BIGINT)) AS q
           |            FROM events GROUP BY event_type),
           |piv AS (SELECT
           |$piv
           |FROM st),
           |e AS (SELECT n0 + n1 + n2 + n3 + n4 AS nn,
           |             q0 + q1 + q2 + q3 + q4 AS qq,
           |             s0 + s1 + s2 + s3 + s4 AS ss,
           |             $bg AS bg
           |      FROM piv)
           |SELECT CAST(nn AS BIGINT) AS n,
           |       round(((bg - CAST(ss * ss AS DOUBLE) / nn) / 4) /
           |             ((qq - bg) / (nn - 5)), 6) AS f_stat
           |FROM e""".stripMargin
      }),

    // Common-neighbor link prediction over the customer–part co-purchase
    // graph: which customer pairs share the most distinct parts? The pair
    // generator is the part-keyed self-join of the deduped edge table —
    // fan-out bounded by MaxPartDf (df² pairs per part), total pair space
    // ≤ MaxPartDf·|edges| — then one (a, b) count and a bounded-heap
    // top-20 (TakeOrderedAndProject, never a global sort). Output stays
    // INTEGER (common, degrees over the SAME capped graph): a rounded
    // p/q Jaccard is exactly the repr-vs-scaled cross-engine round trap
    // (memory: round(avg) boundary), and the integers carry strictly more
    // information anyway.
    "graph_jaccard_neighbors" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val edges = Tables(s, d, "orders")
          .join(Tables(s, d, "lineitem"),
                col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct()
        val keep = edges.groupBy("p").agg(count(lit(1)).as("df"))
          .filter(col("df") <= MaxPartDf)
          .select("p")
        // e feeds THREE consumers (deg + both self-join sides); an eager
        // localCheckpoint materializes the orders⋈lineitem→distinct
        // pipeline once (row-per-edge, small) and preserves the p-hash
        // partitioning, so the self-join below re-reads it shuffle-free.
        val e = edges.join(keep, "p").repartition(n, col("p"))
          .localCheckpoint(true)
        val deg = e.groupBy("c").agg(count(lit(1)).as("deg"))
        // Pair generation as the p-keyed self-join: whole-stage-codegen'd
        // end to end, which beats the collect_list + higher-order-function
        // explode alternative ~25% wall (measured: the nested transform
        // lambdas are interpreted, ~5× the CPU of the codegen join even
        // though the join materializes ordered pairs before the c<c cut).
        val pairs = e.as("x")
          .join(e.as("y"),
                col("x.p") === col("y.p") && col("x.c") < col("y.c"))
          .groupBy(col("x.c").as("a"), col("y.c").as("b"))
          .agg(count(lit(1)).as("common"))
          .orderBy(col("common").desc, col("a"), col("b"))
          .limit(20)
        // both degree lookups broadcast the 20-row top-k side (the second
        // join loses the size estimate after the first, and the planner
        // falls back to shuffling customer-cardinality deg against 20 rows)
        broadcast(broadcast(pairs)
            .join(deg.select(col("c").as("a"), col("deg").as("deg_a")), "a"))
          .join(deg.select(col("c").as("b"), col("deg").as("deg_b")), "b")
          .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"))
          .orderBy(col("common").desc, col("a"), col("b"))
      },
      Some(s"""WITH edges AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
             |               FROM orders JOIN lineitem
             |               ON o_orderkey = l_orderkey),
             |keep AS (SELECT p FROM edges GROUP BY p
             |         HAVING count(*) <= $MaxPartDf),
             |e AS (SELECT c, p FROM edges WHERE p IN (SELECT p FROM keep)),
             |deg AS (SELECT c, count(*) AS deg FROM e GROUP BY c),
             |pairs AS (SELECT x.c AS a, y.c AS b, count(*) AS common
             |          FROM e x JOIN e y ON x.p = y.p AND x.c < y.c
             |          GROUP BY x.c, y.c
             |          ORDER BY common DESC, a, b LIMIT 20)
             |SELECT a, b, common, da.deg AS deg_a, db.deg AS deg_b
             |FROM pairs JOIN deg da ON da.c = a JOIN deg db ON db.c = b
             |ORDER BY common DESC, a, b""".stripMargin)),

    // Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    // (streak detection — retention/engagement features). The classic
    // row_number trick: day − rank(day) is constant within a run, so one
    // distinct + one user-partitioned window + one groupBy find all
    // islands with no self-join (the naive "join day to day+1 and chase"
    // is O(run length) joins). Dates are carried as INTEGER day numbers
    // end to end: both engines truncate their native timestamp precision
    // (µs vs ns) to the same UTC day, and integer output is hash-safe
    // where date/interval encodings are not.
    "window_gap_islands" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("days")
        Tables.events(s, d)
          .select(col("user_id"),
                  datediff(col("ts").cast("date"), lit("1970-01-01")).as("days"))
          .distinct()
          .withColumn("grp", col("days") - row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(min(col("days")).as("start_day"), max(col("days")).as("end_day"),
               count(lit(1)).as("len"))
          .select(col("user_id"), col("start_day"), col("end_day"), col("len"))
          .orderBy("user_id", "start_day")
      },
      Some("""WITH dd AS (SELECT DISTINCT user_id,
             |              CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
             |                AS days
             |            FROM events),
             |g AS (SELECT user_id, days,
             |        days - row_number() OVER (PARTITION BY user_id
             |                                  ORDER BY days) AS grp
             |      FROM dd)
             |SELECT user_id, min(days) AS start_day, max(days) AS end_day,
             |       count(*) AS len
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, start_day""".stripMargin)),

    // Hourly OHLC resample of the event value stream — the time-series
    // downsample every metrics/market pipeline runs. Open/close are
    // argmin/argmax over (µs, event_id) via the lexicographic struct-min
    // trick (the ONLY deterministic cross-engine argmin; memory: DuckDB
    // min of a struct IS lexicographic). Both engines reduce the
    // timestamp to INTEGER microseconds first — ordering by raw ts would
    // diverge on sub-µs digits only DuckDB's nanos see. One partial-agg
    // groupBy on the bounded hour grid; everything stays BIGINT.
    "ts_resample_ohlc" -> Decl(
      (s, d) => {
        val us = expr("unix_micros(ts)")
        val c = round(col("value") * 100).cast("bigint")
        Tables.events(s, d)
          .select((us.cast("bigint") / lit(3600000000L)).cast("bigint").as("hr"),
                  us.as("us"), col("event_id"), c.as("c"))
          .groupBy("hr")
          .agg(min(struct(col("us"), col("event_id"), col("c")))("c").as("open"),
               max(col("c")).as("high"), min(col("c")).as("low"),
               max(struct(col("us"), col("event_id"), col("c")))("c").as("close"),
               count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .orderBy("hr")
      },
      Some("""WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c
             |           FROM events)
             |SELECT us // 3600000000 AS hr,
             |       (min({'u': us, 'e': event_id, 'c': c})).c AS open,
             |       max(c) AS high, min(c) AS low,
             |       (max({'u': us, 'e': event_id, 'c': c})).c AS close,
             |       count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
             |FROM e GROUP BY 1 ORDER BY hr""".stripMargin)),

    // Grouped weighted median (lower): per return flag, the smallest
    // extended-price cent value whose cumulative quantity weight reaches
    // half the group total. The data-scale path is the bounded
    // distinct-cents grid again — per-(flag, cents) integer weight sums,
    // one flag-partitioned cumulative window over the grid, and the pick
    // is min-over-qualifying (2·cum ≥ tot with INTEGER comparison — no
    // interpolated quantile ever crosses engines tie-exactly; memory:
    // quantile ulp ties).
    "agg_weighted_median" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("l_returnflag").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val grid = Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("cents"),
                  col("l_quantity").cast("bigint").as("qty"))
          .groupBy("l_returnflag", "cents")
          .agg(sum(col("qty")).as("wsum"))
        // group totals as a broadcast-joined 3-row aggregate, NOT a
        // whole-partition window — the frameless window would buffer the
        // entire near-unique price grid per flag before emitting a row
        val tot = grid.groupBy("l_returnflag").agg(sum(col("wsum")).as("tot"))
        grid
          .select(col("l_returnflag"), col("cents"),
                  sum(col("wsum")).over(w).as("cum"))
          .join(broadcast(tot), "l_returnflag")
          .filter(lit(2L) * col("cum") >= col("tot"))
          .groupBy("l_returnflag")
          .agg(min(col("cents")).as("wmedian_cents"), max(col("tot")).as("qty_total"))
          .orderBy("l_returnflag")
      },
      Some("""WITH grid AS (SELECT l_returnflag,
             |                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |                sum(CAST(l_quantity AS BIGINT)) AS wsum
             |              FROM lineitem GROUP BY 1, 2),
             |cw AS (SELECT l_returnflag, cents,
             |         sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents
             |                         ROWS UNBOUNDED PRECEDING) AS cum,
             |         sum(wsum) OVER (PARTITION BY l_returnflag) AS tot
             |       FROM grid)
             |SELECT l_returnflag, min(cents) AS wmedian_cents,
             |       CAST(max(tot) AS BIGINT) AS qty_total
             |FROM cw WHERE 2 * cum >= tot
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // BPE merge LEARNING — tokenizer training as a distributed pipeline
    // (text_bpe_token_count APPLIES a fixed merge list; this derives one).
    // The scale design: all per-iteration work runs on the DISTINCT-word
    // frequency table (bounded by vocabulary — ~10⁶ rows for a real
    // corpus — never corpus-sized), symbols ride the paren-encoded string
    // form where one ranked merge application IS a literal replace()
    // (memory: BPE replace-chain — exact because merge operands only come
    // from lower ranks), and each iteration collects exactly ONE argmax
    // row to the driver (count desc, pattern asc on the ASCII-only
    // alphabet, so both engines' orderings are binary-identical). Six
    // unrolled iterations mirror as six DuckDB CTE stages running the
    // REAL algorithm.
    "text_bpe_learn_merges" -> Decl(
      (s, d) => {
        import s.implicits._
        val vocab = Tables(s, d, "documents")
          .select(explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+$") && length(col("w")).between(2, 12))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          // Spark split on '' keeps a trailing empty capture (Java regex
          // limit -1); DuckDB string_split does not — filter it so both
          // engines encode "(a)(b)(c)" identically
          .select(expr(
            "concat('(', array_join(filter(split(w, ''), x -> x <> ''), ')('), ')')")
            .as("e"), col("cnt"))
          .localCheckpoint(true)
        var cur = vocab
        val merges = Seq.newBuilder[(Int, String, Long)]
        for (i <- 1 to 6) {
          val top = cur
            .select(col("cnt"),
                    split(expr("substring(e, 2, length(e) - 2)"), "\\)\\(").as("sy"))
            .select(col("cnt"), explode(expr(
              "transform(slice(sy, 1, size(sy) - 1), (x, j) -> struct(x AS a, sy[j + 1] AS b))"))
              .as("pr"))
            .groupBy(concat(lit("("), col("pr.a"), lit(")("), col("pr.b"), lit(")"))
                       .as("pat"),
                     concat(lit("("), col("pr.a"), col("pr.b"), lit(")")).as("rep"))
            .agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("pat"))
            .limit(1).collect()(0)
          val (pat, rep) = (top.getAs[String]("pat"), top.getAs[String]("rep"))
          merges += ((i, pat, top.getAs[Long]("c")))
          // [a-z()] alphabet only — safe to inline in the SQL literal
          cur = cur.withColumn("e", expr(s"replace(e, '$pat', '$rep')"))
            .localCheckpoint(true)
        }
        merges.result().toDF("rank", "merge", "cnt").orderBy("rank")
      },
      Some {
        val base =
          """WITH w0 AS (
            |  SELECT '(' || array_to_string(string_split(w, ''), ')(') || ')' AS e,
            |         cnt
            |  FROM (SELECT w, count(*) AS cnt FROM (
            |          SELECT unnest(string_split(lower(text), ' ')) AS w
            |          FROM documents) t
            |        WHERE regexp_matches(w, '^[a-z]+$')
            |          AND len(w) BETWEEN 2 AND 12
            |        GROUP BY w))""".stripMargin
        val stages = (1 to 6).map { i =>
          s""",
            |p$i AS (SELECT '(' || l[i] || ')(' || l[i+1] || ')' AS pat,
            |              '(' || l[i] || l[i+1] || ')' AS rep, sum(cnt) AS c
            |       FROM (SELECT string_split(e[2:len(e)-1], ')(') AS l, cnt
            |             FROM w${i - 1}),
            |            LATERAL unnest(range(1, len(l))) AS t(i)
            |       GROUP BY 1, 2),
            |m$i AS (SELECT $i AS rank, pat, rep, c FROM p$i
            |       ORDER BY c DESC, pat LIMIT 1),
            |w$i AS (SELECT replace(e, m.pat, m.rep) AS e, cnt FROM w${i - 1}, m$i m)"""
            .stripMargin
        }.mkString
        val union = (1 to 6).map(i =>
          s"SELECT CAST(rank AS INTEGER) AS rank, pat AS merge, CAST(c AS BIGINT) AS cnt FROM m$i")
          .mkString("\n", "\nUNION ALL\n", "\nORDER BY rank")
        base + stages + union
      }),

    // Dynamic partition pruning — the other half of the layout story
    // (join_bucketed_colocated kills the shuffle; DPP kills the SCAN):
    // the fact table is written day-partitioned, the dim side carries a
    // selective filter, and Catalyst injects a dynamicpruning subquery so
    // the fact scan reads ONLY the day partitions the dim survives — at
    // 100 TB that is reading 1/7th of the table instead of filtering
    // 7/7ths post-scan. ScaleSpec pins the dynamicpruningexpression in
    // the fact scan's partition filters.
    "join_partition_pruned" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_dpp")
        val ev = Tables.events(s, d)
          .select(col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"),
                  datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"))
        ev.write.partitionBy("day").parquet(dir.resolve("fact").toString)
        val fact = s.read.parquet(dir.resolve("fact").toString)
        val dim = ev.select(col("day")).distinct()
          .filter(pmod(col("day"), lit(7)) === 0)
        fact.join(dim, "day")
          .groupBy("day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .select(col("day").cast("int").as("day"), col("n"), col("cents"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events)
             |SELECT day, count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
             |FROM ev WHERE day % 7 = 0
             |GROUP BY day ORDER BY day""".stripMargin)),

    // Grouped OLS regression (value-cents against the day index, per
    // event type) — slope/intercept/r² from the five exact BIGINT
    // sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²); each OUTPUT row's
    // formula reads only its own group's scalars, so it is a per-row
    // fixed double tree (no cross-row float aggregation anywhere — the
    // R11 discipline without even needing the pivot). Products like
    // Σx·Σy exceed int64, so the FORMULA runs in double; the SUMS never
    // do. Lossless partial aggregation at any scale.
    "agg_linreg" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
                  datediff(col("ts").cast("date"), lit("1970-01-01"))
                    .cast("bigint").as("x"),
                  round(col("value") * 100).cast("bigint").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
               sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
               sum(col("x") * col("x")).as("sxx"),
               sum(col("y") * col("y")).as("syy"))
          .selectExpr("event_type", "n",
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
              |AS slope""".stripMargin,
            """round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
              |       ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))) /
              |      CAST(n AS DOUBLE), 6) AS intercept""".stripMargin,
            """round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
              |       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) /
              |      ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              |       (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
              |AS r2""".stripMargin)
          .orderBy("event_type")
      },
      Some("""WITH st AS (SELECT event_type, count(*) AS n,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) AS sx,
             |  sum(CAST(round(value * 100) AS BIGINT)) AS sy,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) *
             |      CAST(round(value * 100) AS BIGINT)) AS sxy,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) *
             |      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) AS sxx,
             |  sum(CAST(round(value * 100) AS BIGINT) *
             |      CAST(round(value * 100) AS BIGINT)) AS syy
             |FROM events GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             |    AS slope,
             |  round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
             |         ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |          (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))) /
             |        CAST(n AS DOUBLE), 6) AS intercept,
             |  round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
             |         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) /
             |        ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             |    AS r2
             |FROM st ORDER BY event_type""".stripMargin)),

    // Incremental aggregate maintenance — the materialized-view pattern:
    // a standing per-(type, day) aggregate parquet is MERGED with the
    // delta days' aggregate by re-aggregating the union of partial
    // states (sum-of-sums, sum-of-counts). Exact because the sufficient
    // statistics are integers (count, cents) — the same losslessness
    // that lets a 100 TB pipeline maintain aggregates per-partition
    // instead of recomputing history. The oracle is the full aggregate:
    // merge(partials) == aggregate(all) is the tested contract.
    "sink_incremental_agg" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"),
          round(col("value") * 100).cast("bigint").as("c"))
        val cut = ev.agg(min(col("day"))).head.getInt(0) + 15
        val dir = Tables.scratchDir("graft_incragg")
        ev.filter(col("day") < cut).groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .write.parquet(dir.resolve("state").toString)
        val state = s.read.parquet(dir.resolve("state").toString)
        val delta = ev.filter(col("day") >= cut).groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
        state.unionAll(delta)
          .groupBy("event_type", "day")
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type,
             |  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin)),

    // Spearman rank correlation (quantity vs discount) — the nonparametric
    // sibling of agg_corr_covar's Pearson. Midranks handle ties exactly:
    // 2·midrank(v) = 2·cum(v) − c(v) + 1 is an INTEGER computed on each
    // column's bounded distinct-value grid (50 quantities, 11 discounts —
    // broadcast back to rows; never a global rank window over the corpus),
    // and the six sufficient sums (n, Σx, Σy, Σx², Σy², Σxy over doubled
    // ranks) stay exact BIGINTs. ρ is one fixed double tree over those
    // scalars (n·Σxy overflows int64, so the FORMULA runs in double — the
    // SUMS never do; at SF ≳ 1 the squared sums would widen to
    // DECIMAL(38), same plan shape), with the 6-dp round absorbing
    // terminal ulp noise.
    "agg_spearman_corr" -> Decl(
      (s, d) => {
        def rankGrid(src: org.apache.spark.sql.DataFrame, vcol: String) = {
          val w = Window.orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          src.groupBy(vcol).agg(count(lit(1)).as("c"))
            .select(col(vcol),
                    (lit(2L) * sum(col("c")).over(w) - col("c") + 1L).as(s"r_$vcol"))
        }
        val li = Tables(s, d, "lineitem")
          .select(col("l_quantity").cast("bigint").as("q"),
                  round(col("l_discount") * 100).cast("bigint").as("disc"))
        val ranked = li
          .join(broadcast(rankGrid(li, "q")), "q")
          .join(broadcast(rankGrid(li, "disc")), "disc")
        ranked
          .agg(count(lit(1)).as("n"),
               sum(col("r_q")).as("sx"), sum(col("r_disc")).as("sy"),
               sum(col("r_q") * col("r_q")).as("sxx"),
               sum(col("r_disc") * col("r_disc")).as("syy"),
               sum(col("r_q") * col("r_disc")).as("sxy"))
          .selectExpr("n",
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              | sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
              |AS rho""".stripMargin)
      },
      Some("""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
             |              CAST(round(l_discount * 100) AS BIGINT) AS disc
             |            FROM lineitem),
             |gq AS (SELECT q, 2 * sum(c) OVER (ORDER BY q
             |                ROWS UNBOUNDED PRECEDING) - c + 1 AS r_q
             |       FROM (SELECT q, count(*) AS c FROM li GROUP BY q)),
             |gd AS (SELECT disc, 2 * sum(c) OVER (ORDER BY disc
             |                ROWS UNBOUNDED PRECEDING) - c + 1 AS r_disc
             |       FROM (SELECT disc, count(*) AS c FROM li GROUP BY disc)),
             |r AS (SELECT r_q, r_disc FROM li JOIN gq USING (q)
             |      JOIN gd USING (disc)),
             |st AS (SELECT count(*) AS n,
             |         CAST(sum(r_q) AS BIGINT) AS sx,
             |         CAST(sum(r_disc) AS BIGINT) AS sy,
             |         CAST(sum(r_q * r_q) AS BIGINT) AS sxx,
             |         CAST(sum(r_disc * r_disc) AS BIGINT) AS syy,
             |         CAST(sum(r_q * r_disc) AS BIGINT) AS sxy
             |       FROM r)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |        (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |         sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             |    AS rho
             |FROM st""".stripMargin)),

    // Layered BFS from a seed set over the shared deterministic graph —
    // the reachability/impact query (``which docs sit within 4 hops of
    // the flagged set?``). Frontier-at-a-time: each hop is ONE src-keyed
    // join against the checkpointed adjacency plus an anti-join against
    // the visited set, so per-hop work is O(frontier edges), never
    // all-pairs; distances are small integers and the oracle unrolls the
    // same four hops as CTEs. The adjacency is built once (the LPA/
    // triangle pattern: explicit repartition + localCheckpoint).
    "graph_bfs_layers" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val raw = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                    .cast("int"))).as("k"))
          .select(col("src"), pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
        val canon = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
                  greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val adj = canon.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
          .repartition(n, col("src"))
          .localCheckpoint(true)
        var dist = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
          .select(col("doc_id").as("v"), lit(0).as("dist"))
        var frontier = dist
        (1 to 4).foreach { i =>
          val next = adj.join(frontier, adj("src") === frontier("v"))
            .select(col("dst").as("v")).distinct()
            .join(dist.select(col("v").as("seen")),
                  col("v") === col("seen"), "left_anti")
            .select(col("v"), lit(i).as("dist"))
            .localCheckpoint(true)
          dist = dist.unionAll(next).localCheckpoint(true)
          frontier = next
        }
        val out = dist.select(col("v").as("doc_id"), col("dist")).orderBy("doc_id")
        adj.unpersist()
        out
      },
      Some {
        val b = new StringBuilder(Round8.graphOracleCtes +
          """,
            |d0 AS (SELECT doc_id AS v, 0 AS dist FROM documents
            |       WHERE doc_id % 97 = 0)""".stripMargin)
        (1 to 4).foreach { i =>
          b.append(s""",
            |f$i AS (SELECT DISTINCT adj.dst AS v
            |       FROM d${i - 1} JOIN adj ON d${i - 1}.v = adj.src
            |       WHERE adj.dst NOT IN (SELECT v FROM d${i - 1})),
            |d$i AS (SELECT v, dist FROM d${i - 1}
            |       UNION ALL SELECT v, $i FROM f$i)""".stripMargin)
        }
        b.append("""
          |SELECT v AS doc_id, CAST(dist AS INTEGER) AS dist
          |FROM d4 ORDER BY v""".stripMargin)
        b.toString
      }),

    // Multimodal resize STUB — completes the decode/resize/frame-sample
    // plumbing trio (multimodal_binary_meta, multimodal_frame_sample).
    // A real resize reads the payload at strided offsets per output
    // pixel; the deterministic fake samples 8 bytes at stride n/8 and
    // reduces them, so the Spark-side shape is real: binary column in,
    // per-row batched iteration over a partition, fixed-width feature
    // out. The oracle mirrors byte arithmetic as codepoint arithmetic —
    // valid because this corpus is pure ASCII (asserted: 0 rows where
    // octet_length ≠ len), the same contract multimodal_binary_meta
    // already documents for its head-byte.
    "multimodal_resize_stub" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, payload) =>
              // STUB resize: a real implementation hands `payload` to an
              // image decoder and resamples; the strided byte probe below
              // has the same access pattern and is deterministic.
              val n = payload.length
              val stride = math.max(1, n / 8)
              var sum = 0L; var cnt = 0L
              var k = 0
              while (k < 8) {
                val pos = k * stride
                if (pos < n) { sum += payload(pos) & 0xFF; cnt += 1 }
                k += 1
              }
              (id, n.toLong, sum, cnt)
            }
          }
          .toDF("doc_id", "n_bytes", "feat_sum", "n_sampled")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, len(text) AS n,
             |             greatest(1, len(text) // 8) AS st, text
             |           FROM documents)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
             |  CAST(sum(CASE WHEN 1 + k * st <= n
             |           THEN ascii(substr(text, CAST(1 + k * st AS INTEGER), 1))
             |           ELSE 0 END) AS BIGINT) AS feat_sum,
             |  CAST(sum(CASE WHEN 1 + k * st <= n THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sampled
             |FROM b, LATERAL unnest(range(0, 8)) AS t(k)
             |GROUP BY doc_id, n ORDER BY doc_id""".stripMargin)),

    // Bit-exact truncated EWMA (α = 1/2, depth 8) per user over the event
    // sequence: every weight is a dyadic rational (1/2 … 1/256) and cents
    // ≤ 2¹⁶, so every term AND every partial sum is exactly representable
    // in a double — the sum is order-independent and the two engines agree
    // bit-for-bit with NO rounding step (the general-α EWMA cannot cross
    // engines exactly; the dyadic one can). One window pass, 8 lags, all
    // inside whole-stage codegen. Ordered by event_id (the ingestion
    // sequence): ts carries sub-microsecond digits only DuckDB sees
    // (nanos parquet), so a ts ORDER BY is not cross-engine stable.
    "window_ewma_dyadic" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val c = round(col("value") * 100).cast("bigint")
        val ewma = (0 until 8).map { k =>
          coalesce(lag(c, k).over(w), lit(0L)).cast("double") /
            math.pow(2.0, k + 1)
        }.reduce(_ + _)
        Tables.events(s, d)
          .filter(col("user_id") < 50)
          .select(col("event_id"), col("user_id"), ewma.as("ewma"))
          .orderBy("event_id")
      },
      Some {
        val terms = (0 until 8).map { k =>
          val w = "OVER (PARTITION BY user_id ORDER BY event_id)"
          val c = "CAST(round(value * 100) AS BIGINT)"
          val lagged = if (k == 0) c else s"coalesce(lag($c, $k) $w, 0)"
          s"CAST($lagged AS DOUBLE) / ${math.pow(2.0, k + 1)}"
        }.mkString(" + ")
        s"""SELECT event_id, user_id, $terms AS ewma
           |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin
      }))
}
