package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Dense-vector math over `ARRAY<FLOAT>` columns as pure higher-order-
  * function expressions (codegen'd, no UDF). All arithmetic is promoted
  * float→double inside the lambdas so results match engines that compute
  * in double end-to-end.
  *
  * 100 TB path: these are per-row expressions — they scan-parallelize
  * trivially. For top-k neighbor search over billions of vectors, pair
  * them with the LSH bucketing in `graft.operators.Minhash` / an IVF
  * routing table so the candidate set per query is bounded, then apply
  * `cosine` only to candidates (see `sim_ann_lsh`).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double — the codegen'd `FloatDotProduct` expression (same
    * element order and promotion as the HOF formulation it replaced, so
    * results are bit-identical; ~2 orders of magnitude faster per pair
    * because the loop stays inside whole-stage codegen).
    */
  def dot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; null-safe on zero norms is the caller's
    * concern (fixture vectors are never zero).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** `ARRAY<INT>` of packed SRP-LSH bucket keys (one per band of
    * `bitsPerTable` planes) — all projections in one codegen'd loop; see
    * `SrpBucketKeys`.
    */
  def srpBuckets(v: Column, planes: Array[Array[Float]], bitsPerTable: Int): Column =
    Bridge.column(SrpBucketKeys(Bridge.expression(v), planes, bitsPerTable))

  /** Nearest-centroid cell id (max rounded cosine, ties to lowest id) as a
    * scan-speed projection; see `CentroidAssign`.
    */
  def centroidAssign(v: Column, cids: Array[Int], centroids: Array[Array[Float]]): Column =
    Bridge.column(CentroidAssign(Bridge.expression(v), cids, centroids))

  /** ‖v − b‖₂ against a constant double vector, bit-exact with the
    * zip_with+aggregate fold it replaces; see `EuclideanToConst`.
    */
  def euclideanToConst(v: Column, b: Seq[Double]): Column =
    Bridge.column(EuclideanToConst(Bridge.expression(v), b.toArray))
}
