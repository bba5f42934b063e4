package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import scala.util.hashing.MurmurHash3

/** SURVEY §5.4(a): pure-Scala properties of the MinHash estimator and the
  * banding schemes, independent of Spark (the Spark pipeline's recall is
  * asserted separately in OperatorSpec against planted pairs).
  */
object MinhashProps extends Properties("minhash") {

  private val NumPerms = 32

  private def minhashSig(set: Set[String]): IndexedSeq[Int] =
    (0 until NumPerms).map(seed => set.map(s => MurmurHash3.stringHash(s, seed)).min)

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private val tokenGen = Gen.oneOf((0 until 60).map(i => s"tok$i"))
  private val setGen: Gen[Set[String]] = Gen.chooseNum(10, 40).flatMap(n =>
    Gen.containerOfN[Set, String](n, tokenGen))

  // Estimator accuracy: matching-min fraction ≈ true Jaccard. With 32
  // permutations the standard error is ≤ sqrt(J(1-J)/32) ≤ 0.09, so a 0.4
  // tolerance is ~4.4σ — stable under ScalaCheck's random seeds.
  property("signature agreement estimates Jaccard within 0.4") =
    Prop.forAll(setGen, setGen) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val est = minhashSig(a).zip(minhashSig(b)).count { case (x, y) => x == y }.toDouble / NumPerms
        math.abs(est - jaccard(a, b)) < 0.4
      }
    }

  // Identical sets always collide in every band (determinism/R8).
  property("equal sets have identical signatures") =
    Prop.forAll(setGen) { a => a.nonEmpty ==> (minhashSig(a) == minhashSig(a)) }

  // SimHash banding pigeonhole: any 64-bit pair within hamming 3 shares at
  // least one of the 4 16-bit bands — the guarantee dedup_simhash's
  // candidate generation relies on.
  property("hamming<=3 implies a shared 16-bit band") =
    Prop.forAll(Gen.long, Gen.containerOfN[List, Int](3, Gen.chooseNum(0, 63))) {
      (sig, flips) =>
        val other = flips.foldLeft(sig)((s, i) => s ^ (1L << i))
        val bands = (0 until 4).map(b => ((sig >>> (16 * b)) & 0xFFFF, (other >>> (16 * b)) & 0xFFFF))
        bands.exists { case (x, y) => x == y }
    }
}
