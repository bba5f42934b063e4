package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Pure-Scala properties of the round-5 per-row expressions (SURVEY
  * §5.4(a) style, no Spark session): mathematical invariants that must
  * hold for ANY input, complementing SketchParitySpec's fixture-level
  * bit-parity checks.
  */
object SketchProps extends Properties("sketches") {

  private def utf8Array(ws: Seq[String]): ArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val words = Gen.nonEmptyListOf(word)

  // Shannon entropy bounds: 0 <= H <= ln(#distinct chars)
  property("char entropy within [0, ln(alphabet)]") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val h = functions.CharEntropy(null).compute(UTF8String.fromString(s))
      val k = s.toSet.size
      h >= 0.0 && h <= math.log(k.toDouble) + 1e-9
    }

  // A document is a near-duplicate of itself: identical token arrays give
  // identical minhash signatures and simhash signatures (determinism, R8)
  property("identical docs have identical signatures") =
    Prop.forAll(words) { ws =>
      val a = utf8Array(ws); val b = utf8Array(ws)
      val ha = functions.ShingleHashSet(null, 2).compute(a)
      val hb = functions.ShingleHashSet(null, 2).compute(b)
      val sa = functions.MinHashSig(null).compute(ha)
      val sb = functions.MinHashSig(null).compute(hb)
      sa.toLongArray.sameElements(sb.toLongArray) &&
        functions.SimHashSig(null).compute(a) == functions.SimHashSig(null).compute(b)
    }

  // Shingle hash sets are sorted, distinct, and have the right cardinality
  // bound: at most len - n + 1 shingles
  property("shingle hash sets are sorted distinct with bounded size") =
    Prop.forAll(words, Gen.chooseNum(1, 4)) { (ws, n) =>
      val hs = functions.ShingleHashSet(null, n).compute(utf8Array(ws)).toLongArray
      val expectMax = math.max(ws.length - n + 1, 0)
      hs.length <= expectMax &&
        hs.sameElements(hs.sorted) && hs.distinct.length == hs.length
    }

  // Token counts conserve mass: sum of counts == token count, and terms
  // are distinct
  property("token counts conserve token mass") =
    Prop.forAll(words) { ws =>
      val tc = functions.TokenCounts(null).compute(utf8Array(ws))
      var sum = 0L
      val seen = scala.collection.mutable.Set[String]()
      var ok = true
      (0 until tc.numElements()).foreach { i =>
        val row = tc.getStruct(i, 2)
        sum += row.getInt(1)
        ok &&= seen.add(row.getUTF8String(0).toString)
      }
      ok && sum == ws.length
    }

  // SimHash of a single token equals that token's hash-sign pattern: every
  // bit set in the hash votes +1 with n=1, so sig == hash
  property("simhash of one token is its token hash") =
    Prop.forAll(word) { w =>
      val sig = functions.SimHashSig(null).compute(utf8Array(Seq(w)))
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(w), 42L)
      sig == h
    }
}
