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
      val sa = functions.MinHashSig(null).compute(ha).asInstanceOf[ArrayData]
      val sb = functions.MinHashSig(null).compute(hb).asInstanceOf[ArrayData]
      // sub-n-token docs have NO signature (null, round-6 semantics) —
      // identical inputs must then be identically null
      val sigEq =
        if (sa == null || sb == null) sa == null && sb == null
        else sa.toLongArray.sameElements(sb.toLongArray)
      sigEq &&
        functions.SimHashSig(null).compute(a) == functions.SimHashSig(null).compute(b)
    }

  // SQL-exposed edge semantics (ADVICE round 5): an empty hash set has NO
  // minhash signature (null, never the sentinel minima that would band-
  // collide every short doc), and null elements drop out of every sketch
  // exactly like the exploded form's null rows
  property("minhash of empty set is null; null elements are skipped") =
    Prop.forAll(words) { ws =>
      val empty = functions.MinHashSig(null)
        .compute(new GenericArrayData(Array.emptyLongArray))
      val withNulls = new GenericArrayData(
        (ws.map(w => UTF8String.fromString(w): Any) :+ (null: Any)).toArray)
      val tcA = functions.TokenCounts(null).compute(withNulls)
      val tcB = functions.TokenCounts(null).compute(utf8Array(ws))
      empty == null &&
        tcA.numElements() == tcB.numElements() &&
        functions.SimHashSig(null).compute(withNulls) ==
          functions.SimHashSig(null).compute(utf8Array(ws)) &&
        functions.MinHashSig(null)
          .compute(new GenericArrayData(Array[Any](null, null))) == null
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

  private val vec = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0f))
  private def floatArray(v: Seq[Float]): ArrayData =
    new GenericArrayData(v.toArray[Any])

  // CentroidAssign invariants: a vector containing one of the centroids
  // assigns to that centroid's cell (cosine 1.0 beats everything except an
  // exact tie, which breaks to the lowest cid — also covered); dimension
  // mismatch is null, never a silent prefix assignment
  property("a centroid assigns to its own cell (ties to lowest cid)") =
    Prop.forAll(Gen.listOfN(3, vec.suchThat(_.exists(_ != 0f))), Gen.chooseNum(0, 2)) {
      (cents, pick) =>
        val distinct = cents.map(_.toArray)
        val e = functions.CentroidAssign(null, Array(10, 20, 30), distinct.toArray)
        val got = e.compute(floatArray(cents(pick)))
        // the picked centroid scores cosine 1.0; any centroid that is a
        // positive scalar multiple ties and the LOWEST cid must win
        val tied = cents.zipWithIndex.filter { case (c, _) =>
          val a = cents(pick); val dot = a.zip(c).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x).sum)
          val nc = math.sqrt(c.map(x => x.toDouble * x).sum)
          math.abs(dot / (na * nc) - 1.0) < 1e-7
        }.map(p => (p._2 + 1) * 10)
        got == tied.min
    }

  property("centroid assignment rejects dimension mismatch with null") =
    Prop.forAll(vec) { v =>
      val e = functions.CentroidAssign(null, Array(1), Array(Array.fill(16)(1.0f)))
      e.compute(floatArray(v)) == null
    }

  // Bloom probe has NO false negatives: everything put in is found
  property("bloom probe never misses an inserted key") =
    Prop.forAll(Gen.nonEmptyListOf(word)) { ws =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(10000, 0.01)
      ws.foreach(w => bf.putBinary(w.getBytes("UTF-8")))
      val e = functions.BloomMightContain(null, bf)
      ws.forall(w => e.compute(UTF8String.fromString(w)))
    }

  // BPE invariants (round 7): merging only ever SHRINKS the symbol count,
  // never below one symbol per word and never above one per character —
  // and a text's count is exactly the sum of its words' counts (the fold
  // never crosses whitespace).
  property("BPE word count within [1, word length]") =
    Prop.forAll(word) { w =>
      val n = functions.BpeOps.countWord(w)
      n >= 1 && n <= w.length
    }

  property("BPE text count is the sum of word counts") =
    Prop.forAll(words) { ws =>
      val t = ws.mkString(" ")
      functions.BpeOps.countText(UTF8String.fromString(t)) ==
        ws.map(functions.BpeOps.countWord).sum
    }

  // (Concatenation is NOT subadditive — probed: "at"+"colu" counts 3 > 1+1,
  // because the cross-boundary (at,c) merge outranks and blocks the
  // (c,o)(co,lu) chain. Greedy ranked BPE only guarantees the two
  // invariants above.)
}
