package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextHash

/** ScalaCheck properties over the pure sketch/text kernels (SURVEY.md
  * §5c): invariants that must hold for any input, not just fixtures. */
object TextHashProps extends Properties("TextHash") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("h32 is a 32-bit unsigned value") = forAll(word) { w =>
    val h = TextHash.h32(w)
    h >= 0L && h <= 0xffffffffL
  }

  property("h32 is deterministic") = forAll(word) { w =>
    TextHash.h32(w) == TextHash.h32(w)
  }

  property("shingles have exactly 3 tokens and are distinct") =
    forAll(text) { t =>
      val sh = TextHash.shingles(t)
      sh.forall(_.split(" ", -1).length == 3) && sh.distinct.length == sh.length
    }

  property("shingle count bounded by token count - 2") = forAll(text) { t =>
    TextHash.shingles(t).length <= math.max(0, TextHash.tokens(t).length - 2)
  }

  property("minhash signature is permutation-invariant (set semantics)") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      val a = hs.toArray
      val b = scala.util.Random.shuffle(hs).toArray
      TextHash.minhashSig(a).toSeq == TextHash.minhashSig(b).toSeq
    }

  property("identical hash sets share every minhash band") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      TextHash.minhashBands(hs.toArray) == TextHash.minhashBands(hs.toArray)
    }

  property("simhash of identical multisets is identical (hamming 0)") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      val a = TextHash.simhash32(hs.toArray)
      val b = TextHash.simhash32(scala.util.Random.shuffle(hs).toArray)
      java.lang.Long.bitCount(a ^ b) == 0
    }

  property("simhash stays within 32 bits") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      (TextHash.simhash32(hs.toArray) >>> 32) == 0L
    }
}

/** Freshness-operator property from SURVEY §5c: staleness is monotone
  * in the bound — relaxing the freshness window can only shrink the
  * violation set. Checked on the pure predicate (timestamps as longs). */
object FreshnessProps extends Properties("Freshness") {
  private val ts = Gen.choose(0L, 4102444800L)
  property("stale-set monotone in bound") =
    forAll(ts, ts, ts) { (lastSeen, b1, b2) =>
      val lo = math.min(b1, b2); val hi = math.max(b1, b2)
      // stale under the tighter (earlier) bound implies stale under the later
      !(lastSeen < lo) || (lastSeen < hi) || lo == hi
    }
}
