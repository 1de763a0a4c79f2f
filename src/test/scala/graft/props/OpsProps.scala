package graft.ops // private[ops] access not needed, but keeps props near the ops

import graft.functions.RollingHash
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic properties of the custom operators — the laws that make
  * them distribution-safe:
  *  - TopKByScore's merge must agree with global sort-take for ANY
  *    partitioning of the input (this is what guarantees the
  *    map-side-combine plan computes the same answer as a single-node
  *    pass);
  *  - RollingHash must satisfy the Rabin–Karp composition law (what
  *    makes it a ROLLING hash rather than an arbitrary digest).
  */
object OpsProps extends Properties("GraftOps") {

  private val genScored: Gen[Scored] = for {
    id <- Gen.chooseNum(0L, 500L)
    score <- Gen.chooseNum(-100.0, 100.0)
  } yield Scored(id, score)

  private def referenceTopK(xs: Seq[Scored], k: Int): List[Scored] =
    xs.sortBy(s => (-s.score, s.vec_id)).take(k).toList

  property("TopKByScore over any partitioning == global sort-take") =
    forAll(Gen.listOf(genScored), Gen.chooseNum(1, 12),
      Gen.chooseNum(1, 6)) { (xs, k, nParts) =>
      val agg = new TopKByScore(k)
      // partition arbitrarily, reduce each, then left-fold merge
      val parts = xs.grouped(math.max(1, xs.length / nParts + 1)).toList
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == referenceTopK(xs, k)
    }

  property("TopKByScore merge is commutative") =
    forAll(Gen.listOf(genScored), Gen.listOf(genScored), Gen.chooseNum(1, 8)) {
      (a, b, k) =>
        val agg = new TopKByScore(k)
        val ba = a.foldLeft(agg.zero)(agg.reduce)
        val bb = b.foldLeft(agg.zero)(agg.reduce)
        agg.merge(ba, bb) == agg.merge(bb, ba)
    }

  private val genAscii: Gen[String] = Gen.listOf(Gen.choose(32.toChar, 126.toChar))
    .map(_.mkString)

  private def h(s: String): Long = RollingHash.hash(UTF8String.fromString(s))

  property("RollingHash composition: h(a++b) = (h(a)*B^|b| + h(b)) mod M") =
    forAll(genAscii, genAscii) { (a, b) =>
      var pow = 1L
      b.foreach(_ => pow = pow * RollingHash.Base % RollingHash.Mod)
      val composed =
        ((h(a) * BigInt(pow)) % RollingHash.Mod + h(b)) % RollingHash.Mod
      Prop(h(a + b) == composed.toLong) :| s"a=$a b=$b"
    }

  property("RollingHash stays within [0, M)") =
    forAll(genAscii) { s =>
      val v = h(s)
      v >= 0L && v < RollingHash.Mod
    }
}
