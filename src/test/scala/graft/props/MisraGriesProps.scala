package graft.props

import graft.ops.MisraGries
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** SURVEY §5.4 property layer for the frequent-items sketch: the
  * Misra–Gries guarantee must hold for ARBITRARY streams and ARBITRARY
  * partition/merge shapes (the distributed-aggregation degrees of
  * freedom Spark exercises at scale), not just the corpus fixture:
  *  - ≤ k counters at all times;
  *  - no item over-counted;
  *  - per-item undercount ≤ n/(k+1);
  *  - hence every item with true frequency > n/(k+1) is present.
  * Pure JVM — drives reduce/merge directly, no Spark session. */
object MisraGriesProps extends Properties("MisraGries") {

  private val genK = Gen.choose(2, 12)

  // skew mix: few hot items dominate a long tail — the regime the
  // sketch exists for (uniform streams have no heavy hitters to lose)
  private val genItem: Gen[String] = Gen.frequency(
    8 -> Gen.choose(0, 2).map(i => s"h$i"),
    3 -> Gen.choose(0, 40).map(i => s"t$i"))

  private val genStream = Gen.choose(50, 1500)
    .flatMap(n => Gen.listOfN(n, genItem))

  // random chunk boundaries = random partitioning of the stream
  private def chunks(xs: List[String], cuts: List[Int]): List[List[String]] =
    cuts.sorted.distinct.foldRight(List(xs)) { (c, acc) =>
      val (pre, post) = acc.head.splitAt(math.min(c, acc.head.size))
      pre :: post :: acc.tail
    }.filter(_.nonEmpty)

  property("guarantee survives any partitioning and left-fold merge order") =
    forAll(genK, genStream, Gen.listOf(Gen.choose(0, 1500))) { (k, stream, cuts) =>
      val mg = new MisraGries(k)
      val parts = chunks(stream, cuts)
      val summaries = parts.map(_.foldLeft(mg.zero)(mg.reduce))
      summaries.forall(_.size <= k) && {
        val merged = summaries.foldLeft(mg.zero)(mg.merge)
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = stream.size.toDouble
        val bound = n / (k + 1)
        merged.size <= k &&
          merged.forall { case (t, c) => c <= exact(t) } &&
          merged.forall { case (t, c) => exact(t) - c <= bound } &&
          exact.forall { case (t, c) => c <= bound || merged.contains(t) }
      }
    }

  property("merging a summary with empty is identity-safe") =
    forAll(genK, genStream) { (k, stream) =>
      val mg = new MisraGries(k)
      val s = stream.foldLeft(mg.zero)(mg.reduce)
      mg.merge(s, mg.zero) == s && mg.merge(mg.zero, s) == s
    }
}
