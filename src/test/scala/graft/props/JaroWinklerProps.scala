package graft.props

import graft.functions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property layer for the native Jaro–Winkler expression: the metric
  * axioms must hold for ARBITRARY strings, not just the fixture corpus
  * — a similarity used as a join predicate that violated symmetry or
  * bounds would silently corrupt linkage results. Pure JVM — drives
  * the static scorer directly, no Spark session. */
object JaroWinklerProps extends Properties("JaroWinkler") {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  // short ASCII identifier-ish strings: the record-linkage regime
  // (names, codes), including empties and heavy character reuse
  private val genStr: Gen[String] = Gen.frequency(
    6 -> Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString).flatMap(s =>
      Gen.choose(0, 8).map(s.take)),
    2 -> Gen.listOfN(12, Gen.oneOf('a', 'b', 'c')).map(_.mkString),
    1 -> Gen.const(""))

  property("bounded in [0, 1]") = forAll(genStr, genStr) { (a, b) =>
    val s = jw(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("symmetric") = forAll(genStr, genStr) { (a, b) =>
    jw(a, b) == jw(b, a)
  }

  property("identity scores exactly 1") = forAll(genStr) { a =>
    jw(a, a) == 1.0
  }

  property("disjoint alphabets score exactly 0") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf('a', 'b')).map(_.mkString),
      Gen.nonEmptyListOf(Gen.oneOf('x', 'y')).map(_.mkString)) { (a, b) =>
      jw(a, b) == 0.0
    }

  /** Independent naive reimplementation (textbook definition, written
    * index-at-a-time rather than the scorer's scan form) — random
    * agreement with it pins the algorithm, not just the axioms. */
  private def naive(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = Array.fill(l2)(false)
    val matched1 = (0 until l1).map { i =>
      ((math.max(0, i - win)) until math.min(l2, i + win + 1)).find(j =>
        !used(j) && s1(i) == s2(j)) match {
        case Some(j) => used(j) = true; Some(j)
        case None => None
      }
    }
    val m = matched1.count(_.isDefined)
    if (m == 0) return 0.0
    val aChars = (0 until l1).filter(matched1(_).isDefined).map(s1)
    val bChars = (0 until l2).filter(used).map(s2)
    val t = aChars.zip(bChars).count { case (x, y) => x != y } / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      val p = s1.zip(s2).take(4).takeWhile { case (x, y) => x == y }.size
      j + 0.1 * p * (1.0 - j)
    } else j
  }

  property("agrees with an independent textbook reimplementation") =
    forAll(genStr, genStr) { (a, b) =>
      math.abs(jw(a, b) - naive(a, b)) < 1e-12
    }
}
