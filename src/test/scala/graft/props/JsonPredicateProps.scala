package graft.connector // private[connector] JsonPredicate access

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The laws the connector's driver-side prune rests on:
  *  1. same-type comparisons agree exactly with the reference semantics;
  *  2. type-mismatched comparisons NEVER drop a row (keep-on-uncertainty
  *     — the post-scan Filter is the arbiter);
  *  3. And/Or compose monotonically (a kept conjunct can't drop a row
  *     its parts kept).
  */
object JsonPredicateProps extends Properties("JsonPredicate") {

  private val mapper = new ObjectMapper()
  private def row(v: Any): com.fasterxml.jackson.databind.JsonNode = {
    val n = mapper.createObjectNode()
    v match {
      case l: Long => n.put("k", l)
      case d: Double => n.put("k", d)
      case s: String => n.put("k", s)
      case b: Boolean => n.put("k", b)
      case null => n.putNull("k")
    }
    n
  }

  private val genLong = Gen.chooseNum(-1000L, 1000L)
  private val genStr = Gen.alphaNumStr.map(_.take(8))

  property("same-type numeric comparisons match reference semantics") =
    forAll(genLong, genLong) { (x, v) =>
      val n = row(x)
      Prop.all(
        JsonPredicate.matches(n, EqualTo("k", v)) == (x == v),
        JsonPredicate.matches(n, GreaterThan("k", v)) == (x > v),
        JsonPredicate.matches(n, GreaterThanOrEqual("k", v)) == (x >= v),
        JsonPredicate.matches(n, LessThan("k", v)) == (x < v),
        JsonPredicate.matches(n, LessThanOrEqual("k", v)) == (x <= v))
    }

  property("same-type string comparisons match reference semantics") =
    forAll(genStr, genStr) { (x, v) =>
      val n = row(x)
      Prop.all(
        JsonPredicate.matches(n, EqualTo("k", v)) == (x == v),
        JsonPredicate.matches(n, StringStartsWith("k", v)) == x.startsWith(v),
        JsonPredicate.matches(n, StringEndsWith("k", v)) == x.endsWith(v),
        JsonPredicate.matches(n, StringContains("k", v)) == x.contains(v))
    }

  private val anyValue: Gen[Any] = Gen.oneOf(
    genLong.map(x => x: Any), genStr.map(x => x: Any),
    Gen.oneOf(true, false).map(x => x: Any))

  property("type-mismatched comparisons never drop a row") =
    forAll(anyValue, anyValue) { (nodeV, filterV) =>
      val mismatched = (nodeV, filterV) match {
        case (_: Long, _: Long) | (_: String, _: String) |
             (_: Boolean, _: Boolean) => false
        case _ => true
      }
      !mismatched || (
        JsonPredicate.matches(row(nodeV), EqualTo("k", filterV)) &&
        JsonPredicate.matches(row(nodeV), GreaterThan("k", filterV)) &&
        JsonPredicate.matches(row(nodeV), In("k", Array(filterV))))
    }

  property("And/Or compose monotonically with their parts") =
    forAll(genLong, genLong, genLong) { (x, a, b) =>
      val n = row(x)
      val f1: Filter = GreaterThan("k", a)
      val f2: Filter = LessThan("k", b)
      val m1 = JsonPredicate.matches(n, f1)
      val m2 = JsonPredicate.matches(n, f2)
      Prop.all(
        JsonPredicate.matches(n, And(f1, f2)) == (m1 && m2),
        JsonPredicate.matches(n, Or(f1, f2)) == (m1 || m2))
    }

  property("missing or null fields keep rows for comparisons, honor null checks") =
    forAll(genLong) { v =>
      val nullRow = row(null)
      Prop.all(
        JsonPredicate.matches(nullRow, EqualTo("k", v)), // null → uncertain → keep
        JsonPredicate.matches(nullRow, IsNull("k")),
        !JsonPredicate.matches(nullRow, IsNotNull("k")),
        JsonPredicate.matches(nullRow, EqualTo("missing", v)), // absent field → keep
        JsonPredicate.matches(nullRow, IsNull("missing")))
    }
}
