package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst `Expression` —
  * the record-linkage scoring primitive Spark lacks (it ships only
  * `levenshtein`). Standard constants: match window max(|a|,|b|)/2 − 1,
  * prefix scale 0.1 over ≤ 4 chars, boost threshold 0.7 — the same
  * algorithm DuckDB's `jaro_winkler_similarity` implements, which is
  * what makes the oracle a true cross-engine check (probed bit-identical
  * on the fixture corpus before rounding).
  *
  * Codegen calls the static scorer below — one virtual-free static call
  * per row inside whole-stage codegen, no boxing, no SerDe; the two
  * scratch boolean arrays are O(|a|+|b|) and short-lived (names/titles,
  * not documents). Operates on UTF-8 BYTES, so similarity is specified
  * over ASCII corpora exactly like [[RollingHash]]'s fold contract.
  */
final case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two string arguments, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private val PrefixScale = 0.1
  private val BoostThreshold = 0.7
  private val MaxPrefix = 4

  /** Static scorer shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order, counted pairwise
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > BoostThreshold) {
      var p = 0
      val lim = math.min(math.min(l1, l2), MaxPrefix)
      while (p < lim && s1(p) == s2(p)) p += 1
      jaro + PrefixScale * p * (1.0 - jaro)
    } else jaro
  }
}
