package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial rolling hash of a string — the
  * document-fingerprinting primitive (h = Σ byte·B^i mod M, computed as a
  * left fold `h = (h·B + byte) mod M`). Native Catalyst `Expression`
  * WITH `doGenCode`, so it runs inside whole-stage codegen rather than as
  * a black-box UDF: the generated Java is a tight per-byte loop over the
  * UTF8String's bytes, no boxing, no SerDe.
  *
  * Base/modulus (31, 1e9+7) are the textbook Rabin–Karp constants; the
  * fold is reproducible in any engine that can iterate characters (the
  * DuckDB oracle folds `ascii()` codes — identical for ASCII corpora,
  * which is what the hash is specified over).
  */
final case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${RollingHash.Base}L + ($bytes[$i] & 0xffL)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 31L
  val Mod = 1000000007L

  /** Interpreted fallback (must match the generated code bit-for-bit). */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }
}

/** Registration for graft's native functions.
  *
  * Two paths:
  *  - cluster / spark-submit: `--conf spark.sql.extensions=
  *    graft.functions.GraftExtensions` — the idiomatic
  *    `SparkSessionExtensions` hook;
  *  - library / existing session: `GraftFunctions.register(spark)`.
  *
  * Either way `rolling_hash(str)` and `vec_dot(a, b)` resolve in SQL
  * and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach(ext.injectFunction)
}

object GraftFunctions {
  private[functions] val rollingHashSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) =>
      if (children.length == 1) RollingHash(children.head)
      else throw new IllegalArgumentException(
        s"rolling_hash requires exactly 1 argument, got ${children.length}"))

  private[functions] val vecDotSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) =>
      if (children.length == 2) VecDot(children.head, children(1))
      else throw new IllegalArgumentException(
        s"vec_dot requires exactly 2 arguments, got ${children.length}"))

  private[functions] val nfcSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) =>
      if (children.length == 1) NfcNormalize(children.head)
      else throw new IllegalArgumentException(
        s"nfc_normalize requires exactly 1 argument, got ${children.length}"))

  private[functions] val jaroWinklerSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[Expression]) =>
      if (children.length == 2) JaroWinkler(children.head, children(1))
      else throw new IllegalArgumentException(
        s"jaro_winkler requires exactly 2 arguments, got ${children.length}"))

  private[functions] val winnowSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_prints"),
    new ExpressionInfo(classOf[WinnowPrints].getName, "winnow_prints"),
    (children: Seq[Expression]) =>
      if (children.length == 1) WinnowPrints(children.head)
      else throw new IllegalArgumentException(
        s"winnow_prints requires exactly 1 argument, got ${children.length}"))

  private[functions] val charGramsSpec
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_grams"),
    new ExpressionInfo(classOf[CharGrams].getName, "char_grams"),
    (children: Seq[Expression]) => children match {
      case Seq(str,
          org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
        CharGrams(str, n)
      case _ => throw new IllegalArgumentException(
        "char_grams requires (string, literal int maxN)")
    })

  private[functions] def specs =
    Seq(rollingHashSpec, vecDotSpec, nfcSpec, jaroWinklerSpec, winnowSpec,
      charGramsSpec)

  /** Imperative registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
