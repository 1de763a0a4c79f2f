package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string — the canonicalization step a
  * text pipeline runs BEFORE tokenization, hashing, or dedup: "é" as
  * U+00E9 and as U+0065 U+0301 are the same text but different bytes,
  * so every downstream digest ([[RollingHash]], md5 fingerprints,
  * MinHash shingles) silently treats composed and decomposed crawls of
  * the same page as distinct documents unless this runs first.
  *
  * Spark has no built-in normalizer; this is a native Catalyst
  * `Expression` whose generated code is a fast-path ASCII scan (ASCII
  * is NFC by construction — zero allocation, no JDK call) with a
  * static `java.text.Normalizer` call only for strings that actually
  * contain non-ASCII bytes. The DuckDB oracle twin is its built-in
  * `nfc_normalize`.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // the companion's method via its MODULE$ singleton — immune to
      // whether scalac emits a static forwarder next to the case class
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code (static from Java's
    * point of view). ASCII fast path: a pure-ASCII UTF8String is
    * already NFC — return the input untouched, no String round-trip. */
  def normalize(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // non-ASCII byte → real normalization
        return UTF8String.fromString(
          java.text.Normalizer.normalize(u.toString,
            java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    u
  }
}
