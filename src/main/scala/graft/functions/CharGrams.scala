package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All byte n-gram keys of a string for n ∈ 1..maxN, in ONE pass over
  * the UTF-8 bytes — the chrF/char-fingerprint primitive. Each gram
  * packs INJECTIVELY into a long: `(n << 56) | bytes big-endian`
  * (maxN ≤ 7 so the payload never touches the order byte). Unlike a
  * hash key there are NO collisions, and unlike per-gram
  * `substring+md5` pipelines there are no allocations and no hex
  * round-trips: the generated Java is one tight loop emitting
  * maxN longs per position.
  *
  * Byte grams equal character grams on ASCII corpora — the same
  * contract [[RollingHash]] documents; the DuckDB oracle packs the
  * identical key as `(n << 56) + ('0x' || hex(substr(c,i,n)))::UBIGINT`.
  *
  * Replaces (r13) the chrF explode of
  * `transform(sequence(...), i -> struct(n, substring(c,i,n)))` ×6
  * followed by md5Long60 — measured 35 s at sf0.1, ~11% of the whole
  * 441-query driver bench, almost entirely per-gram string/md5 work.
  */
final case class CharGrams(child: Expression, maxN: Int)
    extends UnaryExpression {

  require(maxN >= 1 && maxN <= 7, s"char_grams maxN must be 1..7, got $maxN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_grams requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_grams"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharGrams.grams(input.asInstanceOf[UTF8String], maxN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val len = ctx.freshName("len")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nMax = ctx.freshName("nMax")
      val key = ctx.freshName("key")
      s"""
         |byte[] $b = $c.getBytes();
         |int $len = $b.length;
         |int $total = 0;
         |for (int $n = 1; $n <= $maxN; $n++) {
         |  if ($len >= $n) $total += $len - $n + 1;
         |}
         |long[] $out = new long[$total];
         |int $k = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  long $key = 0L;
         |  int $nMax = java.lang.Math.min($maxN, $len - $i);
         |  for (int $n = 1; $n <= $nMax; $n++) {
         |    $key = ($key << 8) | ($b[$i + $n - 1] & 0xffL);
         |    $out[$k++] = (((long) $n) << 56) | $key;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  /** Interpreted fallback (must match the generated code bit-for-bit). */
  def grams(s: UTF8String, maxN: Int): Array[Long] = {
    val b = s.getBytes
    val len = b.length
    var total = 0
    var n = 1
    while (n <= maxN) {
      if (len >= n) total += len - n + 1
      n += 1
    }
    val out = new Array[Long](total)
    var k = 0
    var i = 0
    while (i < len) {
      var key = 0L
      val nMax = math.min(maxN, len - i)
      var m = 1
      while (m <= nMax) {
        key = (key << 8) | (b(i + m - 1) & 0xffL)
        out(k) = (m.toLong << 56) | key
        k += 1
        m += 1
      }
      i += 1
    }
    out
  }
}
