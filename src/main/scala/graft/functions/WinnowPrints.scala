package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003) as ONE native codegen pass: Rabin–Karp char-8-gram
  * hashes computed incrementally (O(1) per char via the 31⁷ leading
  * term removal, not O(k) per gram), window-of-4 minima via a
  * monotonic deque (O(1) amortized, not O(w) per window), then
  * sort+unique so the emitted `array<long>` is the DISTINCT selected
  * fingerprint set in ascending order. Replaces a higher-order
  * `transform(sequence …, aggregate(sequence …))` pipeline that was
  * interpreted per element — the r10 bench measured that version at
  * 82s for sf0.1 `q_text_winnow`; this expression exists to keep the
  * selection inside whole-stage codegen at O(chars).
  *
  * Cross-engine contract: hashes fold `byte & 0xff` exactly like
  * [[RollingHash]] (== `ascii()` codes on this ASCII corpus), base 31
  * mod 1e9+7; selection is SET semantics (any window's minimum VALUE),
  * so no positional tie-break has to be mirrored. Strings shorter than
  * k + w − 1 = 11 chars yield an empty array. */
final case class WinnowPrints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_prints requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_prints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowPrints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val hs = ctx.freshName("hs")
      val h = ctx.freshName("h")
      val pow = ctx.freshName("pow")
      val sel = ctx.freshName("sel")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val P = WinnowPrints.Mod
      s"""
         |byte[] $b = $c.getBytes();
         |int $n = $b.length;
         |long[] $out;
         |if ($n < ${WinnowPrints.K + WinnowPrints.W - 1}) {
         |  $out = new long[0];
         |} else {
         |  int $g = $n - ${WinnowPrints.K - 1};
         |  long[] $hs = new long[$g];
         |  long $h = 0L;
         |  for (int $i = 0; $i < ${WinnowPrints.K}; $i++)
         |    $h = ($h * ${WinnowPrints.Base}L + ($b[$i] & 0xffL)) % ${P}L;
         |  $hs[0] = $h;
         |  long $pow = 1L;
         |  for (int $i = 0; $i < ${WinnowPrints.K - 1}; $i++)
         |    $pow = $pow * ${WinnowPrints.Base}L % ${P}L;
         |  for (int $i = 1; $i < $g; $i++) {
         |    $h = (($h - ($b[$i - 1] & 0xffL) * $pow % ${P}L) % ${P}L + ${P}L) % ${P}L;
         |    $h = ($h * ${WinnowPrints.Base}L
         |      + ($b[$i + ${WinnowPrints.K - 1}] & 0xffL)) % ${P}L;
         |    $hs[$i] = $h;
         |  }
         |  long[] $sel = new long[$g - ${WinnowPrints.W - 1}];
         |  int[] $dq = new int[$g];
         |  int $head = 0; int $tail = 0;
         |  for (int $i = 0; $i < $g; $i++) {
         |    while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$i]) $tail--;
         |    $dq[$tail++] = $i;
         |    if ($dq[$head] <= $i - ${WinnowPrints.W}) $head++;
         |    if ($i >= ${WinnowPrints.W - 1}) $sel[$i - ${WinnowPrints.W - 1}] = $hs[$dq[$head]];
         |  }
         |  java.util.Arrays.sort($sel);
         |  int $m = 0;
         |  for (int $i = 0; $i < $sel.length; $i++)
         |    if ($i == 0 || $sel[$i] != $sel[$i - 1]) $sel[$m++] = $sel[$i];
         |  $out = java.util.Arrays.copyOf($sel, $m);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowPrints =
    copy(child = newChild)
}

object WinnowPrints {
  val K = 8
  val W = 4
  val Base = 31L
  val Mod = 1000000007L

  /** Interpreted fallback (must match the generated code bit-for-bit). */
  def compute(s: UTF8String): UnsafeArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n < K + W - 1) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val g = n - (K - 1)
    val hs = new Array[Long](g)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * Base + (b(i) & 0xffL)) % Mod; i += 1 }
    hs(0) = h
    var pow = 1L
    i = 0
    while (i < K - 1) { pow = pow * Base % Mod; i += 1 }
    i = 1
    while (i < g) {
      h = ((h - (b(i - 1) & 0xffL) * pow % Mod) % Mod + Mod) % Mod
      h = (h * Base + (b(i + K - 1) & 0xffL)) % Mod
      hs(i) = h
      i += 1
    }
    val sel = new Array[Long](g - (W - 1))
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0
    i = 0
    while (i < g) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - W) head += 1
      if (i >= W - 1) sel(i - (W - 1)) = hs(dq(head))
      i += 1
    }
    java.util.Arrays.sort(sel)
    var m = 0
    i = 0
    while (i < sel.length) {
      if (i == 0 || sel(i) != sel(i - 1)) { sel(m) = sel(i); m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sel, m))
  }
}
