package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` vectors as a native Catalyst
  * `Expression` with `doGenCode`: the generated Java is a tight
  * primitive loop over the two `ArrayData` buffers — no boxing, no
  * per-element lambda dispatch. The equivalent higher-order
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, p) -> acc + p)`
  * is interpreted (array lambdas have no codegen path) and allocates an
  * intermediate product array per row; on the similarity family's hot
  * loop — one dot per (query, corpus-vector) pair in brute-force top-k,
  * 24 plane dots per vector in SRP bucketing — that interpretation
  * overhead dominates at scale.
  *
  * Bit-compatibility contract (the oracle depends on it): products are
  * accumulated LEFT TO RIGHT from a 0.0 seed, exactly like the
  * higher-order fold it replaces and DuckDB's `list_reduce` chain, so
  * results are bit-identical and even ties order the same. Null
  * element or length mismatch → null, matching `zip_with`'s padding
  * semantics feeding `aggregate`.
  */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
