package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric array columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and is evaluated by the interpreted
  * higher-order-function machinery per element, which dominates wide
  * pairwise-similarity plans (embedding near-dup / ANN at 100 TB scale:
  * billions of pairs × vector width). This expression generates a tight
  * primitive loop inside whole-stage codegen: no allocation, no lambda
  * dispatch, values widened to double exactly like the HOF form. For
  * equal-length arrays with non-null elements, results are bit-identical
  * to the HOF form (sequential left-to-right summation).
  *
  * Two edge-case modes:
  *  - `strict = false` (default, the Vectors.dot surface): mismatched
  *    lengths sum over min(length) — truncation that Vectors.lshBucket
  *    relies on (4096-dim plane literals vs shorter vectors); null
  *    elements are undefined (primitive read).
  *  - `strict = true` (the [[graft.plans.RewriteHofDotProduct]] target):
  *    exact HOF semantics — mismatched lengths or any null element
  *    yield NULL — so the optimizer rewrite is sound for every input.
  *
  * A null array yields null in both modes (NullIntolerant).
  */
case class DotProduct(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = strict || super.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (strict && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      def get(arr: String, et: DataType): String = et match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _         => s"$arr.getDouble($i)"
      }
      if (strict) {
        // nullable = true in strict mode, so ev.isNull is a real variable
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $n = $a.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += ${get(a, elemType(left))} * ${get(b, elemType(right))};
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      } else {
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${get(a, elemType(left))} * ${get(b, elemType(right))};
           |}
           |${ev.value} = $s;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
