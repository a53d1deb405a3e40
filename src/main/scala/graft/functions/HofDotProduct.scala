package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product with EXACTLY the semantics of the higher-order
  * composition `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`:
  *
  *   - null if either array is null,
  *   - null if the lengths differ (`zip_with` pads the shorter side with
  *     nulls; null × anything poisons the whole fold),
  *   - null if any element is null,
  *   - otherwise the same left-to-right IEEE accumulation.
  *
  * This is the REWRITE TARGET of [[graft.plans.RewriteHofDotProduct]]:
  * the optimizer substitutes it for the interpreted HOF tree, so the
  * substitution must be observationally identical on every input —
  * unlike [[DotProduct]], whose documented contract (common prefix,
  * non-null elements) is intentionally looser for the hand-placed hot
  * path.
  */
case class HofDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null even when both children are non-null (length mismatch, null elem)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $b.numElements() != $n;
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HofDotProduct =
    copy(left = newLeft, right = newRight)
}
