package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst asymmetric-distance (ADC) score: given a PQ code
  * (`array<int>`, one subquantizer index per slot) and a query's
  * flattened m×nCodes lookup table (`array<double>`), returns
  * `Σ_mi tab[mi*nCodes + code[mi]]` — the approximate squared L2
  * between the query and the encoded vector.
  *
  * This is THE hot expression of the PQ search paths: it runs once per
  * (indexed vector × query) pair after the cell equi-join /
  * query-broadcast, so a Scala UDF here pays per-pair conversion of the
  * 512-double table to a boxed Seq — measured +4 s on q_ann_pq and
  * +2.9 s on q_ann_ivfpq at sf0.1 when the driver-batch broadcast form
  * was replaced by the in-plan table column. The generated loop indexes
  * both unsafe arrays directly (same tier as [[DotProduct]], the repo's
  * reference native expression), restoring per-pair cost to m array
  * reads.
  *
  * Accumulation is the same left-to-right double addition as the UDF it
  * replaces, so scores are bit-identical. Null if either input is null;
  * out-of-range codes (code ≥ nCodes) are the caller's contract —
  * [[graft.operators.Similarity.pqEncode]] emits codes in [0, nCodes).
  * No per-element null guard (unlike the [[Vec.dense]] kernels and
  * [[DotProduct]]): both inputs are produced by this family's own
  * expressions (PqCode/AdcTable/IvfPqEncode/IvfPqProbe), whose output
  * types are `containsNull=false` — null elements cannot reach here by
  * construction, and user vectors were already guarded at encode time.
  */
case class AdcScore(left: Expression, right: Expression, nCodes: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    // UnsafeArrayData.getDouble is unchecked: a code/table produced by a
    // DIFFERENT PQModel would read out-of-bounds memory and return
    // plausible garbage instead of throwing (the boxed-UDF predecessor
    // threw ArrayIndexOutOfBounds). One comparison per pair buys the
    // loud failure back.
    if (tab.numElements() != m * nCodes)
      throw new IllegalArgumentException(
        s"ADC table has ${tab.numElements()} slots, code expects $m x $nCodes" +
          " — encoded data and search model disagree")
    var d = 0.0
    var mi = 0
    while (mi < m) { d += tab.getDouble(mi * nCodes + code.getInt(mi)); mi += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      s"""
         |int $m = $a.numElements();
         |if ($b.numElements() != $m * $nCodes) {
         |  throw new IllegalArgumentException(
         |    "ADC table has " + $b.numElements() + " slots, code expects " +
         |    $m + " x " + $nCodes + " — encoded data and search model disagree");
         |}
         |double ${ev.value}Acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  ${ev.value}Acc += $b.getDouble($mi * $nCodes + $a.getInt($mi));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  /** Column API: code cast to array<int>, table to array<double>. */
  def apply(code: Column, tab: Column, nCodes: Int): Column =
    Bridge.column(AdcScore(Bridge.expression(code.cast("array<int>")),
      Bridge.expression(tab.cast("array<double>")), nCodes))
}
