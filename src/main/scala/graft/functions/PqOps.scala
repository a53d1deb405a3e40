package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Product-quantization codebook kernel shared by [[PqCode]] and
  * [[AdcTable]] — the m×nCodes×subDim codebook matrix flattened
  * row-major (centroid (mi, c) starts at ((mi·nCodes)+c)·subDim), plus
  * the two scans over it. Same native tier as
  * [[NearestCellsKernel]]/[[AdcScore]]: generated code dispatches once
  * per row into JIT-compiled primitive loops, replacing the fused Scala
  * UDFs whose per-row input marshalling boxed every vector into a
  * `Seq[Double]`.
  *
  * Inputs are expected ALREADY L2-normalized in the plan
  * (`Similarity.unitized`) — the FP sequence of expression
  * normalization is identical to the in-UDF form these kernels
  * replaced, so codes and tables are bit-identical. Ragged inputs fail
  * loudly, same contract as every index path here.
  */
final class PqKernel(val flat: Array[Double], val m: Int, val subDim: Int,
                     val nCodes: Int) extends Serializable {
  val dim: Int = m * subDim
  require(flat.length == m * nCodes * subDim,
    s"codebook matrix ${flat.length} doubles != $m x $nCodes x $subDim")

  private def checkDim(len: Int): Unit =
    require(len == dim, s"ragged vector: $len dims, index expects $dim")

  @inline private def sqDistSub(u: Array[Double], off: Int, bookOff: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < subDim) {
      val d = u(off + i) - flat(bookOff + i); acc += d * d; i += 1
    }
    acc
  }

  /** Per-subspace nearest-code indices — the PQ code (m slots). Single
    * primitive core; the fused IVF-PQ kernel shares it, so argmin/tie
    * rules live in exactly one place.
    */
  def code(u: Array[Double]): Array[Int] = {
    checkDim(u.length)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < nCodes) {
        val d = sqDistSub(u, mi * subDim, ((mi * nCodes) + c) * subDim)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    out
  }

  /** Flattened m×nCodes ADC lookup table for one query:
    * out(mi·nCodes + c) = ‖u[sub mi] − book(mi)(c)‖². Single primitive
    * core, shared with the fused IVF-PQ kernel.
    */
  def table(u: Array[Double]): Array[Double] = {
    checkDim(u.length)
    val out = new Array[Double](m * nCodes)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < nCodes) {
        out(mi * nCodes + c) = sqDistSub(u, mi * subDim, ((mi * nCodes) + c) * subDim)
        c += 1
      }
      mi += 1
    }
    out
  }

  // ArrayData adapters for generated code: one null-guarded primitive
  // copy ([[Vec.dense]]), then the shared loops above.
  def code(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(code(Vec.dense(a, "PQ encode")))
  def table(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(table(Vec.dense(a, "ADC table build")))
}

/** Native PQ encode: unit vector (array<double>) → m-slot code (array<int>). */
case class PqCode(child: Expression, kernel: PqKernel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any = kernel.code(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.code($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}

/** Native ADC table build: unit query vector → flattened m×nCodes
  * distance table (array<double>), consumed by [[AdcScore]].
  */
case class AdcTable(child: Expression, kernel: PqKernel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = kernel.table(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.table($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)
}

/** Fused IVF-PQ row kernel: normalize ONCE (primitive loops, from the
  * raw cast-to-double vector) then run both the coarse-cell scan and
  * the per-subspace PQ scan over the same unit vector — the native
  * equivalent of the fused Scala UDF it replaces (which existed
  * precisely so the corpus is scanned once with one normalization; an
  * expression-normalized column costs interpreted HOF evaluation per
  * row, measured +1.4 s on q_ann_ivfpq at sf0.1). Every loop is a
  * DELEGATION to the single primitive core it composes —
  * [[UnitVector.unitArr]], [[NearestCellsKernel.best]]/`top`,
  * [[PqKernel.code]]/`table` — so argmin/tie/normalization rules live
  * in exactly one place and the fused path cannot drift from the
  * unfused ones. FP sequence is the fused UDF's exactly.
  */
final class IvfPqKernel(val cells: NearestCellsKernel, val pq: PqKernel)
    extends Serializable {
  require(cells.dim == pq.dim,
    s"coarse dim ${cells.dim} != codebook dim ${pq.dim}")
  private val dim = pq.dim

  private def unit(a: ArrayData): Array[Double] = {
    val raw = Vec.dense(a, "IVF-PQ scan")
    require(raw.length == dim,
      s"ragged vector: ${raw.length} dims, index expects $dim")
    UnitVector.unitArr(raw)
  }

  /** struct(cell: int, code: array<int>) for an indexed vector. */
  def encode(a: ArrayData): InternalRow = {
    val u = unit(a)
    new GenericInternalRow(Array[Any](cells.best(u),
      UnsafeArrayData.fromPrimitiveArray(pq.code(u))))
  }

  /** struct(tab: array<double>, probes: array<int>) for a query vector:
    * the flattened m×nCodes ADC table plus the nprobe nearest coarse
    * cells ordered by (distance, index).
    */
  def probe(a: ArrayData, nprobe: Int): InternalRow = {
    val u = unit(a)
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(pq.table(u)),
      UnsafeArrayData.fromPrimitiveArray(cells.top(u, nprobe))))
  }
}

/** Sign-LSH hyperplane kernel: tables×bitsPerTable planes flattened
  * (plane (t, b) starts at (t·bitsPerTable + b)·dim), producing one
  * packed bit-signature long per table. Loop order and sign rule
  * (proj ≥ 0) are exactly the replaced UDF's, so bucket assignments
  * are unchanged for well-formed vectors; ragged vectors fail loudly
  * (the UDF's silent min-length clamp projected a truncated vector
  * into a REAL bucket, hiding upstream corruption as plausible
  * candidates — every other kernel in this family already rejects
  * them). One expression node holds all planes — the tables×bits
  * expression-TREE form was measured to freeze the driver on plan
  * explosion long before this kernel existed, which is why this stays
  * a single opaque pass.
  */
final class HyperplaneKernel(val flat: Array[Double], val dim: Int,
                             val tables: Int, val bitsPerTable: Int)
    extends Serializable {
  require(flat.length == tables * bitsPerTable * dim,
    s"plane matrix ${flat.length} doubles != $tables x $bitsPerTable x $dim")

  def buckets(a: ArrayData): ArrayData = {
    // One null-guarded primitive copy up front, then tables×bits passes
    // over a JIT-friendly local array — the tables×bits repeated
    // ArrayData.getDouble walk this replaces also read null elements as
    // 0.0 silently. Same values in the same order, so signatures are
    // bit-identical for clean vectors.
    val u = Vec.dense(a, "LSH signature")
    require(u.length == dim,
      s"ragged vector: ${u.length} dims, LSH planes expect $dim")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var packed = 0L
      var b = 0
      while (b < bitsPerTable) {
        val off = (t * bitsPerTable + b) * dim
        var proj = 0.0
        var i = 0
        while (i < dim) { proj += u(i) * flat(off + i); i += 1 }
        if (proj >= 0) packed |= (1L << b)
        b += 1
      }
      out(t) = packed
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native sign-LSH bucket signature: raw vector → array<long>, one
  * packed table signature per element.
  */
case class HyperplaneBuckets(child: Expression, kernel: HyperplaneKernel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    kernel.buckets(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("hyperplaneKernel", kernel,
      classOf[HyperplaneKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.buckets($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Native L2-unit normalization: array<double> → array<double>, the
  * primitive-loop form of `when(nrm = 0, v).otherwise(zip_with(v, …))`
  * (zero-norm vectors pass through unscaled). Same IEEE sequence —
  * left-to-right Σx², sqrt, per-element divide — as both the
  * expression-HOF form and every in-UDF normalization this replaces,
  * so downstream cells/codes/tables are bit-identical; it exists
  * because Catalyst higher-order functions evaluate interpreted
  * per element, which measurably drags every normalize-heavy scan.
  */
case class UnitVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    UnitVector.unit(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.UnitVector.unit($a);")
  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

object UnitVector {
  /** In-place L2 normalization of a freshly-copied array — the single
    * primitive core every normalizing path shares (zero-norm input is
    * returned unscaled). Callers must own `raw` (it is mutated).
    */
  def unitArr(raw: Array[Double]): Array[Double] = {
    val n = raw.length
    var ss = 0.0
    var i = 0
    while (i < n) { ss += raw(i) * raw(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0) { var j = 0; while (j < n) { raw(j) = raw(j) / nrm; j += 1 } }
    raw
  }

  def unit(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(unitArr(Vec.dense(a, "unit normalize")))
}

/** Native fused IVF-PQ index-side encode: raw vector → struct(cell, code). */
case class IvfPqEncode(child: Expression, kernel: IvfPqKernel)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullSafeEval(v: Any): Any =
    kernel.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("ivfPqKernel", kernel, classOf[IvfPqKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.encode($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

/** Native fused IVF-PQ query-side probe: raw vector → struct(tab, probes). */
case class IvfPqProbe(child: Expression, kernel: IvfPqKernel, nprobe: Int)
    extends UnaryExpression {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
  override def dataType: DataType = StructType(Seq(
    StructField("tab", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("probes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullSafeEval(v: Any): Any =
    kernel.probe(v.asInstanceOf[ArrayData], nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("ivfPqKernel", kernel, classOf[IvfPqKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.probe($a, $nprobe);")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfPqProbe =
    copy(child = newChild)
}

object PqOps {
  /** Kernel from nested codebooks (m × nCodes × subDim, rectangular). */
  def kernel(codebooks: Array[Array[Array[Double]]]): PqKernel = {
    val m = codebooks.length
    val nCodes = codebooks.head.length
    val subDim = codebooks.head.head.length
    require(codebooks.forall(b => b.length == nCodes && b.forall(_.length == subDim)),
      "ragged codebook matrix")
    new PqKernel(codebooks.flatten.flatten, m, subDim, nCodes)
  }

  def code(v: Column, k: PqKernel): Column =
    Bridge.column(PqCode(Bridge.expression(v.cast("array<double>")), k))

  def table(v: Column, k: PqKernel): Column =
    Bridge.column(AdcTable(Bridge.expression(v.cast("array<double>")), k))

  def hyperplaneBuckets(v: Column, k: HyperplaneKernel): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v.cast("array<double>")), k))

  def unitVec(v: Column): Column =
    Bridge.column(UnitVector(Bridge.expression(v.cast("array<double>"))))

  def ivfEncode(v: Column, k: IvfPqKernel): Column =
    Bridge.column(IvfPqEncode(Bridge.expression(v.cast("array<double>")), k))

  def ivfProbe(v: Column, k: IvfPqKernel, nprobe: Int): Column =
    Bridge.column(IvfPqProbe(Bridge.expression(v.cast("array<double>")), k, nprobe))
}
