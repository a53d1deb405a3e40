package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Centroid scoring kernel shared by interpreted eval and generated
  * code: the flattened row-major centroid matrix (nlist × dim doubles —
  * the same bounded driver state every IVF path already holds) plus the
  * two argmin scans over it. Generated code calls straight into these
  * JIT-compiled primitive loops — one virtual dispatch per row, zero
  * boxing, zero per-row `Seq` conversion — which is the whole win over
  * the Scala-UDF form (udf input marshalling copies every vector into a
  * boxed `Array[Double]` per row).
  *
  * Floating-point sequence is bit-identical to the UDFs this replaces:
  * left-to-right squared-difference accumulation per centroid, strict
  * `<` argmin (first index wins ties), and the probe list ordered by
  * (distance, index) ascending exactly as `sortBy((d, c))` produced.
  */
final class NearestCellsKernel(val flat: Array[Double], val dim: Int)
    extends Serializable {
  val n: Int = flat.length / dim
  require(dim > 0 && n * dim == flat.length,
    s"centroid matrix ${flat.length} doubles not divisible by dim $dim")

  @inline private def sqDistAt(a: ArrayData, c: Int): Double = {
    var acc = 0.0
    val off = c * dim
    var i = 0
    while (i < dim) { val d = a.getDouble(i) - flat(off + i); acc += d * d; i += 1 }
    acc
  }

  private def checkDim(a: ArrayData): Unit =
    require(a.numElements() == dim,
      s"ragged vector: ${a.numElements()} dims vs centroid $dim")

  /** Nearest-centroid index (the IVF cell assign). */
  def best(a: ArrayData): Int = {
    checkDim(a)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < n) {
      val d = sqDistAt(a, c)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest centroid indices, ordered by (distance, index)
    * ascending — a bounded insertion heap, no full sort of nlist.
    */
  def top(a: ArrayData, nprobe: Int): ArrayData = {
    checkDim(a)
    val cap = math.min(nprobe, n)
    val dist = new Array[Double](cap)
    val idx = new Array[Int](cap)
    var count = 0
    var c = 0
    while (c < n) {
      val d = sqDistAt(a, c)
      if (count < cap) {
        var pos = count
        while (pos > 0 && d < dist(pos - 1)) {
          dist(pos) = dist(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
        }
        dist(pos) = d; idx(pos) = c; count += 1
      } else if (d < dist(cap - 1)) {
        var pos = cap - 1
        while (pos > 0 && d < dist(pos - 1)) {
          dist(pos) = dist(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
        }
        dist(pos) = d; idx(pos) = c
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(idx)
  }
}

/** Native Catalyst nearest-centroid expression: `nprobe == 1` yields the
  * cell id (int), `nprobe > 1` the probe list (`array<int>` ordered by
  * distance). One expression node holds the whole centroid matrix, so —
  * unlike an nlist-way `least(...)` expression tree — the plan stays
  * flat no matter how many cells the index has (the round-1
  * plan-explosion lesson that originally forced these scans into UDFs).
  *
  * Used by the IVF family ([[graft.operators.Similarity]] `ivfTopK`,
  * `semDedupPairs`) for cell assignment and query probe lists.
  */
case class NearestCells(child: Expression, kernel: NearestCellsKernel,
                        nprobe: Int) extends UnaryExpression {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType =
    if (nprobe == 1) IntegerType else ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (nprobe == 1) kernel.best(a) else kernel.top(a, nprobe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("nearestCellsKernel", kernel,
      classOf[NearestCellsKernel].getName)
    nullSafeCodeGen(ctx, ev, a =>
      if (nprobe == 1) s"${ev.value} = $k.best($a);"
      else s"${ev.value} = $k.top($a, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def kernel(centroids: Array[Array[Double]]): NearestCellsKernel = {
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim),
      s"ragged centroid matrix: dims ${centroids.map(_.length).distinct.mkString(",")}")
    new NearestCellsKernel(centroids.flatten, dim)
  }

  /** Column API: nearest-cell id of an `array<double>` vector. */
  def cell(v: Column, k: NearestCellsKernel): Column =
    Bridge.column(NearestCells(Bridge.expression(v.cast("array<double>")), k, 1))

  /** Column API: the `nprobe` nearest cell ids, distance-ascending. */
  def probes(v: Column, k: NearestCellsKernel, nprobe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v.cast("array<double>")), k, nprobe))
}
