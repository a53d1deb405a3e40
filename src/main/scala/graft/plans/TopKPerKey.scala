package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Descending, Expression, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension: top-k rows per key, with rank.
  *
  * This is the (c) rung of the extension ladder — a custom LogicalPlan
  * node + planner Strategy + physical operators, registered through
  * `SparkSessionExtensions` ([[GraftExtensions]]) — for a semantics
  * Spark's built-ins can only approximate: per-GROUP top-k. The
  * `row_number().over(window) <= k` idiom SORTS every partition's full
  * group data (O(n log n) per group, full materialization in the window
  * exec); `TakeOrderedAndProject` is global-only. This operator keeps a
  * bounded k-heap per key on BOTH sides of the shuffle:
  *
  *   - partial (map side): per-partition hash of bounded heaps — at most
  *     k rows per key survive, so the SHUFFLE carries ≤ keys×k rows, not
  *     the full table. When the key hash grows past `flushThreshold`
  *     (high-cardinality keys) the map flushes downstream and restarts —
  *     memory stays bounded at flushThreshold×k rows with correctness
  *     unchanged (a flush only weakens the reduction, never drops a
  *     global top-k candidate).
  *   - final (reduce side): requires `ClusteredDistribution(keys)` AND
  *     (keys, order) child ordering — the planner inserts the one hash
  *     exchange plus a spillable sort over the ≤ k survivors per key —
  *     then streams: the first k rows of each key run are the top-k,
  *     rank = position. Reducer state is O(1).
  *
  * At 100 TB the win is the shuffle: grouping 10^9 orders per customer
  * for top-3 ships 3 rows per customer instead of every order, and no
  * executor ever sorts a whole group. Heap ordering is the codegen'd
  * `LazilyGeneratedOrdering` — the same machinery TakeOrderedAndProject
  * uses for its global heap.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference,
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is GENERATED here, not consumed — without this the
  // missing-input analysis check reads the constructor expression as a
  // reference the child must supply
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  /** User API: top `k` rows per `keyCols` group under `orderSpec`
    * ((column, descending) pairs; ties broken by later spec entries —
    * callers wanting determinism must include a unique tie-break, same
    * contract as any window order). Output = input columns + `rank`
    * (1-based within each group).
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    // floating keys are canonicalized (NaN bit patterns, -0.0 → 0.0):
    // the optimizer's NormalizeFloatingNumbers rule covers only
    // Aggregate/Window/Join, not custom nodes, and the final exec
    // detects key runs by UnsafeRow BYTE equality while the planner's
    // sort orders -0.0 equal to 0.0 — unnormalized, one logical group
    // arrives interleaved and the rank counter resets mid-run
    val keys = keyCols.map(n => Bridge.normalizeFloat(attr(n)))
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    // LongType, not IntegerType: every SQL engine's window-rank output
    // is int64, and the whole corpus standardizes hashed integer columns
    // on int64 so the driver's type-aware compare never sees width skew
    val rank = AttributeReference("rank", LongType, nullable = false)()
    Bridge.ofRows(df.sparkSession, TopKPerKeyNode(keys, order, k, rank, plan))
  }
}

/** Planner strategy: TopKPerKeyNode → partial + final physical pair. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** Bounded best-k heap: scala PriorityQueue's head is the MAX under
    * `ord` = the WORST kept row (rows that sort first are "smallest").
    */
  def offer(pq: mutable.PriorityQueue[InternalRow], row: InternalRow, k: Int,
            ord: Ordering[InternalRow]): Unit =
    if (pq.size < k) pq.enqueue(row.copy())
    else if (ord.lt(row, pq.head)) { pq.dequeue(); pq.enqueue(row.copy()) }

  /** Heap contents best-first (dequeueAll yields worst-first). */
  def drain(pq: mutable.PriorityQueue[InternalRow]): Seq[InternalRow] =
    pq.dequeueAll.reverse

  /** Map-side partial top-k with bounded memory: a hash of per-key
    * k-heaps that FLUSHES downstream and restarts whenever it reaches
    * `flushThreshold` keys. Emission is interleaved with consumption
    * (a custom iterator), so peak memory is flushThreshold×k rows no
    * matter the partition's key cardinality.
    */
  def partial(it: Iterator[InternalRow], keys: Seq[Expression],
              order: Seq[SortOrder], inputAttrs: Seq[Attribute], k: Int,
              flushThreshold: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val ord = new LazilyGeneratedOrdering(order, inputAttrs)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    new Iterator[InternalRow] {
      private var pending: Iterator[InternalRow] = Iterator.empty
      private def refill(): Unit = {
        while (pending.isEmpty && (it.hasNext || heaps.nonEmpty)) {
          while (it.hasNext && heaps.size < flushThreshold) {
            val row = it.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(pq) => offer(pq, row, k, ord)
              case None =>
                val pq = mutable.PriorityQueue.empty[InternalRow](ord)
                offer(pq, row, k, ord)
                heaps.put(key.copy(), pq)
            }
          }
          // input exhausted, or the map hit the flush bound: emit and reset
          pending = heaps.values.toArray.iterator.flatMap(drain)
          heaps.clear()
        }
      }
      override def hasNext: Boolean = { refill(); pending.hasNext }
      override def next(): InternalRow = { refill(); pending.next() }
    }
  }
}

/** Map side: reduces each input partition to ≤ k rows per key seen. No
  * distribution requirement — runs before (and shrinks) the shuffle.
  */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan,
                                 flushThreshold: Int = 1 << 16)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, so, attrs, kk, ft) = (keys, order, child.output, k, flushThreshold)
    child.execute().mapPartitions({ it =>
      TopKHeaps.partial(it, ks, so, attrs, kk, ft)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce side: after the hash exchange on `keys`, a STREAMING pass.
  * `requiredChildOrdering` asks the planner for (keys, order) ordering —
  * EnsureRequirements plants Spark's spillable SortExec over the ≤ k
  * rows per key the partial side lets through — so rows arrive grouped
  * by key and already best-first: emission is "first k rows of each key
  * run, rank = position". Reducer memory is O(1) (current key + a
  * counter); an earlier hash-of-heaps design buffered every key's heap
  * in an unspillable map, which OOMs on near-unique keys where the
  * map-side reduction can't shrink anything.
  */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                               k: Int, rankAttr: AttributeReference,
                               child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, attrs, kk) = (keys, child.output, k)
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(ks, attrs)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var currentKey: UnsafeRow = null
      var emitted = 0
      it.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || currentKey != key) {
          currentKey = key.copy()
          emitted = 0
        }
        if (emitted < kk) {
          emitted += 1
          rankRow.update(0, emitted.toLong)
          Iterator.single(outProj(joined(row, rankRow)))
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
