package graft.plans

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference,
  Descending, SortOrder, UnsafeProjection}
import org.apache.spark.sql.types.LongType

/** The custom per-key top-k operator: agreement with the window idiom,
  * the appended rank contract, the partial phase's top-k reduction, and
  * the bounded-memory flush path.
  */
class TopKPerKeySpec extends SparkSpec {

  test("native top-k agrees with the row_number window idiom row for row") {
    val native = SparkEntry.queries("q_topk_native")(spark, sf)
      .collect().map(_.toString).sorted
    val window = SparkEntry.queries("q_topk_group")(spark, sf)
      .collect().map(_.toString).sorted
    assert(native.nonEmpty && native.toSeq === window.toSeq)
  }

  test("physical plan: custom execs present, exactly one hash exchange") {
    val df = SparkEntry.queries("q_topk_native")(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // the AQE rendering repeats the plan under "== Initial Plan =="; count
    // exchanges in the executed (final) section only
    val p = full.split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyFinal"), p.take(900))
    assert(p.contains("TopKPerKeyPartial"), p.take(900))
    // one hash exchange between partial and final + the contract sort's
    // range exchange — nothing else
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(900))
  }

  test("rank column is 1..k per key, best-first") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 30L), (1L, 20L), (2L, 5L))
      .toDF("k", "v")
    val got = TopKPerKeyNode.topKPerKey(df, Seq("k"), Seq(("v", true)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 30L, 1L), (1L, 20L, 2L), (2L, 5L, 1L)))
  }

  test("native top-k matches the window idiom on pseudo-random data (ties included)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    var x = 7L
    def next(m: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33) % m
    }
    // small value range on purpose: ties are common, the unique id
    // tie-break must resolve them identically on both paths
    val data = Seq.tabulate(400)(i => (next(17), next(5), i.toLong))
    val df = data.toDF("key", "v", "id")
    val native = TopKPerKeyNode.topKPerKey(df, Seq("key"),
        Seq(("v", true), ("id", false)), 4)
      .select("key", "v", "id", "rank")
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val window = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select("key", "v", "id", "rank")
      .collect().map(_.toString).sorted
    assert(native.nonEmpty && native.toSeq === window.toSeq)
  }

  private def unsafeRows(data: Seq[(Long, Long)]) = {
    val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
      LongType, LongType))
    data.map(t => proj(InternalRow(t._1, t._2)).copy(): InternalRow)
  }

  test("partial phase keeps each key's true top-k even across flushes") {
    val kAttr = AttributeReference("k", LongType, nullable = false)()
    val vAttr = AttributeReference("v", LongType, nullable = false)()
    val attrs = Seq(kAttr, vAttr)
    // 6 keys × 5 rows; threshold 2 keys forces a flush roughly every
    // other key, splitting keys' rows across map generations
    val data = (0L until 6L).flatMap(key => (0L until 5L).map(v => (key, key * 100 + v * 7)))
    val out = TopKHeaps.partial(unsafeRows(data).iterator,
        Seq(kAttr), Seq(SortOrder(vAttr, Descending)), attrs,
        k = 2, flushThreshold = 2)
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    (0L until 6L).foreach { key =>
      val want = data.filter(_._1 == key).map(_._2).sorted.reverse.take(2).toSet
      val got = out.filter(_._1 == key).map(_._2).toSet
      assert(want.subsetOf(got), s"key=$key want⊆got failed: want=$want got=$got")
    }
    // and it genuinely reduced: ≤ 2 rows per key per flush generation,
    // never the full 5
    assert(out.size < data.size)
  }

  test("partial phase without flush emits exactly k per key") {
    val kAttr = AttributeReference("k", LongType, nullable = false)()
    val vAttr = AttributeReference("v", LongType, nullable = false)()
    val attrs = Seq(kAttr, vAttr)
    val data = (0L until 4L).flatMap(key => (0L until 10L).map(v => (key, v)))
    val out = TopKHeaps.partial(unsafeRows(data).iterator,
        Seq(kAttr), Seq(SortOrder(vAttr, Ascending)), attrs,
        k = 3, flushThreshold = 1 << 16)
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size === 12)
    (0L until 4L).foreach { key =>
      assert(out.filter(_._1 == key).map(_._2).sorted === Seq(0L, 1L, 2L))
    }
  }

  test("-0.0 and 0.0 group keys are ONE group (floating keys normalized)") {
    // Spark's NormalizeFloatingNumbers rule covers Aggregate/Window/Join
    // only; the sort orders -0.0 equal to 0.0 but the final exec's
    // byte-equality run detection would split the interleaved run and
    // reset the rank counter — emitting up to 2k rows for one group.
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L), (1.5, 9L))
      .toDF("key", "seq")
    val out = TopKPerKeyNode.topKPerKey(df, Seq("key"),
        Seq(("seq", false)), k = 3)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val zeroGroup = out.filter(_._1 == 0.0)
    assert(zeroGroup.map(t => (t._2, t._3)).sorted === Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      s"zero-key group split: ${zeroGroup.mkString(",")}")
    assert(out.filter(_._1 == 1.5).map(_._3).toSeq === Seq(1L))
  }
}
