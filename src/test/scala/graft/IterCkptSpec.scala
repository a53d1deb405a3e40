package graft

import graft.operators.{Components, IterCkpt}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel

/** The iterative-operator truncation knob: both modes must (1) cut the
  * logical lineage (the whole point — plans otherwise double per round),
  * (2) produce identical operator results, and (3) in reliable mode
  * actually write recoverable checkpoint state to the configured dir.
  */
class IterCkptSpec extends SparkSpec {

  private def withReliableDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(IterCkpt.DirKey, dir)
    try f(dir)
    finally {
      spark.conf.unset(IterCkpt.DirKey)
      // SparkContext's checkpoint dir has no unset and stays pointed at
      // the (deleted) temp dir — harmless: with the conf unset, nothing
      // else in the suite issues reliable checkpoints
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("default mode truncates lineage to a LogicalRDD and drop frees its blocks") {
    import spark.implicits._
    val df = (1 to 100).toDF("n").filter("n % 2 = 0").selectExpr("n * 3 as m")
    val t = IterCkpt.truncate(df)
    val rdd = Bridge.materializedRdd(t)
    assert(rdd.isDefined, "truncated plan must be a LogicalRDD (lineage cut)")
    assert(rdd.get.getStorageLevel !== StorageLevel.NONE,
      "localCheckpoint blocks must be persisted")
    assert(t.count() === 50)
    IterCkpt.drop(t)
    assert(rdd.get.getStorageLevel === StorageLevel.NONE,
      "drop must deterministically unpersist the materialized RDD " +
        "(Dataset.unpersist is a CacheManager no-op for checkpoints)")
    // an untruncated plan has no materialized RDD to free
    assert(Bridge.materializedRdd(df).isEmpty)
  }

  test("reliable mode truncates lineage, checkpoints to the dir, and matches default-mode results") {
    import spark.implicits._
    val edges = Seq((3L, 2L), (2L, 1L), (10L, 11L), (7L, 7L), (5L, 4L))
      .toDF("a", "b")
    val wantHash = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantStar = Components.connectedComponentsStar(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withReliableDir { dir =>
      val t = IterCkpt.truncate(edges.filter("a <> b"))
      val rdd = Bridge.materializedRdd(t)
      assert(rdd.isDefined, "reliable truncate must also cut lineage to a LogicalRDD")
      assert(rdd.get.isCheckpointed, "RDD must be reliably checkpointed")
      assert(t.count() === 4)
      // checkpoint files actually landed under the configured dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
      // both operators run end-to-end in reliable mode with identical output
      assert(Components.connectedComponents(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === wantHash)
      assert(Components.connectedComponentsStar(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === wantStar)
    }
  }

  test("bfsDepths deep walk truncates reliably too, distances unchanged") {
    // maxDepth 11 crosses two truncation points (depth 5 and 10) — the
    // knob's other consumer exercises reliable checkpoints mid-walk
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    def depths() = graft.operators.Graph.bfsDepths(docs, n, 0L, maxDepth = 11)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toMap
    val local = depths()
    val reliable = withReliableDir(_ => depths())
    assert(reliable === local)
  }
}
