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

  test("reliable truncate computes the round's plan exactly ONCE") {
    // Spark 4's eager Dataset.checkpoint runs RDD.doCheckpoint() directly:
    // one job computes the plan and writes the partitions as it goes. The
    // Spark 3 era behavior (materialize, then a SECOND full computation to
    // write the files) would double every reliable round's cost — this
    // accumulator pins the single-evaluation guarantee the IterCkpt
    // scaladoc now states, so a Spark upgrade that regresses it turns red
    // here instead of silently doubling cluster bills.
    import org.apache.spark.sql.functions.{col, udf}
    withReliableDir { _ =>
      val acc = spark.sparkContext.longAccumulator("iterckpt_evals")
      val counting = udf((x: Long) => { acc.add(1); x })
      val t = IterCkpt.truncate(
        spark.range(100).select(counting(col("id")).as("id")))
      assert(acc.value === 100L,
        s"reliable truncate evaluated the plan ${acc.value / 100.0} times — must be exactly once")
      assert(t.count() === 100)
      // and the post-truncate count() read checkpoint state, not the plan
      assert(acc.value === 100L)
    }
  }

  test("reliable-mode blocks are persisted for re-reads; drop frees blocks AND deletes the round's files") {
    import spark.implicits._
    withReliableDir { _ =>
      val t = IterCkpt.truncate((1 to 40).toDF("n").filter("n % 2 = 0"))
      val rdd = Bridge.materializedRdd(t).get
      // next-round references should hit the block manager, not DFS
      assert(rdd.getStorageLevel !== StorageLevel.NONE,
        "reliable truncate must persist the checkpointed RDD for block-backed re-reads")
      val cp = rdd.getCheckpointFile
      assert(cp.isDefined, "reliable truncate must yield a checkpoint file path")
      val p = new org.apache.hadoop.fs.Path(cp.get)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p), s"checkpoint dir $p must exist while the round is live")
      IterCkpt.drop(t)
      assert(rdd.getStorageLevel === StorageLevel.NONE, "drop must unpersist the blocks")
      // ADVICE r9: without this, a multi-hour run accumulates rounds × |V|
      // of DFS storage (ContextCleaner file cleanup is off by default)
      assert(!fs.exists(p), s"drop must delete the superseded round's checkpoint files at $p")
    }
  }

  test("dirMismatch flags a live context dir that did not come from the configured one") {
    val hconf = spark.sparkContext.hadoopConfiguration
    // no live dir: nothing to flag
    assert(IterCkpt.dirMismatch(None, "/tmp/want", hconf).isEmpty)
    // live dir is want/<uuid> (setCheckpointDir's shape): our conf took effect
    assert(IterCkpt.dirMismatch(Some("file:/tmp/want/3f2a-uuid"), "/tmp/want", hconf).isEmpty)
    // live dir descends from somewhere else: first-write-wins hazard, flagged
    assert(IterCkpt.dirMismatch(Some("file:/tmp/other/3f2a-uuid"), "/tmp/want", hconf)
      === Some("file:/tmp/other/3f2a-uuid"))
  }
}
