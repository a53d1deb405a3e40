package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{StateLog, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming group (SURVEY §2B last row), oracle=parity: the streaming
  * result of each transform on a bounded input must equal the batch result
  * of the SAME function; watermark late-drop and cross-batch state are
  * exercised with deterministic MemoryStream micro-batch sequences (file
  * sources with fixed event times for the parity runs — no rate source,
  * per SURVEY §7 risk notes).
  */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** events at sf0.001 re-written as plain-µs parquet (streaming reader
    * has no nanosAsLong escape hatch), split into 4 files so the file
    * source actually sees multiple input splits.
    */
  private lazy val eventsDir: String = {
    val dir = tmp("graft-stream-events")
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def batchEvents = spark.read.parquet(eventsDir)

  private def runToCompletion(name: String, mode: OutputMode)
                             (mkQuery: => org.apache.spark.sql.DataFrame): Unit = {
    val q = Streams.toMemorySink(mkQuery, name, mode, tmp(s"ckpt-$name"))
    q.processAllAvailable()
    q.stop()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("tumbling window parity: stream == batch") {
    runToCompletion("t_tumbling", OutputMode.Complete()) {
      Streams.tumblingAgg(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema))
    }
    val got = canon(spark.table("t_tumbling"))
    val want = canon(Streams.tumblingAgg(batchEvents))
    assert(got.nonEmpty && got === want)
  }

  test("sliding window parity: stream == batch, multi-file micro-batches") {
    runToCompletion("t_sliding", OutputMode.Complete()) {
      Streams.slidingAgg(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema,
          maxFilesPerTrigger = Some(1)))
    }
    val got = canon(spark.table("t_sliding"))
    val want = canon(Streams.slidingAgg(batchEvents))
    assert(got.nonEmpty && got === want)
    // sliding invariant: each event lands in width/slide = 2 windows
    val nTum = spark.table("t_tumbling")
    val sumSliding = spark.table("t_sliding").agg(sum("n")).head.getLong(0)
    assert(sumSliding === 2 * batchEvents.count())
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late data (append mode emits only closed windows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.toMemorySink(
      Streams.tumblingAgg(
        Streams.watermarked(
          in.toDF().toDF("ts", "event_type", "value"), "10 minutes"),
        "10 minutes"),
      "t_late_append", OutputMode.Append(), tmp("ckpt-late"))

    // batch 1: one event in window [00:00,00:10), one at 01:00 that will
    // push the watermark to 00:50 for the NEXT batch.
    in.addData((ts("2024-01-01 00:05:00"), "a", 1.0),
               (ts("2024-01-01 01:00:00"), "a", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event for the already-closed 00:00 window (00:06 <
    // watermark 00:50 → dropped), plus 02:00 to advance the watermark.
    in.addData((ts("2024-01-01 00:06:00"), "a", 9.0),
               (ts("2024-01-01 02:00:00"), "a", 1.0))
    q.processAllAvailable()
    // batch 3: only advances the watermark so [01:00,01:10) also closes.
    in.addData((ts("2024-01-01 03:00:00"), "a", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_late_append")
      .select(col("w_start").cast("string"), col("n"), col("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the late 00:06/9.0 event must NOT appear: n stays 1, total stays 1.0
    assert(rows.get("2024-01-01 00:00:00") === Some((1L, 1.0)))
    assert(rows.get("2024-01-01 01:00:00") === Some((1L, 1.0)))
    // [02:00,02:10) closes in the trailing no-data batch (watermark 02:50)
    assert(rows.get("2024-01-01 02:00:00") === Some((1L, 1.0)))
    // [03:00,03:10) ends after the final watermark → still open → absent
    assert(!rows.contains("2024-01-01 03:00:00"))
  }

  test("watermark drops late data (update mode re-emits open windows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.toMemorySink(
      Streams.tumblingAgg(
        Streams.watermarked(
          in.toDF().toDF("ts", "event_type", "value"), "10 minutes"),
        "10 minutes"),
      "t_late_update", OutputMode.Update(), tmp("ckpt-late-upd"))

    in.addData((ts("2024-01-01 00:05:00"), "a", 1.0),
               (ts("2024-01-01 01:00:00"), "a", 1.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:06:00"), "a", 9.0), // late → dropped
               (ts("2024-01-01 01:01:00"), "a", 2.0)) // open window → re-emit
    q.processAllAvailable()
    q.stop()

    val byWindow = spark.table("t_late_update")
      .select(col("w_start").cast("string"), col("n"), col("total"))
      .collect().groupBy(_.getString(0))
    // update mode emitted [00:00] once (batch 1) and never again — the
    // late event was dropped before reaching the aggregation state.
    assert(byWindow("2024-01-01 00:00:00").map(r => (r.getLong(1), r.getDouble(2))).toSeq
      === Seq((1L, 1.0)))
    // [01:00] emitted in batch 1 (n=1) and re-emitted updated in batch 2
    assert(byWindow("2024-01-01 01:00:00").map(r => (r.getLong(1), r.getDouble(2))).toSet
      === Set((1L, 1.0), (2L, 3.0)))
  }

  test("mapGroupsWithState running max: batch parity") {
    val got = Streams.runningMaxPerUser(spark, batchEvents)
      .collect().map(um => um.user_id -> um.max_value).toMap
    val want = batchEvents.groupBy("user_id").agg(max("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want && got.nonEmpty)
  }

  test("month-based idle timeouts are rejected, not silently zeroed") {
    // CalendarInterval.months was dropped by the millis conversion,
    // turning "1 month" into a 0 ms idle horizon that evicted every key
    // at the first watermark
    val e = intercept[IllegalArgumentException] {
      Streams.runningMaxPerUser(spark, batchEvents, idleTimeout = "1 month")
    }
    assert(e.getMessage.contains("calendar-ambiguous"), e.getMessage)
  }

  test("session window parity: stream == batch") {
    runToCompletion("t_session", OutputMode.Complete()) {
      Streams.sessionAgg(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema), "6 hours")
    }
    val got = canon(spark.table("t_session"))
    val want = canon(Streams.sessionAgg(batchEvents, "6 hours"))
    assert(got.nonEmpty && got === want)
    // sanity: sessions genuinely merge events (not all singletons)
    assert(Streams.sessionAgg(batchEvents, "6 hours")
      .filter(col("n") > 1).count() > 0)
  }

  test("stream-stream interval join parity: stream == batch") {
    runToCompletion("t_ssjoin", OutputMode.Append()) {
      Streams.clickPurchaseJoin(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema), "24 hours")
    }
    val got = canon(spark.table("t_ssjoin"))
    val want = canon(Streams.clickPurchaseJoin(batchEvents, "24 hours"))
    assert(got.nonEmpty && got === want)
  }

  test("left-outer interval join: inner rows parity, outer rows gated by watermark") {
    runToCompletion("t_ssjoin_left", OutputMode.Append()) {
      Streams.clickPurchaseJoinOuter(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema), "24 hours")
    }
    val got = spark.table("t_ssjoin_left").collect()
    val want = Streams.clickPurchaseJoinOuter(batchEvents, "24 hours").collect()
    // inner (matched) rows are emitted as they join — exact parity
    val gotInner = got.filter(!_.isNullAt(2)).map(_.toString).sorted.toSeq
    val wantInner = want.filter(!_.isNullAt(2)).map(_.toString).sorted.toSeq
    assert(gotInner.nonEmpty && gotInner === wantInner)
    // outer (null) rows need the purchase watermark PAST the click time:
    // a drained finite stream ends with watermark = max(ts) - delay, so
    // exactly the clicks before that cutoff get their outer verdict
    val cutoff = new Timestamp(
      batchEvents.agg(max("ts")).head.getTimestamp(0).getTime - 10 * 60 * 1000)
    val gotOuter = got.filter(_.isNullAt(2))
      .map(r => (r.getLong(0), r.getTimestamp(1))).sorted.toSeq
    val wantOuter = want.filter(_.isNullAt(2))
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .filter(_._2.before(cutoff)).sorted.toSeq
    assert(gotOuter.nonEmpty, "no outer rows emitted at all")
    assert(gotOuter === wantOuter,
      s"outer rows diverge: got ${gotOuter.size}, want ${wantOuter.size}")
  }

  test("stream-static broadcast enrich parity: stream == batch, stateless") {
    val dim = Tables.customer(spark, sf)
    val q = Streams.toMemorySink(
      Streams.enrichWithUserDim(
        Streams.parquetStream(spark, eventsDir, batchEvents.schema,
          maxFilesPerTrigger = Some(1)), dim),
      "t_enrich", OutputMode.Append(), tmp("ckpt-enrich"))
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    q.stop()
    val got = canon(spark.table("t_enrich"))
    val want = canon(Streams.enrichWithUserDim(batchEvents, dim))
    assert(got.nonEmpty && got === want)
    // STATELESS: a stream-stream join would report a state operator with
    // join state; stream-static must report none — that absence is the
    // unbounded-stream guarantee (no per-batch state accumulation)
    assert(stateOps.isEmpty, stateOps.mkString(","))
    // and the batch plan broadcasts the dim side (stream side never shuffles)
    val p = Streams.enrichWithUserDim(batchEvents, dim)
      .queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("parquet file sink: checkpointed stop/resume is exactly-once") {
    // The production sink surface: writeStream.parquet with a checkpoint,
    // stopped between deliveries and resumed on the SAME checkpoint. The
    // resumed query must pick up only the files that arrived while it was
    // down (offset log), and the sink's _spark_metadata commit log must
    // expose each input row exactly once to downstream batch readers.
    val in = tmp("graft-sink-in")
    val out = tmp("graft-sink-out")
    val ckpt = tmp("graft-sink-ckpt")
    val ev = batchEvents.select("event_id", "user_id", "value")
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def start() = Streams.parquetStream(spark, in, schema)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // the other half of the input lands while the query is down
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(in)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
    // no loss, no duplicates, value-level parity
    assert(got.count() === ev.count())
    assert(got.select("event_id").distinct().count() === ev.count())
    assert(canon(got) === canon(ev))
  }

  test("Trigger.AvailableNow drains pending input then self-terminates (scheduled-incremental mode)") {
    // The cron-batch pattern at 100 TB: a periodic job starts the stream,
    // AvailableNow processes everything that arrived since the last
    // checkpoint — honoring rate limits across multiple micro-batches
    // (maxFilesPerTrigger=1 forces that) — then terminates on its own.
    // Streaming's exactly-once offset/commit bookkeeping with batch-job
    // economics: no always-on cluster.
    val in = tmp("graft-an-in")
    val out = tmp("graft-an-out")
    val ckpt = tmp("graft-an-ckpt")
    val ev = batchEvents.select("event_id", "user_id", "value")
    ev.filter(col("event_id") % 2 === 0)
      .repartition(3).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runOnce(): Unit = {
      val q = Streams.parquetStream(spark, in, schema, maxFilesPerTrigger = Some(1))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    }
    runOnce()
    assert(spark.read.parquet(out).count()
      === ev.filter(col("event_id") % 2 === 0).count())
    // rows that land between scheduled runs are picked up by the next one
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(in)
    runOnce()
    val got = spark.read.parquet(out)
    assert(got.count() === ev.count())
    assert(canon(got) === canon(ev))
  }

  test("foreachBatch sink: batch-id idempotence makes epoch retries exactly-once") {
    val in = tmp("graft-feb-in")
    val out = tmp("graft-feb-out")
    val ckpt = tmp("graft-feb-ckpt")
    val ev = batchEvents.select("event_id", "user_id", "value")
    ev.write.mode("append").parquet(in)
    val q = Streams.idempotentBatchSink(
      Streams.parquetStream(spark, in, spark.read.parquet(in).schema),
      out, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.option("basePath", out).parquet(out)
    assert(canon(got.select("event_id", "user_id", "value")) === canon(ev))
    // simulate the failure mode foreachBatch must survive: the epoch
    // re-delivered after a crash between write and checkpoint commit.
    // Replaying the SAME batch content under the same id must leave the
    // table byte-identical — that idempotence IS the exactly-once claim.
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName)
    assert(batchDirs.nonEmpty)
    val replayDir = s"$out/${batchDirs.head}"
    val epoch = spark.read.parquet(replayDir)
    val replayRows = epoch.collect().toSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(replayRows), epoch.schema)
      .write.mode("overwrite").parquet(replayDir)
    val replayed = spark.read.option("basePath", out).parquet(out)
    assert(canon(replayed.select("event_id", "user_id", "value")) === canon(ev))
  }

  test("streaming index maintenance: per-batch upserts == batch rebuild of the final corpus") {
    import spark.implicits._
    val state = tmp("graft-tfm-state")
    val ckpt = tmp("graft-tfm-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.termFreqMaintenanceSink(
      in.toDF().toDF("doc_id", "text"), state, ckpt)
    // epoch 0: the initial crawl
    in.addData((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta"))
    q.processAllAvailable()
    // epoch 1: new docs PLUS a re-crawl of doc 2 (changed text) — the
    // replacement must cross the micro-batch boundary through the
    // persisted state, not a within-batch shortcut
    in.addData((4L, "alpha"), (5L, "epsilon zeta"), (2L, "omega omega"))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val got = spark.read.parquet(s"$state/v=${versions.max}")
    val finalCorpus = Seq((1L, "alpha beta alpha"), (3L, "delta"),
      (4L, "alpha"), (5L, "epsilon zeta"), (2L, "omega omega"))
      .toDF("doc_id", "text")
    val want = graft.operators.Retrieval.termFreq(finalCorpus)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(got) === rows(want))
    // the stale posting of doc 2's first crawl is GONE, not shadowed
    assert(got.filter(col("doc_id") === 2L && col("term") === "gamma")
      .count() === 0)
  }

  test("maintenance sinks absorb retransmissions but reject conflicting same-epoch upserts") {
    import spark.implicits._
    val state = tmp("graft-uniq-state")
    val ckpt = tmp("graft-uniq-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.termFreqMaintenanceSink(
      in.toDF().toDF("doc_id", "text"), state, ckpt)
    // a bit-identical redelivery (the at-least-once retransmission
    // model) collapses silently — no double-counted terms
    in.addData((1L, "alpha alpha"), (1L, "alpha alpha"), (2L, "beta"))
    q.processAllAvailable()
    val v0 = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong).max
    val got = spark.read.parquet(s"$state/v=$v0")
    val want = graft.operators.Retrieval.termFreq(
      Seq((1L, "alpha alpha"), (2L, "beta")).toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(got) === rows(want))
    // two CONFLICTING versions of one doc in the same epoch have no
    // deterministic winner without an offset — the epoch fails loudly
    // instead of persisting a document no crawl ever produced
    in.addData((3L, "x y"), (3L, "y z"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getMessage.contains("conflicting same-epoch rows") ||
      Option(ex.getCause).exists(_.getMessage.contains("conflicting same-epoch rows")))
    q.stop()
    // the maintained state is untouched by the rejected epoch
    val vAfter = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong).max
    assert(rows(spark.read.parquet(s"$state/v=$vAfter")) === rows(want))
  }

  test("CDC maintenance: upserts + tombstones on one stream == batch index of the survivors") {
    import spark.implicits._
    val state = tmp("graft-cdc-state")
    val ckpt = tmp("graft-cdc-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.cdcTermFreqSink(
      in.toDF().toDF("doc_id", "text", "op"), state, ckpt)
    // epoch 0: initial crawl, upserts only
    in.addData((1L, "alpha beta alpha", "upsert"), (2L, "beta gamma", "upsert"),
      (3L, "delta delta", "upsert"))
    q.processAllAvailable()
    // epoch 1: a new doc, a re-crawl of doc 1, a TOMBSTONE for doc 3
    // (erasure crossing the batch boundary through persisted state),
    // and doc 5 upserted AND tombstoned in the SAME epoch — erase wins
    in.addData((4L, "epsilon", "upsert"), (1L, "omega", "upsert"),
      (3L, null, "delete"),
      (5L, "zeta zeta", "upsert"), (5L, null, "delete"))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val got = spark.read.parquet(s"$state/v=${versions.max}")
    // survivors: 1 (re-crawled text), 2, 4 — never 3 (erased) or 5
    // (erase-wins on the same-epoch collision)
    val survivors = Seq((1L, "omega"), (2L, "beta gamma"), (4L, "epsilon"))
      .toDF("doc_id", "text")
    val want = graft.operators.Retrieval.termFreq(survivors)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(got) === rows(want))
    // no ghost rows: the erased ids leave NO trace in the maintained state
    assert(got.filter(col("doc_id").isin(3L, 5L)).count() === 0)
    // the re-crawled doc's stale postings are replaced, not shadowed
    assert(got.filter(col("doc_id") === 1L && col("term") === "alpha")
      .count() === 0)
  }

  test("log-structured CDC: O(batch) deltas compose to the survivor index across compaction") {
    import spark.implicits._
    val state = tmp("graft-cdclog-state")
    val ckpt = tmp("graft-cdclog-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.cdcTermFreqLogSink(
      in.toDF().toDF("doc_id", "text", "op"), state, ckpt)
    def emptyRows = graft.operators.Retrieval.termFreq(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    def composed = StateLog.compose(spark, state, "doc_id", emptyRows)
    def want(docs: Seq[(Long, String)]) =
      graft.operators.Retrieval.termFreq(docs.toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // epoch 0: initial crawl
    in.addData((1L, "alpha beta alpha", "upsert"), (2L, "beta gamma", "upsert"),
      (3L, "delta delta", "upsert"))
    q.processAllAvailable()
    // epoch 1: re-crawl 1, tombstone 3, same-epoch collision on 5
    in.addData((1L, "omega", "upsert"), (3L, null, "delete"),
      (5L, "zeta", "upsert"), (5L, null, "delete"))
    q.processAllAvailable()
    assert(rows(composed) === rows(want(Seq(1L -> "omega", 2L -> "beta gamma"))))
    // the O(batch) claim, structurally: epoch 1's delta rows touch only
    // its own batch's doc ids (doc 2 is NOT rewritten)
    val d1 = spark.read.parquet(s"$state/delta/e=1/rows")
    assert(d1.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      .subsetOf(Set(1L, 3L, 5L)))
    // compaction folds the deltas into a base and changes nothing
    StateLog.compact(spark, state, "doc_id", emptyRows)
    assert(rows(composed) === rows(want(Seq(1L -> "omega", 2L -> "beta gamma"))))
    assert(!new java.io.File(s"$state/delta/e=1").exists())
    // epoch 2 after compaction: tombstone 2, RESURRECT 3
    in.addData((2L, null, "delete"), (3L, "reborn", "upsert"))
    q.processAllAvailable()
    q.stop()
    assert(rows(composed) === rows(want(Seq(1L -> "omega", 3L -> "reborn"))))
    // idempotent compaction epilogue: compact again, same state
    StateLog.compact(spark, state, "doc_id", emptyRows)
    assert(rows(composed) === rows(want(Seq(1L -> "omega", 3L -> "reborn"))))
  }

  test("dense log-structured CDC: composed deltas == frozen-quantizer assignment of survivors") {
    import spark.implicits._
    val state = tmp("graft-cdcivflog-state")
    val ckpt = tmp("graft-cdcivflog-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val kernel = graft.functions.NearestCells.kernel(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val in = MemoryStream[(Long, Seq[Double], String)]
    val q = Streams.cdcIvfLogSink(in.toDF().toDF("vec_id", "embedding", "op"),
      kernel, "vec_id", "embedding", state, ckpt)
    def emptyRows = graft.operators.Similarity.ivfAssign(kernel,
      Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    def composed = StateLog.compose(spark, state, "nid", emptyRows)
    in.addData((1L, Seq(1.0, 0.5), "upsert"), (2L, Seq(9.0, 9.5), "upsert"),
      (3L, Seq(0.2, 0.1), "upsert"))
    q.processAllAvailable()
    // cell-crossing re-crawl of 2, tombstone 3, same-epoch collision on 5
    in.addData((2L, Seq(0.5, 0.5), "upsert"), (3L, null, "delete"),
      (5L, Seq(8.0, 8.0), "upsert"), (5L, null, "delete"))
    q.processAllAvailable()
    q.stop()
    val want = graft.operators.Similarity.ivfAssign(kernel,
      Seq((1L, Seq(1.0, 0.5)), (2L, Seq(0.5, 0.5))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("nid")),
        r.getSeq[Double](r.fieldIndex("nv")),
        r.getInt(r.fieldIndex("cell")))).toSet
    assert(rows(composed) === rows(want))
    // epoch 1's delta rows touch only its own batch's ids
    val d1 = spark.read.parquet(s"$state/delta/e=1/rows")
    assert(d1.select("nid").distinct().collect().map(_.getLong(0)).toSet
      .subsetOf(Set(2L, 3L, 5L)))
    // compaction preserves the composition
    StateLog.compact(spark, state, "nid", emptyRows)
    assert(rows(composed) === rows(want))
  }

  test("streaming components maintenance: per-batch folds == batch rebuild over all pairs") {
    import spark.implicits._
    val state = tmp("graft-ccm-state")
    val ckpt = tmp("graft-ccm-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = Streams.componentsMaintenanceSink(
      in.toDF().toDF("a", "b"), "a", "b", state, ckpt)
    // epoch 0: two components {1,2,3} and {10,11}
    in.addData((1L, 2L), (2L, 3L), (10L, 11L))
    q.processAllAvailable()
    // epoch 1: a MERGE across the boundary (3-10 joins the two old
    // components through the persisted labeling) plus a new component
    in.addData((3L, 10L), (20L, 21L))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val got = spark.read.parquet(s"$state/v=${versions.max}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Components.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L), (20L, 21L)).toDF("a", "b"),
        "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("streaming IVF maintenance: per-batch upserts == frozen-quantizer assignment of the final corpus") {
    import spark.implicits._
    val state = tmp("graft-ivfm-state")
    val ckpt = tmp("graft-ivfm-ckpt")
    implicit val sqlCtx = spark.sqlContext
    // a trained (frozen) 2-cell quantizer: cell 0 near the origin,
    // cell 1 near (10, 10) — raw-vector assignment, so a re-crawl that
    // moves a vector across the midpoint MUST move its cell
    val kernel = graft.functions.NearestCells.kernel(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = Streams.ivfMaintenanceSink(in.toDF().toDF("vec_id", "embedding"),
      kernel, "vec_id", "embedding", state, ckpt)
    // epoch 0: the initial corpus
    in.addData((1L, Seq(1.0, 0.5)), (2L, Seq(9.0, 9.5)), (3L, Seq(0.2, 0.1)))
    q.processAllAvailable()
    // epoch 1: a new vector PLUS a re-crawl of id 2 that moves it from
    // cell 1 to cell 0 — the replacement must cross the micro-batch
    // boundary through the persisted state, not a within-batch shortcut
    in.addData((4L, Seq(8.0, 8.0)), (2L, Seq(0.5, 0.5)))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val got = spark.read.parquet(s"$state/v=${versions.max}")
    val finalCorpus = Seq((1L, Seq(1.0, 0.5)), (3L, Seq(0.2, 0.1)),
      (4L, Seq(8.0, 8.0)), (2L, Seq(0.5, 0.5))).toDF("vec_id", "embedding")
    val want = graft.operators.Similarity.ivfAssign(kernel, finalCorpus,
      "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("nid")),
        r.getSeq[Double](r.fieldIndex("nv")),
        r.getInt(r.fieldIndex("cell")))).toSet
    assert(rows(got) === rows(want))
    // the stale cell-1 row of id 2's first crawl is GONE, not shadowed
    assert(got.filter(col("nid") === 2L).count() === 1)
    assert(got.filter(col("nid") === 2L).select("cell").head.getInt(0) === 0)
  }

  test("dense CDC: upserts + tombstones == frozen-quantizer assignment of the survivors") {
    import spark.implicits._
    val state = tmp("graft-cdcivf-state")
    val ckpt = tmp("graft-cdcivf-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val kernel = graft.functions.NearestCells.kernel(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val in = MemoryStream[(Long, Seq[Double], String)]
    val q = Streams.cdcIvfSink(in.toDF().toDF("vec_id", "embedding", "op"),
      kernel, "vec_id", "embedding", state, ckpt)
    // epoch 0: initial corpus, upserts only
    in.addData((1L, Seq(1.0, 0.5), "upsert"), (2L, Seq(9.0, 9.5), "upsert"),
      (3L, Seq(0.2, 0.1), "upsert"))
    q.processAllAvailable()
    // epoch 1: a cell-crossing re-crawl of id 2, a TOMBSTONE for id 3
    // (erasure crossing the batch boundary through persisted state), and
    // id 5 upserted AND tombstoned in the SAME epoch — erase wins
    in.addData((2L, Seq(0.5, 0.5), "upsert"), (3L, null, "delete"),
      (5L, Seq(8.0, 8.0), "upsert"), (5L, null, "delete"))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val got = spark.read.parquet(s"$state/v=${versions.max}")
    val survivors = Seq((1L, Seq(1.0, 0.5)), (2L, Seq(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    val want = graft.operators.Similarity.ivfAssign(kernel, survivors,
      "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("nid")),
        r.getSeq[Double](r.fieldIndex("nv")),
        r.getInt(r.fieldIndex("cell")))).toSet
    assert(rows(got) === rows(want))
    // no ghost rows for the erased ids; the re-crawl moved id 2's cell
    assert(got.filter(col("nid").isin(3L, 5L)).count() === 0)
    assert(got.filter(col("nid") === 2L).select("cell").head.getInt(0) === 0)
  }

  test("streaming LSH maintenance: per-batch upserts == from-scratch banding of the final corpus") {
    import spark.implicits._
    val state = tmp("graft-lshm-state")
    val ckpt = tmp("graft-lshm-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = Streams.lshMaintenanceSink(in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 2, tables = 4, bitsPerTable = 6,
      seed = 42L, state, ckpt)
    // epoch 0: the initial corpus
    in.addData((1L, Seq(1.0, 0.5)), (2L, Seq(-9.0, 9.5)), (3L, Seq(0.2, 0.1)))
    q.processAllAvailable()
    // epoch 1: a new vector PLUS a re-crawl of id 2 that flips its
    // direction — its band rows must be REPLACED across the micro-batch
    // boundary through the persisted state, never shadowed
    in.addData((4L, Seq(8.0, -8.0)), (2L, Seq(0.5, 0.5)))
    q.processAllAvailable()
    q.stop()
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
    val gotBanded = spark.read.parquet(s"$state/v=${versions.max}/banded")
    val gotSlim = spark.read.parquet(s"$state/v=${versions.max}/slim")
    val finalCorpus = Seq((1L, Seq(1.0, 0.5)), (3L, Seq(0.2, 0.1)),
      (4L, Seq(8.0, -8.0)), (2L, Seq(0.5, 0.5))).toDF("vec_id", "embedding")
    // LSH is data-oblivious: the maintained state is BIT-IDENTICAL to a
    // from-scratch index over the final corpus under the same config
    val want = graft.operators.Similarity.lshIndex(finalCorpus, "vec_id",
      "embedding", dim = 2, tables = 4, bitsPerTable = 6, seed = 42L)
    def bandRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getAs[Number](r.fieldIndex("tbl")).longValue,
        r.getAs[Number](r.fieldIndex("bk")).longValue)).toSet
    assert(bandRows(gotBanded) === bandRows(want.banded))
    def slimRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getSeq[Double](r.fieldIndex("v")))).toSet
    assert(slimRows(gotSlim) === slimRows(want.slim))
    // id 2's first-crawl vector is GONE from the slim state, not shadowed
    assert(gotSlim.filter(col("id") === 2L).count() === 1)
  }

  test("dedupEvents parity: streamed doubled input == batch dedup of the same function") {
    // the q_stream_dedup scenario end-to-end on the REAL state path:
    // every mod-7 user's events re-delivered once. Originals and
    // re-deliveries are written as SEPARATE file sets, so with
    // maxFilesPerTrigger=1 every duplicate is GUARANTEED to arrive in a
    // different micro-batch from its original (a single round-robin
    // repartition of the union would only split them probabilistically).
    // delay = 90 days > the 30-day data span, so the horizon never drops
    // anything and stream == batch exactly (the within-horizon DROP
    // semantics are covered by the MemoryStream test below).
    val dir = tmp("graft-stream-dedup")
    val ev = batchEvents.select("ts", "user_id", "event_type", "value")
    ev.repartition(3).write.mode("overwrite").parquet(dir)
    ev.filter(col("user_id") % 7 === 0)
      .repartition(3).write.mode("append").parquet(dir)
    val doubled = spark.read.parquet(dir)
    runToCompletion("t_dedup_parity", OutputMode.Append()) {
      Streams.dedupEvents(
        Streams.parquetStream(spark, dir, doubled.schema,
          maxFilesPerTrigger = Some(1)), delay = "90 days")
    }
    val got = canon(spark.table("t_dedup_parity"))
    val want = canon(Streams.dedupEvents(doubled))
    assert(got.nonEmpty && got === want)
    // and the dedup actually removed the injected copies
    assert(got.size.toLong === ev.count())
  }

  test("streaming dedup within watermark drops cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    val in = MemoryStream[(Long, Timestamp)]
    val q = Streams.toMemorySink(
      in.toDF().toDF("event_id", "ts")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id"),
      "t_dedup", OutputMode.Append(), tmp("ckpt-dedup"))
    in.addData((1L, ts("10:00")), (2L, ts("10:01")))
    q.processAllAvailable()
    in.addData((1L, ts("10:02")), (3L, ts("10:03"))) // 1 is a dup within horizon
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("t_dedup").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("mapGroupsWithState carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Double, Timestamp)]
    val q = Streams.toMemorySink(
      Streams.runningMaxPerUser(spark,
        in.toDF().toDF("user_id", "value", "ts").withWatermark("ts", "10 minutes")).toDF(),
      "t_state", OutputMode.Update(), tmp("ckpt-state"))
    in.addData((1L, 5.0, t0), (2L, 2.0, t0))
    q.processAllAvailable()
    in.addData((1L, 3.0, t0)) // lower than the stored max → emitted max stays 5
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("t_state")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(emitted.count { case (u, _) => u == 1L } === 2)
    assert(emitted.filter(_._1 == 1L).map(_._2).toSet === Set(5.0))
    assert(emitted.filter(_._1 == 2L).map(_._2).toSet === Set(2.0))
  }

  test("transformWithState running max: cross-batch state on RocksDB, parity with groupBy max") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider switch to this test (the default HDFS-backed store serves
    // the other suites)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)]
      val q = Streams.toMemorySink(
        Streams.runningMaxTws(spark, in.toDF().toDF("user_id", "value")).toDF(),
        "t_tws", OutputMode.Update(), tmp("ckpt-tws"))
      in.addData((1L, 5.0), (2L, 2.0))
      q.processAllAvailable()
      in.addData((1L, 3.0), (2L, 7.0)) // 1's max survives the batch boundary
      q.processAllAvailable()
      q.stop()
      val emitted = spark.table("t_tws")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(emitted.filter(_._1 == 1L).map(_._2).toSet === Set(5.0))
      assert(emitted.filter(_._1 == 2L).map(_._2).toSet === Set(2.0, 7.0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("mapGroupsWithState evicts idle keys once the watermark passes the idle horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    val in = MemoryStream[(Long, Double, Timestamp)]
    val q = Streams.toMemorySink(
      Streams.runningMaxPerUser(spark,
          in.toDF().toDF("user_id", "value", "ts").withWatermark("ts", "10 minutes"),
          idleTimeout = "10 minutes").toDF(),
      "t_evict", OutputMode.Update(), tmp("ckpt-evict"))
    in.addData((1L, 5.0, ts("10:00")), (2L, 2.0, ts("10:00")))
    q.processAllAvailable() // wm after batch: 09:50; user 1 times out at 10:10
    in.addData((2L, 1.0, ts("11:00")))
    q.processAllAvailable() // wm advances to 10:50 — past user 1's horizon
    in.addData((2L, 1.0, ts("11:30")))
    q.processAllAvailable() // user 1 fires hasTimedOut: final snapshot + evict
    in.addData((1L, 1.0, ts("11:40")))
    q.processAllAvailable() // state is GONE: max restarts at 1.0, not 5.0
    q.stop()
    val u1 = spark.table("t_evict")
      .collect().collect { case r if r.getLong(0) == 1L => r.getDouble(1) }.toSeq
    // b1 live max (5.0), timeout snapshot (5.0), then post-eviction restart (1.0);
    // without eviction the last batch would have re-emitted 5.0
    assert(u1.sorted === Seq(1.0, 5.0, 5.0))
  }
}
