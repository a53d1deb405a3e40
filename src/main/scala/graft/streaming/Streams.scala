package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2B streaming row): file
  * source, tumbling & sliding event-time windows, watermark with
  * late-data drop, append & update output modes, and a custom keyed-state
  * operator via `mapGroupsWithState`.
  *
  * Every transform here is defined ONCE over an unbound DataFrame — the
  * identical function composes over `spark.read` (batch) and
  * `spark.readStream` (incremental). That is the parity contract: the
  * streaming result on a fully-processed bounded input must equal the
  * batch result of the same function (StreamingSpec asserts it), and it is
  * also the 100 TB posture — windowed aggregation state is bounded by
  * (windows in watermark horizon × keys), never by input size, and the
  * watermark bounds state eviction exactly like a shuffle-partition-local
  * GC. No DStream API anywhere (SURVEY.md §1 Spark mapping).
  *
  * Reference scope: the reference repo (swguo/NCHU.BigData) has no
  * streaming; this group is mandated by BASELINE.json / SURVEY §2B.
  */
object Streams {

  /** Tumbling event-time window aggregation (count + sum per event_type).
    * Works unchanged on batch and streaming inputs; on a stream, pair with
    * [[watermarked]] so state for closed windows is evicted.
    */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      // sum through DECIMAL(18,2), the corpus-wide money discipline:
      // a raw double sum's partial-merge order varies with partitioning,
      // and at large window populations the reorder noise reaches the
      // round-to-6 boundary — a shuffle-order-dependent result
      .agg(count(lit(1)).as("n"),
        graft.functions.Num.sumMoney(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding event-time windows: each event lands in width/slide windows.
    * Spark expands the window set per row (a Generate, narrow) and then
    * hash-aggregates — the shuffle key is (window, event_type), so partial
    * aggregation applies exactly as in the tumbling case.
    */
  def slidingAgg(events: DataFrame, width: String = "1 hour",
                 slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Num.sumMoney(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Session windows: per-key activity bursts separated by ≥ `gap` of
    * silence. Spark merges events whose gaps stay under `gap` into one
    * [first, last+gap) window — state per open session is constant, and
    * with a watermark closed sessions are finalized and evicted, so a
    * 100 TB/day stream holds only in-horizon sessions. Same
    * batch/streaming parity contract as the fixed windows.
    */
  def sessionAgg(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"), col("user_id"), col("n"))

  /** Stream-stream interval join: each click joins the same user's
    * purchases in the trailing `horizon`. The event-time bound on BOTH
    * sides is what makes this runnable forever: with watermarks, Spark
    * GCs each side's join state once rows fall out of the horizon —
    * state is O(events in horizon), never O(stream). The same function
    * on batch inputs (watermark = no-op) is the plain interval join,
    * which is the parity oracle and the DuckDB-checked batch projection.
    */
  def clickPurchaseJoin(events: DataFrame, horizon: String = "24 hours",
                        delay: String = "10 minutes"): DataFrame =
    clickPurchaseJoined(events, horizon, delay, "inner")
      .select(col("click_id"), col("p_id"), col("user_id"),
        round(col("value"), 6).as("value"))

  /** The ONE click→purchase interval-join definition both variants
    * share: the inner and left-outer results must stay semantically
    * identical up to join type for the outer variant's parity oracle to
    * hold, so the sides and the horizon condition are defined exactly
    * once.
    */
  private def clickPurchaseJoined(events: DataFrame, horizon: String,
                                  delay: String, joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", delay)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr(s"INTERVAL $horizon") &&
        col("p_ts") <= col("c_ts"),
      joinType)
  }

  /** LEFT OUTER stream-stream interval join: same click→purchase window
    * as [[clickPurchaseJoin]], but clicks with NO purchase in the
    * horizon are emitted once with null purchase columns. On a stream
    * the null verdict is TIME-GATED, not a different algorithm: a
    * click's outer row can only be emitted after the purchase-side
    * watermark passes its click time (no matching purchase can arrive
    * anymore) — which is why Spark requires watermarks on both sides
    * plus a time-bound condition for outer stream joins, and why the
    * last `delay` of clicks in a drained finite stream never get their
    * outer verdict (StreamingSpec's parity test accounts for exactly
    * that cutoff). Keeps c_ts in the output so the decidability cutoff
    * is checkable downstream.
    */
  def clickPurchaseJoinOuter(events: DataFrame, horizon: String = "24 hours",
                             delay: String = "10 minutes"): DataFrame =
    clickPurchaseJoined(events, horizon, delay, "leftOuter")
      .select(col("click_id"), col("c_ts"), col("p_id"), col("user_id"),
        round(col("value"), 6).as("value"))

  /** Stream–static broadcast join: enrich each event with its user's
    * dimension attributes. STATELESS — unlike a stream-stream join there
    * is no join state at all: every micro-batch joins against the
    * (broadcast) static side and forgets it, so this is the right shape
    * for slowly-changing dims of any stream volume. The broadcast hint
    * means the stream side never shuffles — at 100 TB/day the per-batch
    * cost is a map-side hash probe. The same function on a batch events
    * DataFrame is the parity oracle and the DuckDB-checked projection.
    */
  def enrichWithUserDim(events: DataFrame, customerDim: DataFrame): DataFrame =
    events.join(
        broadcast(customerDim.select(col("c_custkey"), col("c_mktsegment"),
          col("c_nationkey"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"), col("c_nationkey").as("nationkey"))

  /** Streaming deduplication — the ingest-side retransmission filter a
    * training-data pipeline puts in front of every downstream consumer
    * (at-least-once sources re-deliver; exactly-once processing does not
    * un-duplicate the SOURCE). A retransmission is a bit-identical
    * re-delivery, so the key is the FULL projected row (user_id,
    * event_type, ts, value): exact-copy semantics on both engines, with
    * no reliance on any payload-determined-by-key data invariant — two
    * genuinely distinct events that collide on (user_id, event_type, ts)
    * but differ in value both survive, exactly like the oracle's
    * DISTINCT.
    *
    * On a stream this is `dropDuplicatesWithinWatermark`: per-key seen
    * state is GC'd once the watermark passes `delay` beyond the key's
    * event time, so state is O(events in horizon) — the only dedup
    * contract that runs forever. (Plain streaming `dropDuplicates`
    * would keep every key ever seen.) The within-horizon guarantee is
    * exactly the retransmission model: a replay arrives seconds-to-
    * minutes after the original, never past the delivery horizon. On a
    * batch frame the same call is not accepted by Spark (and the
    * horizon is vacuous when all data is present), so the batch
    * projection — the DuckDB-checked q_stream_dedup — is plain
    * `dropDuplicates` on the same key; StreamingSpec runs THIS function
    * under readStream against the batch result (parity), and the
    * within-watermark drop semantics have their own MemoryStream test.
    */
  def dedupEvents(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val keyed = events.select(col("ts"), col("user_id"), col("event_type"),
      col("value"))
    if (keyed.isStreaming)
      keyed.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("user_id", "event_type", "ts", "value")
    else keyed.dropDuplicates("user_id", "event_type", "ts", "value")
  }

  /** Event-time watermark: rows more than `delay` behind the max observed
    * event time are dropped by stateful operators, which is what lets a
    * 100 TB/day stream run with bounded state.
    */
  def watermarked(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** File-source stream over a parquet directory. Streaming sources don't
    * infer schemas (a listing race could silently change the plan), so the
    * caller supplies one — normally `batchDf.schema`.
    */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Start a query into an in-memory table `name` (test/debug sink; the
    * production sinks are `parquet`/`kafka` via the same writeStream).
    */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode,
                   checkpointDir: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", checkpointDir)
      .outputMode(mode).start()

  /** foreachBatch sink with batch-id idempotence — the canonical escape
    * hatch for sinks without a streaming connector (JDBC, object-store
    * layouts, multi-destination writes). Exactly-once falls out of
    * IDEMPOTENCE, not atomic commit: each micro-batch overwrites the
    * directory keyed by its epoch id, so a retried epoch (failure after
    * write, before checkpoint commit) rewrites the identical bytes
    * instead of duplicating them. Downstream reads the directory tree as
    * one partitioned table.
    */
  def idempotentBatchSink(df: DataFrame, dir: String,
                          checkpointDir: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/batch=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Retransmission-absorbing uniqueness gate for a maintenance batch:
    * exact duplicate rows collapse via distinct() (at-least-once
    * sources re-deliver bit-identical rows — the [[dedupEvents]]
    * retransmission model), but two CONFLICTING versions of one key in
    * the SAME epoch fail loudly: without a per-key total order (an
    * offset column, collapsed to the max offset upstream) there is no
    * deterministic winner, and silently folding both corrupts the
    * maintained state — upsertTermFreq would merge the term counts of
    * BOTH texts into a document no crawl ever produced, ivfUpsert/
    * lshUpsert would keep duplicate postings — breaking every sink's
    * pinned state == batch-rebuild identity. One O(batch) bounded check
    * per epoch (limit(1) — existence, not enumeration).
    */
  private def requireUniquePerKey(batch: DataFrame, keyCol: String,
                                  what: String): DataFrame = {
    val uniq = batch.distinct()
    val dup = uniq.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$what: conflicting same-epoch rows for $keyCol=${dup.head.get(0)} — " +
        "a source with a per-key order must collapse to the max offset " +
        "per key before this sink; without one the winner is undefined")
    uniq
  }

  /** STREAMING lexical-index maintenance: [[graft.operators.Retrieval
    * .upsertTermFreq]] applied per micro-batch through foreachBatch —
    * the continuous-ingest path of the inverted index. Each arriving
    * batch of new/re-crawled docs drops its ids' stale postings (one
    * anti-join against the current state) and appends its re-tokenized
    * ones; cost per batch is O(batch + state), never a corpus
    * re-tokenization. State is the n-proportional tf parquet, written
    * VERSIONED per epoch (`v=<batchId>`): a retried epoch overwrites
    * its OWN version directory and re-reads the same predecessor, so
    * replays are idempotent (the [[idempotentBatchSink]] discipline —
    * read-modify-write against the path being read would corrupt it).
    * The version listing goes through Hadoop's FileSystem API, so an
    * HDFS/S3A state dir lists correctly (java.io.File against a remote
    * scheme returns null, which would silently rebuild every batch from
    * EMPTY state — corrupting the maintained statistic); a production
    * deployment swaps in its table format's manifest — the per-batch
    * algebra is the operator, not the listing. StreamingSpec pins
    * stream-maintained state == a from-scratch batch rebuild over the
    * final corpus, with the re-crawl split across micro-batches.
    */
  def termFreqMaintenanceSink(docs: DataFrame, stateDir: String,
                              checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = requireUniquePerKey(batch, "doc_id", "termFreqMaintenanceSink")
        val old = latestStateVersion(spark, stateDir, id)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
          .getOrElse(graft.operators.Retrieval.termFreq(b.limit(0)))
        graft.operators.Retrieval.upsertTermFreq(old, b)
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** STREAMING dense-index maintenance — the [[termFreqMaintenanceSink]]
    * symmetry for the ANN family ([[graft.operators.Similarity
    * .ivfUpsert]] applied per micro-batch through foreachBatch): each
    * arriving vector batch drops its ids' stale postings from the
    * persisted IVF assignment (one anti-join against current state) and
    * enters through the FROZEN quantizer's nearest-cell assignment —
    * O(batch + state) per epoch, never a corpus re-encode or a Lloyd
    * re-run (retraining is a separate, rarer epoch event — the trade
    * every production IVF deployment makes). State is the
    * n-proportional `assigned` parquet (nid, nv, nnrm, cell), written
    * VERSIONED per epoch with the same idempotence contract as the
    * lexical sink: a retried epoch overwrites its OWN `v=<batchId>`
    * directory and re-reads the same predecessor. StreamingSpec pins
    * stream-maintained state == frozen-quantizer batch assignment of
    * the final corpus, with a re-crawl split across micro-batches.
    */
  def ivfMaintenanceSink(vecs: DataFrame,
                         kernel: graft.functions.NearestCellsKernel,
                         idCol: String, vecCol: String,
                         stateDir: String,
                         checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Similarity
        val b = requireUniquePerKey(batch, idCol, "ivfMaintenanceSink")
        // first epoch: an EMPTY frame in the assigned schema (same
        // limit(0) trick as the lexical sink's termFreq seed)
        val prev = latestStateVersion(spark, stateDir, id)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
          .getOrElse(Similarity.ivfAssign(kernel, b.limit(0), idCol, vecCol))
        val idx = Similarity.IvfIndex(prev,
          prev.select(col("nid").as("id"), col("nv").as("v"),
            col("nnrm").as("nrm")),
          kernel)
        Similarity.ivfUpsert(idx, b, idCol, vecCol).assigned
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** STREAMING LSH-index maintenance — the third maintenance sink
    * (lexical tf, IVF, now LSH — VERDICT r15 #8): [[graft.operators
    * .Similarity.lshUpsert]] applied per micro-batch through
    * foreachBatch. LSH is data-oblivious (the hyperplanes are a pure
    * function of the CONFIG — dim/tables/bits/seed — which is pinned at
    * sink creation, the deployment's index epoch), so each maintained
    * state is BIT-IDENTICAL to a from-scratch rebuild over the corpus
    * as of that epoch; re-crawled ids drop their stale band rows by
    * anti-join and re-band under the same config. State is the two
    * n-proportional frames of [[graft.operators.Similarity.LshIndex]]
    * — `banded` (id, tbl, bk) and `slim` (id, v, nrm) — written
    * VERSIONED per epoch under `v=<batchId>/{banded,slim}` with the
    * same retry-idempotence contract as the other two sinks: a replayed
    * epoch overwrites its OWN version and re-reads the same
    * predecessor. StreamingSpec pins stream-maintained state ==
    * from-scratch [[graft.operators.Similarity.lshIndex]] over the
    * final corpus, with a re-crawl split across micro-batches.
    */
  def lshMaintenanceSink(vecs: DataFrame, idCol: String, vecCol: String,
                         dim: Int, tables: Int, bitsPerTable: Int,
                         seed: Long, stateDir: String,
                         checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Similarity
        val b = requireUniquePerKey(batch, idCol, "lshMaintenanceSink")
        val prev = latestStateVersion(spark, stateDir, id) match {
          case Some(v) => Similarity.LshIndex(
            spark.read.parquet(s"$stateDir/v=$v/banded"),
            spark.read.parquet(s"$stateDir/v=$v/slim"),
            dim, tables, bitsPerTable, seed)
          // first epoch: EMPTY frames in the index schema (the limit(0)
          // seed trick of the other two sinks, through lshIndex itself
          // so the schema can never drift from the operator's)
          case None => Similarity.lshIndex(b.limit(0), idCol, vecCol,
            dim, tables, bitsPerTable, seed)
        }
        val up = Similarity.lshUpsert(prev, b, idCol, vecCol)
        up.banded.write.mode("overwrite").parquet(s"$stateDir/v=$id/banded")
        up.slim.write.mode("overwrite").parquet(s"$stateDir/v=$id/slim")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** CDC maintenance sink — ONE stream carrying both upserts AND delete
    * tombstones, the change-data-capture shape a production ingest
    * actually emits (a crawler retracts URLs, a GDPR queue erases
    * users, a re-crawl replaces texts — all on the same feed). Rows
    * are (doc_id, text, op) with op ∈ {'upsert','delete'} (tombstones
    * carry a null/ignored text); each epoch folds BOTH legs into the
    * persisted tf state through the two lifecycle operators this sink
    * composes: state' = [[graft.operators.Retrieval.deleteDocs]](
    * [[graft.operators.Retrieval.upsertTermFreq]](prev, upserts),
    * tombstones) — O(batch + state) per epoch, never a corpus rescan.
    *
    * Within one epoch the two legs are SETS, not an ordered log, so
    * the fold fixes the ambiguity by rule: ERASE WINS — a doc_id
    * appearing on both legs of the same micro-batch ends the epoch
    * deleted (the delete leg applies last). That is the GDPR-correct
    * default (an erasure request is never lost to a concurrent
    * re-crawl); a source with a total per-key order (a Kafka offset)
    * that needs last-writer-wins instead should collapse to the max
    * offset per key BEFORE this sink. Same epoch-versioned
    * retry-idempotence contract as the other maintenance sinks: a
    * replayed epoch overwrites its OWN `v=<batchId>` and re-reads the
    * same predecessor. StreamingSpec pins stream-maintained state ==
    * batch [[graft.operators.Retrieval.termFreq]] over the surviving
    * final corpus, with the tombstone and the erase-wins collision
    * both crossing micro-batch boundaries.
    */
  def cdcTermFreqSink(changes: DataFrame, stateDir: String,
                      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Retrieval
        val prev = latestStateVersion(spark, stateDir, id)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
          .getOrElse(Retrieval.termFreq(
            batch.limit(0).select(col("doc_id"), col("text"))))
        val ups = requireUniquePerKey(
          batch.filter(col("op") === "upsert")
            .select(col("doc_id"), col("text")),
          "doc_id", "cdcTermFreqSink")
        val tombs = batch.filter(col("op") === "delete").select(col("doc_id"))
        Retrieval.deleteDocs(Retrieval.upsertTermFreq(prev, ups), tombs)
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Dense-side CDC maintenance — [[cdcTermFreqSink]]'s twin for the
    * ANN family: ONE stream of (id, vector, op) rows with op ∈
    * {'upsert','delete'} (tombstones carry a null/ignored vector), each
    * epoch folding both legs through the frozen-quantizer lifecycle
    * operators — state' = [[graft.operators.Similarity.ivfDelete]](
    * [[graft.operators.Similarity.ivfUpsert]](prev, upserts),
    * tombstones) — under the same ERASE-WINS same-epoch rule and
    * epoch-versioned retry-idempotence contract as the lexical CDC
    * sink. O(batch + state) per epoch; retraining the quantizer stays a
    * separate, rarer epoch event exactly as in [[ivfMaintenanceSink]].
    * StreamingSpec pins maintained state == frozen-quantizer batch
    * assignment of the surviving corpus, with the tombstone and the
    * same-epoch upsert+delete collision both crossing micro-batch
    * boundaries.
    */
  def cdcIvfSink(changes: DataFrame,
                 kernel: graft.functions.NearestCellsKernel,
                 idCol: String, vecCol: String,
                 stateDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Similarity
        val prev = latestStateVersion(spark, stateDir, id)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
          .getOrElse(Similarity.ivfAssign(kernel,
            batch.limit(0).select(col(idCol), col(vecCol)), idCol, vecCol))
        val idx = Similarity.IvfIndex(prev,
          prev.select(col("nid").as("id"), col("nv").as("v"),
            col("nnrm").as("nrm")),
          kernel)
        val ups = requireUniquePerKey(
          batch.filter(col("op") === "upsert").select(col(idCol), col(vecCol)),
          idCol, "cdcIvfSink")
        val tombs = batch.filter(col("op") === "delete").select(col(idCol))
        Similarity.ivfDelete(Similarity.ivfUpsert(idx, ups, idCol, vecCol),
            tombs, idCol)
          .assigned.write.mode("overwrite").parquet(s"$stateDir/v=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** LOG-STRUCTURED CDC maintenance — [[cdcTermFreqSink]] with the
    * write amplification fixed ([[StateLog]]'s scaladoc has the full
    * argument): instead of rewriting the whole tf state every epoch
    * (O(state) bytes per micro-batch), each epoch writes ONLY its
    * delta — the batch's ownership claims plus the re-tokenized rows
    * of its upserts, O(batch) bytes — and readers compose base +
    * deltas by highest-epoch-wins arg-max ([[StateLog.compose]];
    * amortized via [[StateLog.compact]]). Semantics are identical to
    * the eager sink: whole-doc replacement on upsert, tombstones
    * erase, ERASE WINS on a same-epoch collision (the tombstone
    * anti-join below runs before termFreq, so a doc both upserted and
    * tombstoned claims ownership with NO rows), and a replayed epoch
    * overwrites its own delta directory. StreamingSpec pins composed
    * state == batch termFreq of the survivors across re-crawls,
    * cross-batch tombstones, a resurrection, and a mid-stream
    * compaction — and that each delta's rows touch only its own
    * batch's doc ids (the O(batch) claim, structurally).
    */
  def cdcTermFreqLogSink(changes: DataFrame, stateDir: String,
                         checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import graft.operators.Retrieval
        val tombs = batch.filter(col("op") === "delete")
          .select(col("doc_id")).distinct()
        val ups = requireUniquePerKey(
          batch.filter(col("op") === "upsert")
            .select(col("doc_id"), col("text")),
          "doc_id", "cdcTermFreqLogSink")
          .join(tombs, Seq("doc_id"), "left_anti")
        val owned = batch.select(col("doc_id")).distinct()
        StateLog.writeDelta(stateDir, id, owned, Retrieval.termFreq(ups))
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Dense-side log-structured CDC — [[cdcTermFreqLogSink]]'s twin for
    * the IVF family, same [[StateLog]] layout with the frozen-quantizer
    * assignment as the per-epoch rows: each epoch writes its ownership
    * claims plus [[graft.operators.Similarity.ivfAssign]] of the
    * upserts (O(batch) bytes — the assignment is per-vector, so a
    * batch's rows never touch another vector's state), tombstones are
    * rowless claims, erase wins same-epoch collisions, and readers
    * compose by highest-epoch-wins arg-max on `nid`. StreamingSpec
    * pins composed state == frozen-quantizer batch assignment of the
    * survivors across a cell-crossing re-crawl and a compaction.
    */
  def cdcIvfLogSink(changes: DataFrame,
                    kernel: graft.functions.NearestCellsKernel,
                    idCol: String, vecCol: String,
                    stateDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import graft.operators.Similarity
        val tombs = batch.filter(col("op") === "delete")
          .select(col(idCol)).distinct()
        val ups = requireUniquePerKey(
          batch.filter(col("op") === "upsert").select(col(idCol), col(vecCol)),
          idCol, "cdcIvfLogSink")
          .join(tombs, Seq(idCol), "left_anti")
        // own and rows must share the composition key: assigned rows key
        // on `nid`, so the claims rename to it
        val owned = batch.select(col(idCol).cast("long").as("nid")).distinct()
        StateLog.writeDelta(stateDir, id, owned,
          Similarity.ivfAssign(kernel, ups, idCol, vecCol))
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** STREAMING dedup-cluster maintenance — the fourth maintenance-sink
    * family (lexical tf, IVF, LSH, now the component labeling):
    * [[graft.operators.Components.incrementalComponents]] applied per
    * micro-batch through foreachBatch, so each epoch of verified
    * near-dup pairs folds into the persisted (id, comp) labeling at
    * O(batch ⋈ labels) — the historical edge set never reappears,
    * exactly the property that makes the incremental fold the only
    * affordable shape on a 100 TB pair stream. State is the
    * n-proportional labels parquet, epoch-versioned with the shared
    * retry-idempotence contract (the fold is deterministic, so a
    * replayed epoch rewrites identical bytes). First epoch seeds from
    * an empty labeling THROUGH the operator itself (limit(0), so the
    * schema can never drift). StreamingSpec pins stream-maintained
    * labels == a from-scratch [[graft.operators.Components
    * .connectedComponents]] over all pairs, with a merge that crosses
    * the micro-batch boundary through the persisted state.
    */
  def componentsMaintenanceSink(pairs: DataFrame, aCol: String, bCol: String,
                                stateDir: String,
                                checkpointDir: String): StreamingQuery =
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Components
        val prev = latestStateVersion(spark, stateDir, id)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
          .getOrElse(Components.connectedComponents(batch.limit(0), aCol, bCol))
        Components.incrementalComponents(prev, batch, aCol, bCol)
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Newest `v=<epoch>` state version strictly before `beforeId`, via
    * Hadoop FileSystem (scheme-correct on HDFS/S3A, unlike
    * java.io.File, whose null on a remote path would read as "no state"
    * and silently reset the maintained statistic every micro-batch).
    * A missing state dir (first epoch) is the one legitimate
    * empty-state case.
    */
  private[streaming] def latestStateVersion(spark: SparkSession,
                                            stateDir: String,
                                            beforeId: Long): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ < beforeId)
      .sorted.lastOption
  }

  case class UserMax(user_id: Long, max_value: Double)

  /** The same running-max through Spark 4's `transformWithState` — the
    * successor API to mapGroupsWithState: typed per-key state handles
    * (ValueState/ListState/MapState) with optional TTL, timers, and a
    * RocksDB-backed store (required by the operator; the test session
    * switches `spark.sql.streaming.stateStore.providerClass`). State here
    * is one ValueState[Double] per key — same constant-per-key
    * discipline; at 100 TB/day the RocksDB store spills cold keys to
    * disk instead of holding the map heap-resident, which is exactly why
    * the new API is the scale path.
    */
  class RunningMaxProcessor
      extends StatefulProcessor[Long, (Long, Double), UserMax] {
    @transient private var mx: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mx = getHandle.getValueState[Double]("max", Encoders.scalaDouble,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 tv: TimerValues): Iterator[UserMax] = {
      var m = if (mx.exists()) mx.get() else Double.NegativeInfinity
      rows.foreach { case (_, v) => if (v > m) m = v }
      mx.update(m)
      Iterator.single(UserMax(key, m))
    }
  }

  def runningMaxTws(spark: SparkSession, events: DataFrame): Dataset[UserMax] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Custom keyed state via `mapGroupsWithState`: running max value per
    * user, state = one double per key (constant per key — the bounded-
    * state discipline from SURVEY §2A's anti-pattern note). Emits the
    * updated max for every key seen in the micro-batch (update mode).
    * The same function on a batch Dataset (empty initial state, one
    * "batch") degenerates to groupBy(user).max(value) — parity-tested.
    *
    * State per key is constant-size, but KEY CARDINALITY is not — at
    * 100 TB/day of events an untimed state store grows with every user
    * ever seen. The event-time timeout evicts a key once the watermark
    * passes `last event ts + idleTimeout`: the timed-out callback emits a
    * final snapshot and removes the state, so the store holds only keys
    * active within the idle horizon. Streaming callers must therefore
    * apply `withWatermark` on `ts` upstream (event-time timeouts require
    * one); in batch execution the timeout never fires and the function
    * still degenerates to groupBy/max.
    */
  def runningMaxPerUser(spark: SparkSession, events: DataFrame,
                        idleTimeout: String = "30 minutes"): Dataset[UserMax] = {
    import spark.implicits._
    val idleMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleTimeout))
    // month/year intervals are calendar-ambiguous (and were silently
    // dropped here, turning "1 month" into a 0 ms horizon that evicted
    // every key at the first watermark) — reject them up front
    require(idleMs.months == 0,
      s"idleTimeout '$idleTimeout': month/year intervals are " +
        "calendar-ambiguous for an idle horizon — use days/hours/minutes")
    val idleMillis = idleMs.days * 86400000L + idleMs.microseconds / 1000L
    events.select(col("user_id"), col("value"), col("ts"))
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Double, java.sql.Timestamp)],
         state: GroupState[Double]) =>
          if (state.hasTimedOut) {
            // idle horizon passed: final snapshot, then evict
            val mx = state.get
            state.remove()
            UserMax(uid, mx)
          } else {
            var mx = state.getOption.getOrElse(Double.NegativeInfinity)
            var lastTs = Long.MinValue
            it.foreach { case (_, v, ts) =>
              if (v > mx) mx = v
              if (ts != null && ts.getTime > lastTs) lastTs = ts.getTime
            }
            state.update(mx)
            if (lastTs != Long.MinValue)
              state.setTimeoutTimestamp(lastTs + idleMillis)
            UserMax(uid, mx)
          }
      }
  }
}
