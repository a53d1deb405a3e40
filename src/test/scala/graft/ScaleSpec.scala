package graft

import graft.operators.{MultiModal, Skew}
import org.apache.spark.sql.functions._

/** Planned scale techniques beyond what AQE does automatically: bucketed
  * co-located joins (no exchange), deterministic salted aggregation for
  * known heavy-hitter keys, and the multimodal frame/resize plumbing.
  */
class ScaleSpec extends SparkSpec {

  /** Temp dir that is recursively deleted when `f` finishes (pass or
    * fail) — createTempDirectory outputs otherwise outlive the suite.
    */
  private def withTempDir[A](prefix: String)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try f(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("bucketed tables join without a shuffle") {
    val n = 8
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a fresh in-memory metastore doesn't know about leftover table dirs
    // from an earlier JVM — clear the locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(n, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(n, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    // force the sort-merge path: at this tiny sf the planner would
    // broadcast (which rightly bypasses bucketing); the property under
    // test is the co-located SMJ a large-large join takes at scale.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
      assert(plan.contains("Bucketed: true"), plan.take(1200))
      // and it computes the same thing as the plain shuffle join
      val plain = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("hive-partitioned write prunes partitions at the scan") {
    withTempDir("graft-part") { dir =>
      Tables.events(spark, sf)
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      val part = spark.read.parquet(dir).filter(col("event_type") === "click")
      val plan = part.queryExecution.executedPlan.toString
      // the predicate must become a PARTITION filter (directory pruning —
      // at 100 TB this is the difference between listing one partition and
      // scanning the table), not a post-scan data filter
      assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan.take(900))
      val expected = Tables.events(spark, sf)
        .filter(col("event_type") === "click").count()
      assert(part.count() === expected)
    }
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedAgg(ev, "event_type", "event_id", salt = 16,
        (col("value"), "v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, v)) =>
      val (n2, v2) = direct(k)
      assert(n === n2)
      assert(math.abs(v - v2) < 1e-6, s"$k: $v vs $v2")
    }
  }

  test("salted plan fans the heavy key over salt partial groups") {
    val p = Skew.saltedCount(Tables.events(spark, sf), "event_type", "event_id")
      .queryExecution.sparkPlan.toString
    // two aggregation layers around the salt column
    assert("HashAggregate".r.findAllIn(p).size >= 3, p.take(1000))
  }

  test("salted join equals direct join, including left rows with no match") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("o_orderkey"), col("c_mktsegment"))
        .collect().map(_.mkString("|")).toSeq.sorted
    // inner parity
    assert(canon(Skew.saltedJoin(orders, cust, "o_custkey", "o_orderkey", salt = 8))
      === canon(orders.join(cust, Seq("o_custkey"), "inner")))
    // left parity: drop half the dim so some fact rows go unmatched
    val halfDim = cust.filter(col("o_custkey") % 2 === 0)
    assert(canon(Skew.saltedJoin(orders, halfDim, "o_custkey", "o_orderkey",
        salt = 8, joinType = "left"))
      === canon(orders.join(halfDim, Seq("o_custkey"), "left")))
    // the salted plan really joins on (key, salt): a heavy key's fact
    // rows split across salt buckets — count per (key, bucket) > 1 bucket
    val buckets = orders.withColumn("_s",
        pmod(xxhash64(col("o_orderkey")), lit(8L)))
      .groupBy("o_custkey").agg(countDistinct(col("_s")).as("nb"))
      .agg(max("nb")).collect()(0).getLong(0)
    assert(buckets > 1, "salt failed to spread any key over multiple buckets")
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // Complements the PLANNED mitigation (Skew.saltedAgg, above): when the
    // heavy key is not known up front, AQE's runtime skew-join split is
    // the production defense. Shrink the size thresholds so the test-size
    // heavy key triggers the same code path a multi-GB partition would.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "20k")
      // one key carries 300k rows vs a ~1k-row median; payload is
      // xxhash64(id) so the shuffle bytes can't compress away under lz4
      // (AQE decides on COMPRESSED map sizes)
      val heavy = spark.range(300000)
        .select(lit(0L).as("k"), xxhash64(col("id")).as("v"))
      val uniform = spark.range(30000)
        .select((col("id") % 1000 + 1).as("k"), xxhash64(col("id")).as("v"))
      val right = spark.range(1001)
        .select(col("id").as("k"), xxhash64(col("id") + 7).as("w"))
      val agg = heavy.union(uniform).join(right, "k")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("double") + col("w").cast("double")).as("s"))
      // collect() (NOT head, which executes a separate limited plan) so
      // agg's own queryExecution carries the final adaptive plan
      assert(agg.collect()(0).getLong(0) === 330000L)
      // Assert on the adaptive plan TREE, not its string rendering (the
      // "skew=true" tag is a version-dependent formatting detail): a skew
      // split manifests as an AQEShuffleReadExec whose partition specs
      // slice a reducer partition into partial ranges.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
      val finalPlan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // QueryStageExec is a LeafExecNode — collect() stops at stage
      // boundaries — so descend into each stage's materialized plan.
      def skewReads(p: SparkPlan): Seq[SparkPlan] = p.collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => Seq(r: SparkPlan)
        case q: QueryStageExec => skewReads(q.plan)
      }.flatten
      assert(skewReads(finalPlan).nonEmpty,
        s"AQE skew split did not fire:\n${finalPlan.toString.take(2500)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("runtime Bloom-filter prunes the fact side of a selective dim join") {
    // Spark's InjectRuntimeFilter: when one join side carries a selective
    // filter, build a Bloom filter over its join keys and push a
    // might_contain() probe into the OTHER side's scan — at 100 TB this
    // skips fact rows before the shuffle, the row-level analogue of
    // dynamic partition pruning. Local thresholds are tuned for tiny
    // test data; the PLAN SHAPE (a bloom-filter semi-filter under the
    // fact scan) is the scale property.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fact side must look "big enough to be worth filtering"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      // force the shuffle-join path: broadcast joins get no bloom filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dim = Tables.part(spark, sf).filter(col("p_size") === 10)
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "no bloom filter injected:\n" + optimized.take(1500))
      // and the filtered plan computes exactly what the plain one does
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").count()
      assert(joined.collect().toSet === plain.collect().toSet)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("z-order layout: files prune on BOTH clustering columns, sort layout only on one") {
    import graft.operators.Layout
    // Two layouts of the same table: sorted by o_custkey alone vs
    // z-ordered on (o_custkey, o_totalprice). File skipping for a
    // price-band predicate = #files whose [min,max] price range
    // intersects the band. The sorted layout cannot skip (every file
    // spans the full price range); the z-layout's files are Morton
    // boxes, so a 10%-wide band touches only a fraction of them.
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val n = 8
    withTempDir("zorder") { zdir =>
      withTempDir("sorted") { sdir =>
        Layout.zorderWrite(orders, "o_custkey", "o_totalprice", n, zdir)
        orders.repartitionByRange(n, col("o_custkey"))
          .sortWithinPartitions("o_custkey")
          .write.mode("overwrite").parquet(sdir)
        def filesTouching(dir: String, lo: Double, hi: Double): (Int, Int) = {
          val parts = new java.io.File(dir).listFiles()
            .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
          val touching = parts.count { f =>
            val r = spark.read.parquet(f)
              .agg(min("o_totalprice"), max("o_totalprice")).head()
            r.getDouble(0) <= hi && r.getDouble(1) >= lo
          }
          (touching, parts.size)
        }
        val Seq(lo, hi) = {
          val q = orders.stat.approxQuantile("o_totalprice", Array(0.45, 0.55), 0.0)
          Seq(q(0), q(1))
        }
        val (zTouch, zTotal) = filesTouching(zdir, lo, hi)
        val (sTouch, sTotal) = filesTouching(sdir, lo, hi)
        assert(zTotal === n && sTotal === n)
        // sorted-by-custkey layout: every file spans the price range
        assert(sTouch === n, s"sorted layout unexpectedly skipped: $sTouch/$n")
        // z-layout: the band must actually skip files
        assert(zTouch < n, s"z-order layout never skips: $zTouch/$n")
        // and the layout is a pure reshuffle: contents unchanged
        assert(spark.read.parquet(zdir).count() === orders.count())
        assert(spark.read.parquet(zdir).agg(sum("o_orderkey")).head().getLong(0) ===
          orders.agg(sum("o_orderkey")).head().getLong(0))
      }
    }
  }

  test("dynamic partition overwrite rewrites only the partitions present in the batch") {
    // The incremental-reprocessing write mode: re-running one day/shard
    // of a 100 TB partitioned table must replace exactly that partition,
    // not truncate the table (static overwrite's behavior). Verified by
    // rewriting one l_returnflag partition with marker rows and checking
    // the other partitions' bytes survived.
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    withTempDir("dyn-overwrite") { dir =>
      try {
        val li = Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_quantity", "l_returnflag")
        li.write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
        val beforeN = spark.read.parquet(dir)
          .filter(col("l_returnflag") =!= "R").count()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        // reprocess ONLY the R partition: one marker row
        li.filter(col("l_returnflag") === "R").limit(1)
          .withColumn("l_quantity", lit(-1.0))
          .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
        val after = spark.read.parquet(dir)
        assert(after.filter(col("l_returnflag") === "R").count() === 1)
        assert(after.filter(col("l_returnflag") =!= "R").count() === beforeN,
          "dynamic overwrite touched partitions outside the batch")
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("compaction: many small files become few target-sized ones, contents unchanged") {
    import graft.operators.Layout
    val orders = Tables.orders(spark, sf)
    withTempDir("small") { sdir =>
      withTempDir("compacted") { cdir =>
        orders.repartition(64).write.mode("overwrite").parquet(sdir)
        def parquets(d: String) = new java.io.File(d).listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(parquets(sdir) === 64)
        val totalBytes = new java.io.File(sdir).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
        Layout.compact(spark, sdir, cdir, targetBytes = totalBytes / 4)
        val nOut = parquets(cdir)
        assert(nOut <= 5, s"expected ~4 compacted files, got $nOut")
        val a = spark.read.parquet(cdir)
        assert(a.count() === orders.count())
        assert(a.agg(sum("o_orderkey")).head().getLong(0) ===
          orders.agg(sum("o_orderkey")).head().getLong(0))
      }
    }
  }

  test("range-partitioned write: files carry disjoint sorted key ranges") {
    // The sorted-output write pattern: repartitionByRange + sortWithin-
    // Partitions produces files whose key ranges are disjoint and
    // internally sorted — what downstream range-pruning readers (and any
    // external consumer expecting clustered output) rely on. A plain
    // repartition would interleave keys across every file.
    import org.apache.spark.sql.functions.spark_partition_id
    val df = Tables.orders(spark, sf)
      .repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey", "o_orderkey")
    val ranges = df
      .groupBy(spark_partition_id().as("pid"))
      .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.map(_._4).sum === Tables.orders(spark, sf).count())
    // disjoint, ordered ranges: each partition's lo exceeds the previous hi
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(lo2 > hi1, ranges.mkString(","))
      case _ =>
    }
  }

  test("parquet aggregate pushdown: MIN/MAX/COUNT answered from footer statistics") {
    // scan-level aggregate pushdown (DSv2 parquet path): a bare
    // min/max/count over an unfiltered scan reads row-group FOOTERS, not
    // data pages — at 100 TB that's the difference between a metadata
    // pass and a full-table read. V1 parquet (the default) doesn't
    // support it, so scope both flags to this test.
    val conf = Seq(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.catalog.clearCache()
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(min("l_quantity"), max("l_quantity"), count(lit(1)))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [MIN(l_quantity), MAX(l_quantity), COUNT(*)]"),
        p.take(1200))
      // and the footer answer equals the full-scan answer
      val viaFooter = df.head
      conf.foreach { case (k, _) => spark.conf.unset(k) }
      spark.catalog.clearCache()
      val viaScan = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(min("l_quantity"), max("l_quantity"), count(lit(1))).head
      assert(viaFooter === viaScan)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("ORC and JSON round-trips preserve values (source/sink breadth)") {
    // parquet is the verified primary format; ORC and JSON(lines) are the
    // other two formats a lakehouse ingest actually meets. DuckDB can't
    // read ORC, so these are write→read parity checks, not oracle rows.
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val want = canon(src)
    withTempDir("graft-orc") { orcDir =>
      src.write.mode("overwrite").orc(orcDir)
      assert(canon(spark.read.orc(orcDir)) === want)
      // and ORC pushes filters like parquet does (same scan contract)
      val plan = spark.read.orc(orcDir).filter(col("o_totalprice") > 100000)
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan.take(600))
    }
    withTempDir("graft-json") { jsonDir =>
      src.write.mode("overwrite").json(jsonDir)
      // JSON is schemaless on disk: read back with the writer's schema so
      // longs don't come back widened
      assert(canon(spark.read.schema(src.schema).json(jsonDir)) === want)
    }
    withTempDir("graft-xml") { xmlDir =>
      // XML is a first-class datasource in Spark 4 (spark-xml merged
      // upstream) — the feed-ingest format crawl/vendor drops still
      // arrive in. Same write→read parity contract as ORC/JSON; rowTag
      // is mandatory on both sides, and like JSON the on-disk form is
      // schemaless so the read supplies the writer's schema.
      src.write.mode("overwrite").option("rowTag", "order").xml(xmlDir)
      assert(canon(spark.read.schema(src.schema)
        .option("rowTag", "order").xml(xmlDir)) === want)
    }
  }

  test("dirty ingestion: PERMISSIVE quarantines corrupt rows, FAILFAST throws") {
    // What a 100 TB crawl ingest actually meets: malformed lines. The
    // engine contract is mode-selectable — PERMISSIVE keeps the scan
    // alive and routes broken rows to _corrupt_record for a quarantine
    // sink; FAILFAST turns the first broken row into a job error for
    // contractual feeds. DROPMALFORMED silently narrows the corpus and
    // is deliberately NOT used anywhere in this engine.
    import org.apache.spark.sql.types._
    withTempDir("graft-dirty") { dir =>
      val p = java.nio.file.Paths.get(dir, "rows.csv")
      java.nio.file.Files.writeString(p,
        "1,alpha,10\n2,beta,not_a_number\n3,gamma,30\n")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("qty", LongType), StructField("_corrupt_record", StringType)))
      val got = spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir + "/rows.csv")
        .cache() // corrupt-record column cannot be queried alone without it
      assert(got.count() === 3)
      assert(got.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(got.filter(col("_corrupt_record").isNull)
        .agg(sum("qty")).head.getLong(0) === 40)
      got.unpersist(blocking = false)
      val strictSchema = StructType(schema.fields.filter(_.name != "_corrupt_record"))
      val thrown = intercept[Exception] {
        spark.read.schema(strictSchema)
          .option("mode", "FAILFAST").csv(dir + "/rows.csv").collect()
      }
      assert(thrown.getMessage.toLowerCase.contains("malformed")
        || thrown.getCause != null, thrown.getMessage.take(300))
    }
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    // Incremental pipelines add columns over time; old files must stay
    // readable next to new ones. mergeSchema reconciles the footers —
    // absent columns read as NULL — so a corpus never needs rewriting
    // just to add a field.
    withTempDir("graft-evolve") { dir =>
      Tables.nation(spark, sf).select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(dir + "/gen=1")
      Tables.nation(spark, sf)
        .select(col("n_nationkey"), col("n_name"), lit("v2").as("ingest_tag"))
        .write.mode("overwrite").parquet(dir + "/gen=2")
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.columns.toSet ===
        Set("n_nationkey", "n_name", "ingest_tag", "gen"))
      val n = Tables.nation(spark, sf).count()
      assert(merged.count() === 2 * n)
      // old generation surfaces the new column as NULL, new one is filled
      assert(merged.filter(col("gen") === 1)
        .filter(col("ingest_tag").isNull).count() === n)
      assert(merged.filter(col("gen") === 2)
        .filter(col("ingest_tag") === "v2").count() === n)
    }
  }

  test("balancedSample equalizes strata deterministically") {
    val docs = Tables.documents(spark, sf)
    val got = graft.operators.Sampling.balancedSample(docs, "lang", "doc_id")
    val sizes = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = docs.groupBy("lang").count()
      .agg(min("count")).head.getLong(0)
    // every stratum lands within Bernoulli noise of the smallest stratum
    sizes.foreach { case (lang, n) =>
      assert(math.abs(n - minCnt) <= math.max(8L, (minCnt * 0.45).toLong),
        s"$lang: $n vs target $minCnt")
    }
    // keyed hash ⇒ identical output on re-evaluation
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      graft.operators.Sampling.balancedSample(docs, "lang", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("frame sampling: coverage and determinism") {
    import spark.implicits._
    val media = MultiModal.withPayload(Tables.documents(spark, sf).limit(20))
      .select(col("doc_id").as("docId"), col("payload"), col("meta"))
      .as[MultiModal.MediaRecord]
    val all = MultiModal.sampleFrames(spark, media, frameSize = 16, every = 1)
      .collect().groupBy(_.docId)
    val sampled = MultiModal.sampleFrames(spark, media, frameSize = 16, every = 3)
      .collect().groupBy(_.docId)
    val payloads = media.collect().map(m => m.docId -> m.payload).toMap
    payloads.foreach { case (id, p) =>
      val expFrames = (p.length + 15) / 16
      assert(all(id).length === expFrames)
      // frames reassemble to the payload exactly
      val rejoined = all(id).sortBy(_.frameIdx).flatMap(_.bytes)
      assert(rejoined.toSeq === p.toSeq)
      assert(sampled(id).map(_.frameIdx).toSet ===
        (0 until expFrames).filter(_ % 3 == 0).toSet)
    }
  }

  test("resize: bounded output, short payloads untouched, deterministic") {
    import spark.implicits._
    val media = MultiModal.withPayload(Tables.documents(spark, sf).limit(20))
      .select(col("doc_id").as("docId"), col("payload"), col("meta"))
      .as[MultiModal.MediaRecord]
    val orig = media.collect().map(m => m.docId -> m.payload).toMap
    val resized = MultiModal.resize(spark, media, targetLen = 32)
      .collect().map(m => m.docId -> m.payload).toMap
    orig.foreach { case (id, p) =>
      if (p.length <= 32) assert(resized(id).toSeq === p.toSeq)
      else {
        assert(resized(id).length === 32)
        assert(resized(id)(0) === p(0)) // stride keeps the first byte
      }
    }
    val resized2 = MultiModal.resize(spark, media, targetLen = 32)
      .collect().map(m => m.docId -> m.payload.toSeq).toMap
    assert(resized.map { case (k, v) => k -> v.toSeq } === resized2)
  }
}
