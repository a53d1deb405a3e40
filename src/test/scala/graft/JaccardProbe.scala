package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for q_jaccard_pairs stages (test scope, not shipped). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]",
      appName = "jaccard-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan
    import graft.operators.Dedup
    val sets = docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text")).as("sh"))
    time("udf pass (sets noop)") {
      sets.write.format("noop").mode("overwrite").save()
    }
    val hotSet = time("hot-set job") {
      sets.select(explode(col("sh")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > 256).select("h").collect().map(_.getLong(0)).toSet
    }
    println(s"[probe] hot set size: ${hotSet.size}")
    val prefixOf = udf { (sh: Seq[Long]) =>
      val sz = sh.length
      val px = sz - math.ceil(sz * 0.8 - 1e-9).toInt + 1
      sh.sortBy(h => (hotSet.contains(h), h)).take(math.max(px, 0)).toArray
    }
    val withPrefix = sets.withColumn("ph", prefixOf(col("sh")))
    val prefix = withPrefix.select(col("id"), explode(col("ph")).as("h"))
    val nPrefix = time("prefix explode count") { prefix.count() }
    println(s"[probe] prefix entries: $nPrefix")
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val nCands = time("candidate join count") { cands.count() }
    println(s"[probe] candidates: $nCands")
    time("full query noop") {
      SparkEntry.queries("q_jaccard_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val df2 = SparkEntry.queries("q_jaccard_pairs")(spark, sfDir)
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
    println(s"[probe] ReusedExchange nodes: ${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"[probe] Exchange nodes: ${"Exchange".r.findAllIn(plan).size}")
    println(s"[probe] BroadcastHashJoin: ${"BroadcastHashJoin".r.findAllIn(plan).size}, SortMergeJoin: ${"SortMergeJoin".r.findAllIn(plan).size}, ShuffledHashJoin: ${"ShuffledHashJoin".r.findAllIn(plan).size}")
    println(s"[probe] BatchScan/FileScan count: ${"Scan parquet".r.findAllIn(plan).size}")
    spark.stop()
  }
}
