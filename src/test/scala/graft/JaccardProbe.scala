package graft

/** Scratch profiler for a single query's wall time in a warm session
  * (test scope, not shipped). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.JaccardProbe q_name"
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_jaccard_pairs")
    val spark = GraftSession.builder(master = "local[32]",
      appName = "graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the scans so the probe isolates the query cost
    Seq("documents", "embeddings").foreach(t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"[probe] Exchanges: ${"Exchange".r.findAllIn(plan).size}, " +
      s"Reused: ${"ReusedExchange".r.findAllIn(plan).size}, " +
      s"Scans: ${"Scan parquet".r.findAllIn(plan).size}")
    spark.stop()
  }
}
