package graft

import java.nio.file.{Files, Paths}

/** Dev utility: write `.explain("formatted")` of named corpus queries to
  * files — the optimization-round evidence trail (plans/r16/<q>_before.txt
  * / _after.txt).
  *
  *   sbt "runMain graft.PlanDump plans/r16 _before q_bm25_search q_hits"
  *
  * Data dir comes from SPARK_GRAFT_SF_DIR (default sf0.1 — plans are
  * dumped at the bench scale so join-strategy/AQE thresholds match what
  * the bench actually runs). Explain only; nothing executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-plan-dump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
      println(s"[plandump] $name -> $outDir/$name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
