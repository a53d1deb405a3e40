package graft

/** Dev utility: print the executed plan (final AQE section) of named
  * corpus queries at sf0.001 — for checking what a plan ACTUALLY looks
  * like before pinning a PlanSpec assertion on it.
  *
  *   sbt "runMain graft.PlanProbe q_limit_offset q_invert_index"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-plan-probe")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      println(s"===== $name =====")
      println(if (cut >= 0) s.substring(0, cut) else s)
    }
    spark.stop()
  }
}
