package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev utility: run named corpus queries (noop sink, bench shape) with a
  * stage listener and print per-stage wall, task time, GC, shuffle and
  * spill — the "which stage is slow" step of the optimization loop
  * (guide §7.1) without the UI.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.StageProbe q_fuzzwin_02 [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <query>... [reps=2]")
    val reps = args.last.toIntOption.getOrElse(2)
    val names = if (args.last.toIntOption.isDefined) args.dropRight(1) else args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      appName = "graft-stage-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, submitted: Long, var completed: Long = 0L,
                  var taskTimeMs: Long = 0L, var gcMs: Long = 0L,
                  var shufReadMB: Double = 0, var shufWriteMB: Double = 0,
                  var spillMB: Double = 0, var tasks: Int = 0,
                  var inputMB: Double = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(s.stageInfo.stageId) =
            St(s.stageInfo.name.takeWhile(_ != '\n').take(80),
              System.nanoTime())
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(s.stageInfo.stageId).foreach { st =>
            st.completed = System.nanoTime()
            val m = s.stageInfo.taskMetrics
            st.taskTimeMs = m.executorRunTime
            st.gcMs = m.jvmGCTime
            st.shufReadMB = m.shuffleReadMetrics.totalBytesRead / 1e6
            st.shufWriteMB = m.shuffleWriteMetrics.bytesWritten / 1e6
            st.spillMB = m.diskBytesSpilled / 1e6
            st.tasks = s.stageInfo.numTasks
            st.inputMB = m.inputMetrics.bytesRead / 1e6
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // JIT/codegen warm-up identical in spirit to Bench's
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    names.foreach { name =>
      for (r <- 1 to reps) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        println(f"\n===== $name rep $r wall=$wall%.2fs =====")
        println(f"${"stage"}%-6s ${"wall_ms"}%8s ${"taskms"}%8s ${"gc"}%6s " +
          f"${"tasks"}%5s ${"in_MB"}%7s ${"sR_MB"}%7s ${"sW_MB"}%7s ${"spill"}%6s  name")
        stages.synchronized {
          val total = stages.values.map(s =>
            if (s.completed > 0) (s.completed - s.submitted) / 1e6 else 0.0).sum
          stages.foreach { case (id, s) =>
            val w = if (s.completed > 0) (s.completed - s.submitted) / 1e6 else -1.0
            println(f"$id%-6d $w%8.0f ${s.taskTimeMs}%8d ${s.gcMs}%6d " +
              f"${s.tasks}%5d ${s.inputMB}%7.1f ${s.shufReadMB}%7.1f " +
              f"${s.shufWriteMB}%7.1f ${s.spillMB}%6.1f  ${s.name}")
          }
          println(f"stage-wall sum: $total%.0f ms (gaps to query wall = " +
            "driver/planning/broadcast time)")
        }
      }
    }
    spark.stop()
  }
}
