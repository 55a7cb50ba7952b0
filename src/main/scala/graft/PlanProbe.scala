package graft

/** Measurement-only harness (optimization guide §1): decompose a registry
  * query's wall time into DataFrame construction, analysis+optimization,
  * physical planning, and execution (noop sink), so optimization effort
  * lands on the phase that actually costs. Usage:
  *   runMain graft.PlanProbe <query>[,<query>…] [sfDir] [reps]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    // per-stage wall + task counts for the exec phase (guide §7.1 without a UI)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(40), i.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000, m.jvmGCTime))
      }
    })
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (name <- names) {
      // warm codegen/JIT at the smallest SF, as Bench does
      Queries.allQueries(name)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      for (r <- 1 to reps) {
        val tBuild0 = System.nanoTime()
        val df = Queries.allQueries(name)(spark, sfDir)
        val tBuild = ms(tBuild0)
        val tOpt0 = System.nanoTime()
        df.queryExecution.optimizedPlan // forces analysis + optimizer
        val tOpt = ms(tOpt0)
        val tPhys0 = System.nanoTime()
        df.queryExecution.executedPlan // physical planning + preparations
        val tPhys = ms(tPhys0)
        stages.clear()
        val tExec0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val tExec = ms(tExec0)
        println(f"PROBE $name rep=$r build=$tBuild%.0fms optimize=$tOpt%.0fms physical=$tPhys%.0fms exec=$tExec%.0fms total=${tBuild + tOpt + tPhys + tExec}%.0fms")
        if (r == reps) {
          Thread.sleep(300) // let the listener drain
          val sorted = stages.toArray(Array.empty[(Int, String, Int, Long, Long, Long, Long)]).sortBy(_._1)
          sorted.foreach { case (id, nm, nt, wall, run, cpu, gc) =>
            println(f"  STAGE $id%3d tasks=$nt%3d wall=${wall}%5dms run=${run}%5dms cpu=${cpu}%5dms gc=${gc}%4dms $nm")
          }
        }
        System.gc() // match Bench's reap between timed runs
      }
    }
    spark.stop()
  }
}
