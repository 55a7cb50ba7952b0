package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Per-job audit of one registry query: runs it warm, then re-runs under a
  * listener that logs every job's call site and stage count — the tool for
  * hunting driver-job fat on store-backed paths (round-15 directive #2:
  * the ANN indexed queries ran 23-27 jobs each; at the measured ~0.2 s/job
  * local floor that IS the query's wall time, and on a real cluster each
  * job is a driver round-trip).
  *
  * Usage: `sbt "runMain graft.JobAudit <query>[,<query>…] [sfDir]"` */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true

    def run(name: String): Unit =
      Queries.allQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    for (name <- names) {
      try run(name) catch { case e: Throwable => println(s"warm fail: $e") }
      val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val names = js.stageInfos.map(_.name.takeWhile(_ != '\n').take(70))
            .mkString(" | ")
          val site = js.stageInfos.lastOption
            .map(_.details.linesIterator
              .filter(l => l.contains("graft.") && !l.contains("JobAudit"))
              .take(2).mkString(" <- ").take(160))
            .getOrElse("")
          jobs.add(s"stages=${js.stageIds.size} [$names] at [$site]")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try run(name) catch { case e: Throwable => println(s"run fail: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name: ${jobs.size} jobs, $dt%.2f s")
      jobs.forEach(j => println(s"  $j"))
    }
    spark.stop()
  }
}
