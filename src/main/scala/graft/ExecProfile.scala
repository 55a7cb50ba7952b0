package graft

/** Measurement-only (guide §7.3 without a UI): sample EVERY task thread
  * while a query executes, recording thread state and the top frame plus
  * any lock owner — the local-mode analogue of executor thread dumps, for
  * queries whose stage shows blocked ≫ CPU. Usage:
  *   runMain graft.ExecProfile <query> [sfDir] [reps] [topN]
  */
object ExecProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val topN = if (args.length > 3) args(3).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    Queries.allQueries(name)(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()

    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    val sampler = new Thread(() => {
      while (sampling) {
        val infos = mx.dumpAllThreads(true, false)
        infos.foreach { ti =>
          if (ti != null && ti.getThreadName.startsWith("Executor task launch")) {
            val st = ti.getStackTrace
            if (st.nonEmpty) {
              // topmost interesting frame: skip pure waiting primitives
              val top = st.find(f =>
                !f.getClassName.startsWith("java.lang.Object") &&
                !f.getClassName.startsWith("jdk.internal.misc.Unsafe") &&
                !f.getClassName.startsWith("java.util.concurrent.locks"))
                .getOrElse(st.head)
              val lock = Option(ti.getLockName).map(l =>
                " LOCK=" + l.takeWhile(_ != '@')).getOrElse("")
              val key = s"${ti.getThreadState}$lock ${top.getClassName}.${top.getMethodName}"
              counts.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(5)
      }
    }, "exec-sampler")
    sampler.setDaemon(true)
    sampler.start()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      Queries.allQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"EXECPROF $name rep=$r wall=${(System.nanoTime() - t0) / 1e6}%.0fms")
      System.gc()
    }
    sampling = false
    sampler.join(1000)
    import scala.jdk.CollectionConverters._
    println("-- task-thread states (sampled every 5ms across reps) --")
    counts.asScala.toSeq.sortBy(-_._2).take(topN).foreach { case (k, n) =>
      println(f"  $n%5d  $k")
    }
    spark.stop()
  }
}
