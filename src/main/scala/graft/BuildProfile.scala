package graft

/** Measurement-only (guide §1): sample the driver thread while a query's
  * DataFrame is CONSTRUCTED in a loop, to locate where plan-build time goes
  * (analysis rules, schema resolution, window extraction, …). No execution.
  * Usage: runMain graft.BuildProfile <query> [sfDir] [reps] [topN]
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 40
    val topN = if (args.length > 3) args(3).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    // warm: one full build+exec so lazily-initialized state doesn't skew
    Queries.allQueries(name)(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()

    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        if (st.nonEmpty) {
          // leaf-ish attribution: topmost org.apache.spark frame
          st.find(f => f.getClassName.startsWith("org.apache.spark") ||
              f.getClassName.startsWith("graft")).foreach { f =>
            val key = s"${f.getClassName}.${f.getMethodName}"
            counts.merge(key, 1, (a, b) => a + b)
          }
          // also a coarse "which phase" bucket: any frame matching markers
          val marks = Seq("Analyzer", "RuleExecutor", "withColumn",
            "ExtractWindowExpressions", "schema", "CheckAnalysis",
            "DeduplicateRelations", "transformDownWithPruning", "TreeNode",
            "Optimizer", "QueryPlan", "ofRows", "compileExpr")
          st.foreach { f =>
            val k = s"${f.getClassName}.${f.getMethodName}"
            if (marks.exists(k.contains)) frames.merge(k, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(2)
      }
    }, "build-sampler")
    sampler.setDaemon(true)

    var t0 = System.nanoTime()
    for (_ <- 1 to 3) Queries.allQueries(name)(spark, sfDir) // JIT the build
    sampler.start()
    t0 = System.nanoTime()
    for (_ <- 1 to reps) Queries.allQueries(name)(spark, sfDir)
    val dt = (System.nanoTime() - t0) / 1e6
    sampling = false
    sampler.join(1000)
    println(f"BUILDPROF $name reps=$reps total=${dt}%.0fms per-build=${dt / reps}%.1fms")
    import scala.jdk.CollectionConverters._
    println("-- top spark frames (leaf attribution) --")
    counts.asScala.toSeq.sortBy(-_._2).take(topN).foreach { case (k, n) =>
      println(f"  $n%5d  $k")
    }
    println("-- marker frames (anywhere in stack) --")
    frames.asScala.toSeq.sortBy(-_._2).take(topN).foreach { case (k, n) =>
      println(f"  $n%5d  $k")
    }
    spark.stop()
  }
}
