package graft

/** Single-query timing harness for iterating on one operator's plan:
  * `runMain graft.QBench <query>[,<query>…] [sfDir] [reps]` — same session
  * config and noop-sink materialization as [[Bench]], per-rep wall seconds
  * on stdout. */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true // mirror Bench's warm-engine mode
    for (name <- names) {
      // codegen/JIT warmup at the smallest SF, as in Bench
      Queries.allQueries(name)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Queries.allQueries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $name min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
