package graft

/** Dump plan evidence for the optimization rounds:
  * `runMain graft.PlanDump <query>[,<query>…] <outDir> [suffix] [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` containing the static
  * `explain("formatted")` AND (after one noop-sink execution) the final
  * adaptive plan — where AQE decisions (coalesced partition counts, join
  * strategy flips) become visible. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "after"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val df = Queries.allQueries(name)(spark, sfDir)
      val staticPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // drive THIS QueryExecution to completion so the adaptive plan
      // finalizes (a noop write would execute a separate QueryExecution);
      // every dumped registry query returns a small aggregate frame
      val nRows = df.collect().length
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"PLANDUMP $name rows=$nRows")
      // concrete post-AQE partition counts per shuffle read (the formatted
      // plan only prints "coalesced"): the parallelism evidence
      val reads = new StringBuilder
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            reads ++= s"AQEShuffleRead partitions=${r.partitionSpecs.length}\n"
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      val text = new StringBuilder
      text ++= s"== $name @ $sfDir (hot-table mode, the configuration Bench times)\n"
      text ++= "\n==== static plan (explain formatted, before execution)\n"
      text ++= staticPlan
      text ++= "\n==== final adaptive plan (after execution)\n"
      text ++= finalPlan
      text ++= "\n==== post-AQE shuffle-read parallelism\n"
      text ++= reads.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), text.toString)
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
