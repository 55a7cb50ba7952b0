package graft

import org.apache.spark.sql.functions._

/** Measurement-only (VERDICT r17 item 4): does the 2 MiB Tungsten page
  * default regress a GENUINELY LARGE per-task sort? Generates `rows`
  * synthetic postings (60-bit hash keys, the q_dup_span_coverage shape) at
  * runtime — nothing persisted — shuffles them into `parts` partitions and
  * sorts within partitions, so each task's sort state is rows/parts
  * records. Run with SPARK_GRAFT_PAGE_SIZE=2m vs 16m/64m and compare.
  * Usage: runMain graft.SortPageProbe [rows] [parts] [reps]
  */
object SortPageProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 200000000L
    val parts = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pageSize = spark.conf.getOption("spark.buffer.pageSize").getOrElse("unset")
    // spill/time via the stage listener
    val metrics = new java.util.concurrent.atomic.AtomicReference[(Long, Long, Long)]((0L, 0L, 0L))
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        metrics.updateAndGet { case (s, d, g) =>
          (s + m.memoryBytesSpilled, d + m.diskBytesSpilled, g + m.jvmGCTime) }: Unit
      }
    })
    for (r <- 1 to reps) {
      metrics.set((0L, 0L, 0L))
      val t0 = System.nanoTime()
      // xxhash64 gives incompressible 64-bit keys; the payload mimics the
      // posting row (doc_id long, pos int)
      spark.range(0, rows, 1, cpus.toInt * 2)
        .select(xxhash64(col("id")).bitwiseAND(lit(0x0FFFFFFFFFFFFFFFL)).as("h"),
          (col("id") % 1000000L).as("doc_id"),
          (col("id") % 4096).cast("int").as("pos"))
        .repartition(parts, col("h"))
        .sortWithinPartitions(col("h"))
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val (sp, dk, gc) = metrics.get()
      println(f"SORTPAGE page=$pageSize rows=$rows parts=$parts rep=$r wall=$dt%.2fs memSpill=${sp / 1e9}%.2fGB diskSpill=${dk / 1e9}%.2fGB gc=${gc}ms")
      System.gc()
    }
    spark.stop()
  }
}
