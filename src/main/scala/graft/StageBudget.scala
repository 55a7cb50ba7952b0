package graft

/** Per-query stage/job budget for the registry bench (round 12).
  *
  * At sf0.1 on local[32] most registry queries are dominated not by data
  * work but by the local scheduler's per-stage floor (~0.2 s in the forked
  * sbt harness) — a 5-window chain plan is 5+ stages of microseconds of
  * actual compute. That makes the BENCH total grow with REGISTRY SIZE and
  * plan stage-count, not with engine speed, and a real kernel regression
  * can hide inside stage-count noise. This main pins the decomposition:
  * it runs every bench query warm (same hot-table cache as Bench), counts
  * the jobs and stages each one schedules (job groups + the public
  * statusTracker — submitted stageIds, so AQE-skipped stages count as
  * scheduled, which is what the floor prices), and writes `STAGES.json`
  * with per-query `{stages, jobs, sec}` plus the fitted per-stage floor
  * (total_sec / total_stages). SCALING.md documents the protocol: compare
  * a query's sec/stage ratio across rounds — a plan-shape change moves
  * `stages`, an engine regression moves the ratio.
  *
  * Usage: `sbt "runMain graft.StageBudget" [sfDir]` (default sf0.1). */
object StageBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true

    def run(name: String): Unit =
      Queries.allQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    val names = Queries.benchNames
    // warm pass: codegen + the hot-table cache fill are not part of the
    // steady-state budget the bench's min-of-2 measures
    names.foreach(n => try run(n) catch { case _: Throwable => () })

    val tracker = spark.sparkContext.statusTracker
    val rows = names.zipWithIndex.flatMap { case (n, i) =>
      val group = s"sb_$i" // fresh group per query → its jobs only
      spark.sparkContext.setJobGroup(group, n)
      val t0 = System.nanoTime()
      val ok = try { run(n); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      Thread.sleep(150) // status store is listener-fed (async): let it drain
      val jobIds = tracker.getJobIdsForGroup(group)
      val stageCount = jobIds.flatMap(id =>
        tracker.getJobInfo(id).map(_.stageIds.length.toLong)).sum
      if (ok) Some((n, stageCount, jobIds.length.toLong, dt)) else None
    }
    val totalSec = rows.map(_._4).sum
    val totalStages = rows.map(_._2).sum
    if (rows.isEmpty || totalStages == 0L) {
      // every query failed (or scheduled nothing): a 0/0 floor would write
      // NaN/Infinity — invalid JSON — into STAGES.json; fail loudly instead
      System.err.println(
        s"STAGES.json NOT written: ${rows.size} queries succeeded, " +
          s"$totalStages stages — nothing to budget")
      spark.stop()
      sys.exit(1)
    }
    val floor = totalSec / totalStages
    def sec(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = rows.map { case (n, s, j, t) =>
      s""""$n":{"stages":$s,"jobs":$j,"sec":${sec(t)}}"""
    }.mkString("{", ",", "}")
    val out =
      s"""{"metric":"stage_budget","nqueries":${rows.size},"total_sec":${sec(totalSec)},"total_stages":$totalStages,"sec_per_stage":${sec(floor)},"sf":"$sfDir","queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("STAGES.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"STAGES.json written: ${rows.size} queries, " +
      s"$totalStages stages, ${sec(totalSec)} s total, " +
      s"${sec(floor)} s/stage fitted floor")
    spark.stop()
  }
}
