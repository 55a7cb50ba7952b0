package graft

import org.apache.spark.sql.functions._

/** Scaling instrument (VERDICT r17 item 5): at sf0.1 the bench is
  * fixed-cost-dominated (8 cores beat 32), so wall time carries no
  * parallelism signal. This leg GENERATES a large event history at runtime
  * (spark.range — deterministic, nothing persisted, nothing read from
  * testdata) sized so the chain-ladder window stage is compute-bound, runs
  * the q_osl_chain3_both script through the real OSL engine, and prints
  * wall seconds. Run twice (SPARK_GRAFT_CPUS=32 vs 8) and compare the
  * ratio: a healthy ladder tracks core count.
  * Usage: runMain graft.ScaleProbe [persons] [eventsPerPerson] [reps]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val persons = if (args.length > 0) args(0).toLong else 2000000L
    val perP = if (args.length > 1) args(1).toInt else 40
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = persons * perP
    // deterministic synthetic history: person = id / perP, stamps strictly
    // increasing per person, event names cycling signup/view/purchase with
    // a hash-derived mix (so the chain has real matches at every level)
    val ev = spark.range(0, rows, 1, cpus.toInt * 4).select(
      concat(lit("p"), (col("id") / perP).cast("long").cast("string")).as("id"),
      (lit(1704067200000L) + (col("id") % perP) * 60000L).as("stamp"),
      when(pmod(xxhash64(col("id")), lit(7)) === 0, "signup")
        .when(pmod(xxhash64(col("id")), lit(7)) < 4, "view")
        .otherwise("purchase").as("event"),
      (pmod(xxhash64(col("id")), lit(100)).cast("double") / 10.0).as("value"),
      lit(null).cast("string").as("props"),
      col("id").as("event_id"))
    val script =
      """select
        |  count id as customers
        |  count event as n_rows
        |end
        |n = 0
        |each_row where event.is(== 'signup')
        |  n += 1
        |  each_row.continue().next().limit(2) where event.is(== 'view')
        |    each_row.continue().next().limit(2) where event.is(== 'purchase')
        |      << n, event
        |    end
        |  end
        |end
        |""".stripMargin
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.osl.OslEngine.query(ev, script, now = 1704067200000L + 86400000L)
        .write.mode("overwrite").format("noop").save()
      println(f"SCALEPROBE cpus=$cpus persons=$persons perPerson=$perP rep=$r wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.gc()
    }
    spark.stop()
  }
}
