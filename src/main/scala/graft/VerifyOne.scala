package graft

/** Local single-query correctness dump for iterating on one operator:
  * `runMain graft.VerifyOne <query>[,<query>…] [sfDir] [outDir]` — writes
  * each result to `outDir/<name>` parquet and its oracle SQL (if any) to
  * `outDir/<name>.sql`, for an ad-hoc DuckDB compare without running the
  * whole [[Verify]] registry. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_one"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      Queries.allQueries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      Queries.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
      println(s"VERIFYONE wrote $outDir/$name")
    }
    spark.stop()
  }
}
