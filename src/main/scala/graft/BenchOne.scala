package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      Queries.allQueries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => run(n, "/root/testdata/sf0.001") } // warm
    names.foreach { n =>
      val times = (1 to 2).map(_ => run(n, sfDir))
      println(f"TIME $n ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
