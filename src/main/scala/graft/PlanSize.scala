package graft

/** Measurement-only: logical-plan node and expression counts for a query,
  * plus per-withColumn analysis cost growth. Usage:
  *   runMain graft.PlanSize <query> [sfDir]
  */
object PlanSize {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.hotCache = true
    val df = Queries.allQueries(name)(spark, sfDir)
    val plan = df.queryExecution.logical
    var nodes = 0
    var exprs = 0
    plan.foreach { p =>
      nodes += 1
      p.expressions.foreach(e => e.foreach(_ => exprs += 1))
    }
    println(s"PLANSIZE $name logicalNodes=$nodes exprNodes=$exprs")
    // per-operator breakdown: expression weight of each node class
    val byClass = scala.collection.mutable.Map.empty[String, (Int, Int)]
    plan.foreach { p =>
      var e = 0
      p.expressions.foreach(x => x.foreach(_ => e += 1))
      val k = p.getClass.getSimpleName
      val (c0, e0) = byClass.getOrElse(k, (0, 0))
      byClass(k) = (c0 + 1, e0 + e)
    }
    byClass.toSeq.sortBy(-_._2._2).foreach { case (k, (c, e)) =>
      println(f"  $k%-30s nodes=$c%3d exprNodes=$e%7d")
    }
    spark.stop()
  }
}
