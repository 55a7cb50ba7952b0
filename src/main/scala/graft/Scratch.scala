package graft

import org.apache.spark.sql.functions._
import graft.functions.AggFns.{dsum, davg}

// Temporary experiment main — not committed.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $label min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val l = Tables.lineitem(spark, dir)
    time("count")(noop(l.select(col("l_quantity"))))
    time("sum_double") {
      noop(l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          avg(col("l_quantity")), count(lit(1))))
    }
    time("dsum_decimal") {
      noop(l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          davg(col("l_quantity")), count(lit(1))))
    }
    time("spread_dsum") {
      noop(Tables.spread(l).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          davg(col("l_quantity")), count(lit(1))))
    }
    spark.stop()
  }
}
