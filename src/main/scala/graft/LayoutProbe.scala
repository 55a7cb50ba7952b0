package graft

import org.apache.spark.sql.functions._

/** Scratch A/B: cost of reading the normalized events cache under different
  * layouts (1-partition as-read vs id-partitioned/sorted) for a simple
  * rollup aggregation. Measurement-only. */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def norm() = {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.select(col("user_id").as("id"),
        unix_millis(col("ts").cast("timestamp")).as("stamp"),
        col("event_type").as("event"), col("value"), col("props"), col("event_id"))
    }
    def time[A](label: String)(f: => A): Unit = {
      for (r <- 1 to 4) {
        val t0 = System.nanoTime(); f
        println(f"LAYOUT $label rep=$r ${(System.nanoTime() - t0) / 1e6}%.0fms")
      }
    }
    def agg(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(col("id"), col("event"),
          dayofweek(to_date(timestamp_millis(col("stamp")))).as("dow"))
        .rollup("dow", "event")
        .agg(countDistinct("id").as("customers"), count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
    def win(df: org.apache.spark.sql.DataFrame): Unit = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("stamp")
      df.select(col("id"), col("stamp"), col("event"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .groupBy("event").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
    }

    println("n rows = " + norm().count())

    val plain = norm()
    plain.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    plain.write.mode("overwrite").format("noop").save()
    time("plain_agg")(agg(plain))
    time("plain_win")(win(plain))
    plain.unpersist(true)

    val grid = norm().repartition(cpus.toInt, col("id"))
      .sortWithinPartitions("id", "stamp")
    grid.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grid.write.mode("overwrite").format("noop").save()
    time("grid_agg")(agg(grid))
    time("grid_win")(win(grid))
    grid.unpersist(true)

    val grid8 = norm().repartition(8, col("id"))
      .sortWithinPartitions("id", "stamp")
    grid8.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grid8.write.mode("overwrite").format("noop").save()
    time("grid8_agg")(agg(grid8))
    time("grid8_win")(win(grid8))
    grid8.unpersist(true)

    val gridNoSort = norm().repartition(cpus.toInt, col("id"))
    gridNoSort.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gridNoSort.write.mode("overwrite").format("noop").save()
    time("gridnosort_agg")(agg(gridNoSort))
    time("gridnosort_win")(win(gridNoSort))
    gridNoSort.unpersist(true)

    spark.stop()
  }
}
