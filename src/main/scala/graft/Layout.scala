package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the events table at scale.
  *
  * The reference co-locates each customer's events in one compressed blob
  * inside a hash partition (`src/rpc_insert.cpp:154`: partition =
  * `(|hash(id)| % 13337) % partitionCount`). The Spark-native equivalent is
  * a BUCKETED table: `bucketBy(id)` + `sortBy(id, stamp)` means
  *
  *   - every per-person operation (`groupByKey(id)`, window over
  *     `partitionBy(id)`, person-level joins) reads pre-clustered data with
  *     NO shuffle — at 100 TB the shuffle this avoids is the dominant cost
  *     of the whole engine;
  *   - rows inside each bucket are already (id, stamp)-sorted, so the
  *     per-customer interpreter receives its rows in event order without a
  *     per-group sort.
  *
  * Bucketed tables require the session catalog (`saveAsTable`) — parquet
  * directories alone don't carry bucket metadata.
  */
object Layout {

  /** Write the normalized events as a bucketed, per-person-sorted table. */
  def writeBucketedEvents(events: DataFrame, table: String, buckets: Int = 32): Unit =
    events.write
      .mode("overwrite")
      .bucketBy(buckets, "id")
      .sortBy("id", "stamp")
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when a per-person aggregation over `df` keyed on `id` would
    * shuffle (used by specs/benchmarks to prove the bucketed layout removes
    * the Exchange). */
  def personAggShuffles(df: DataFrame): Boolean = {
    val plan = df.groupBy("id").agg(count(lit(1))).queryExecution.executedPlan
    plan.toString.contains("Exchange")
  }
}
