package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-JVM INGESTED twin of the driver's events testdata: the registry's
  * catalog-backed queries run against a real catalog store — murmur3
  * id-bucketed, (id, stamp)-sorted, manifest-committed parquet built by
  * the full insert pipeline — instead of the raw driver parquet, so the
  * round-16 zero-exchange/zero-sort read path is exercised (and timed) by
  * the driver's own correctness and bench loops, not only by specs.
  *
  * Built once per (process, dataset) like [[Queries.annIndexTmp]]: the
  * warehouse lives in a fresh per-JVM temp dir, so a prior round's store
  * can never leak into a new dataset's results. One insert batch = one
  * committed generation = one live file per bucket, the shape whose scan
  * claims both the id hash partitioning and the (id, stamp) order.
  *
  * Row parity with the source is exact for this data: the upsert key
  * (id, stamp, z-rank, row-hash) collapses only identical rows and every
  * source row carries a distinct event_id; eventMax is set above any
  * person's history and the TTL horizon (5y before [[Queries.OslNow]])
  * predates the data — so the same oracle SQL serves the raw and the
  * ingested reads.
  */
object CatalogStore {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_catstore").toString

  // keyed by (session, dir): a Catalog embeds its session, and plans built
  // on a stopped session must never serve a new one (ClusterSmoke runs two
  // sessions in one JVM). The WAREHOUSE path depends on dir alone, so the
  // second session reuses the on-disk store the first one built.
  private val catalogs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Catalog]

  private val Table = "events_store"

  private def catalogFor(spark: SparkSession, dir: String): Catalog =
    catalogs.computeIfAbsent((spark, dir), _ => {
      val wh = s"$root/${Integer.toHexString(dir.hashCode)}"
      new java.io.File(wh).mkdirs()
      new Catalog(spark, wh)
    })

  /** The ingested events table for `dir`, building it on first use. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val cat = catalogFor(spark, dir)
    this.synchronized {
      if (!cat.exists(Table)) {
        cat.create(TableMeta(Table,
          Seq(
            PropDef("value", "double"),
            PropDef("props", "text"),
            PropDef("event_id", "int")),
          TableSettings(idTextual = false, eventMax = 10000000)))
        cat.insert(Table, Tables.events(spark, dir), nowMs = Queries.OslNow)
      }
    }
    cat.events(Table)
  }

  /** Pruned single-customer fetch from the ingested store (the reference's
    * `GET /customer` answered from the person's partition). */
  def customerEvents(spark: SparkSession, dir: String, id: Long): DataFrame = {
    events(spark, dir) // ensure built
    catalogFor(spark, dir).customerEvents(Table, id)
  }
}
