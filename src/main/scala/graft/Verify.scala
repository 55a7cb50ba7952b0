package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run each query and write its result under `outDir/<name>`; returns the
    * per-query error messages (insertion-ordered). A query that throws must
    * leave a visible record, not just vanish from the output dir — a silent
    * drop once masked 47 broken queries as "all pass" because the driver
    * only compares results that exist — AND it must remove any stale result
    * a PRIOR successful run left in a reused output dir, so a failure never
    * presents old output as current for the oracle compare. Exposed
    * separately from [[main]] so VerifySpec can drive it with a synthetic
    * registry. */
  def dumpQueries(spark: SparkSession, sfDir: String, outDir: String,
                  queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
      : scala.collection.mutable.LinkedHashMap[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(s"$outDir/$name"))
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg.linesIterator.take(3).mkString(" | ").take(500)
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    errors
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same warm-engine table cache Bench times — the correctness gate must
    // exercise the exact path the benchmark measures.
    Tables.hotCache = true
    val errors = dumpQueries(spark, sfDir, outDir, SparkEntry.queries.toSeq)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // rc stays 0 so the driver still oracle-compares the queries that DID
    // succeed; errors.json + stderr make the failures impossible to miss.
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size}/${SparkEntry.queries.size} queries FAILED")
    spark.stop()
  }
}
