package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Verify dump loop's failure contract: a query that throws must (a)
  * surface in the returned error map and (b) leave NO parquet under its
  * output slot — in particular it must delete a stale result that a prior
  * SUCCESSFUL run of the same query left in a reused output dir, so the
  * driver's oracle compare can never grade old output as current. */
class VerifySpec extends SparkSpec {

  private def ok(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v")
  }
  private def boom(s: SparkSession, dir: String): DataFrame =
    throw new RuntimeException("synthetic failure")

  test("failed query deletes the prior successful run's stale output") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    val slot = new java.io.File(s"$out/q_fake")

    val e1 = Verify.dumpQueries(spark, "/unused", out, Seq("q_fake" -> ok _))
    assert(e1.isEmpty)
    assert(slot.isDirectory, "successful run must write the parquet dir")
    assert(spark.read.parquet(slot.toString).count() == 2)

    // same name, same out dir — now the query fails
    val e2 = Verify.dumpQueries(spark, "/unused", out, Seq("q_fake" -> boom _))
    assert(e2.keySet == Set("q_fake"))
    assert(e2("q_fake").contains("synthetic failure"))
    assert(!slot.exists(),
      "failed query must not leave stale parquet for the oracle compare")
  }

  test("failure during write (post-plan) also clears the slot") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    // a frame whose evaluation throws at write time (task execution), not
    // at plan/analysis time — the write has already created the output dir
    def lazyBoom(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      Seq(1).toDF("d").selectExpr("assert_true(d > 1) AS v")
    }
    Verify.dumpQueries(spark, "/unused", out, Seq("q_fake" -> ok _))
    val e = Verify.dumpQueries(spark, "/unused", out, Seq("q_fake" -> lazyBoom _))
    assert(e.contains("q_fake"))
    assert(!new java.io.File(s"$out/q_fake").exists())
  }

  // The fp-accumulator oracles (q_osl_prop_accum forward, q_osl_reverse_accum
  // reverse) window ORDER BY stamp with no tiebreaker — as does the engine's
  // person sort, matching the reference's stamp-ordered scan. With duplicate
  // (id, stamp) rows DuckDB's tie order could differ from Spark's, so the
  // bit-exactness claim rests on the test data being (id, stamp)-unique at
  // millisecond granularity. Pin that assumption: if a future driver dataset
  // introduces ms-level ties, this fails loudly here instead of as a flaky
  // oracle hash mismatch.
  test("driver test data is (id, stamp)-unique — fp-accumulator tie assumption") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(s"$dir/events.parquet").exists())
      val e = Tables.events(spark, dir)
      val total = e.count()
      val distinct = e.select("id", "stamp").distinct().count()
      assert(total == distinct,
        s"$sf: ${total - distinct} duplicate (id, stamp) pairs — the " +
          "stamp-ordered fp-accumulator oracles need a tiebreaker now")
    }
  }
}
