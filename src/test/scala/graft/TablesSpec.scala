package graft

import org.apache.spark.sql.functions._

/** Reader-layer robustness: the events INT64 timestamp normalization
  * follows the file's parquet logical-type ANNOTATION, with the
  * magnitude heuristic only as the unannotated fallback. */
class TablesSpec extends SparkSuite {

  private val fx = Tables.FixturesDir

  test("ts unit comes from the parquet annotation, not magnitude") {
    assert(Tables.sniffTsMode(s"$fx/ts_nanos.parquet") == Some(1))
    assert(Tables.sniffTsMode(s"$fx/ts_millis.parquet") == Some(3))
    // the driver testdata is annotated too — whichever unit, never None
    assert(Tables.sniffTsMode(s"$sf/events.parquet").isDefined)
    // no ts field / no file → None → magnitude fallback
    assert(Tables.sniffTsMode(s"$fx/does_not_exist.parquet").isEmpty)
  }

  test("pre-1973 nanosecond epoch reads correctly via the annotation") {
    // 31536000e9 ns = 1971-01-01: its magnitude (3.15e16 < 1e17) makes
    // the heuristic read it as MICROSECONDS — year 2969, 1000x wrong.
    // The annotation path must divide by 1000 and land on 1971.
    val dir = java.nio.file.Files.createTempDirectory("graft_tsfix")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$fx/ts_nanos.parquet"),
      dir.resolve("events.parquet"))
    val got = Tables.events(spark, dir.toString)
      .select(year(col("ts"))).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1971, 1976), s"annotation must win: ${got.toSeq}")
  }

  test("unannotated INT64 ts falls back to the magnitude heuristic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsraw").toString
    // plain BIGINT ts (no timestamp annotation): ms-, µs- and ns-range
    // epochs of the same instant — the three-tier CASE must route each
    // correctly (the ms tier is the r7-advice case: a MILLIS file
    // staged after a stream was declared reads through this fallback)
    Seq((1L, 1706659200000000L), (2L, 1706659200000000000L),
      (3L, 1706659200000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Tables.sniffTsMode(s"$dir/events.parquet").isEmpty)
    val got = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("us", expr(Tables.tsToMicrosSql(dir)))
      .select(col("us")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1706659200000000L))
  }
}
