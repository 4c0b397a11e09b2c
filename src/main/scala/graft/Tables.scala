package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query goes through these so that at cluster scale the scan
  * config (pushdown, partition discovery) is set in exactly one place.
  */
object Tables {
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts arrives as parquet INT64 timestamps whose precision has
    * varied across driver testdata generations: TIMESTAMP(NANOS)
    * (which Spark 4 refuses to read as TimestampType) and
    * TIMESTAMP(MICROS). Read the raw INT64 via an explicit schema
    * (works under any session config, both annotations) and normalize
    * to µs by magnitude: epochs ≥ 1e17 can only be nanoseconds (1e17
    * µs is year 5138; 1e17 ns is 1973), so divide those by 1000 —
    * integer division, never double (ns epochs exceed 2^53). */
  val TsToMicrosSql: String =
    "(CASE WHEN abs(ts) >= 100000000000000000 THEN ts div 1000 ELSE ts END)"

  def events(s: SparkSession, d: String): DataFrame = {
    val schema = new StructType()
      .add("event_id", LongType).add("ts", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", DoubleType)
      .add("props", StringType)
    s.read.schema(schema).parquet(s"$d/events.parquet")
      .withColumn("ts", expr(s"timestamp_micros($TsToMicrosSql)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Staged JSON payload fixtures (reference API shapes, FIXTURES.md §A). */
  val FixturesDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")
}
