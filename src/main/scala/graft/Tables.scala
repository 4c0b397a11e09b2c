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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as TimestampType. Read it as raw INT64 nanos via an explicit
    * schema (works under any session config) and convert to µs
    * precision with integer division — `ts div 1000`, never a double
    * division (ns epochs exceed 2^53). */
  def events(s: SparkSession, d: String): DataFrame = {
    val schema = new StructType()
      .add("event_id", LongType).add("ts", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", DoubleType)
      .add("props", StringType)
    s.read.schema(schema).parquet(s"$d/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Staged JSON payload fixtures (reference API shapes, FIXTURES.md §A). */
  val FixturesDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")
}
