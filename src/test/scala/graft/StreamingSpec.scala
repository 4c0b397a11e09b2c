package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {
  test("streaming windowed counts equal the batch tumbling aggregation") {
    // FileStreamSource wants a directory: stage the events file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventsStream.readEvents(spark, dir.toString)
    val got = EventsStream.runToMemory(spark,
      EventsStream.windowedCounts(stream), "win_counts")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"), col("k_sum"))
      .collect().toSet
    val want = Relational.tumblingWindowAgg(spark, sf).collect().toSet
    assert(got == want)
  }

  test("mapGroupsWithState sessionizer matches batch sessionize counts") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_timestamp(col("ts")).cast("long") * 1000000L +
          expr("CAST(date_format(ts, 'SSSSSS') AS LONG)"))
      .toDF("user_id", "tsMicros").as[EventsStream.Ev]
    // run the stateful sessionizer in a batch context equivalent:
    // group-sorted iterator semantics hold because all data arrives at once
    val sessions = EventsStream.sessionize(evs).collect()
    val batch = graft.ops.Flow.sessionize(spark, sf).collect()
    assert(sessions.length == batch.length,
      s"stream ${sessions.length} vs batch ${batch.length}")
  }

  test("streaming parquet sink tracks progress via checkpoint (exactly-once files)") {
    import org.apache.spark.sql.streaming.Trigger
    val in = java.nio.file.Files.createTempDirectory("graft_sink_in")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_sink_cp").toString
    def runOnce(): Unit = {
      val q = EventsStream.readEvents(spark, in.toString)
        .select(col("event_id"), col("ts"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    val n = Tables.events(spark, sf).count()
    java.nio.file.Files.copy(src, in.resolve("a.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == n)
    // second batch: only the NEW file is processed on restart
    java.nio.file.Files.copy(src, in.resolve("b.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == 2 * n)
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query and matching columns") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("dot_f32 is callable from spark.sql over registered views") {
    Catalog.registerFunctions(spark)
    Catalog.registerViews(spark, sf)
    val row = spark.sql(
      """SELECT vec_id, dot_f32(embedding, embedding) AS n2
         FROM graft_embeddings ORDER BY vec_id LIMIT 1""").collect()(0)
    assert(row.getDouble(1) > 0.0)
  }

  test("query registry has no cross-module name collisions") {
    import graft.ops._
    val perModule = Seq(Validate.queries, Relational.queries, Semi.queries,
      Text.queries, Dedup.queries, Vector.queries, Multimodal.queries,
      Sinks.queries, Flow.queries)
    assert(SparkEntry.queries.size == perModule.map(_.size).sum,
      "a module query name shadows another module's")
  }
}
