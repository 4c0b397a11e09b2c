package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §3/§2.4 D4): the reference's
  * cron-scheduled pipelines map to repeated `Trigger.AvailableNow`
  * micro-batch runs over newly staged files — same DataFrame
  * transforms, plus watermarked event-time state.
  */
object EventsStream {

  /** Raw events schema (ts as INT64 nanos, as staged). */
  val rawSchema: StructType = new StructType()
    .add("event_id", LongType).add("ts", LongType).add("user_id", LongType)
    .add("event_type", StringType).add("value", DoubleType)
    .add("props", StringType)

  /** Streaming read of the staged events directory/file. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling-window aggregation (the streaming twin of
    * Relational.tumblingWindowAgg). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("k_sum"))

  /** Run a streaming DataFrame to completion over the currently staged
    * data (Trigger.AvailableNow → memory sink) and return the result.
    * `Complete` mode keeps final window totals comparable to batch. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // -- driver-contract entry: streaming run, batch-equivalent result ------

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** `stream_windowed_counts`: the full streaming path — readStream →
    * watermark → windowed agg → AvailableNow → memory sink — over the
    * staged events, returned as a batch DataFrame. With AvailableNow +
    * Complete mode the result equals the batch tumbling aggregation,
    * so it oracle-checks against plain SQL; at scale the same code
    * runs incrementally per micro-batch with watermarked state.  */
  def streamWindowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // The file-stream source wants a directory; scope it to the events
    // table with a glob (works for both a file and a directory layout).
    val src = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val counts = windowedCounts(src)
    val out = runToMemory(spark, counts,
      s"graft_stream_wc_${runSeq.incrementAndGet()}")
    out.select(graft.Util.fmtTs(col("window_start")).as("window_start"),
        col("event_type"), col("n"), col("k_sum"))
      .orderBy(col("window_start"), col("event_type"))
  }
  val streamWindowedCountsSql: String =
    """SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000 AS BIGINT)),
                       '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(1) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

  val queries: Map[String, graft.Util.QFn] = Map(
    "stream_windowed_counts" -> streamWindowedCounts)
  val oracles: Map[String, String] = Map(
    "stream_windowed_counts" -> streamWindowedCountsSql)

  // -- custom state: session windows via mapGroupsWithState --------------

  case class Ev(user_id: Long, tsMicros: Long)
  case class SessState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** 30-minute-gap sessionizer over a per-user event stream.
    * ProcessingTime timeout flushes open sessions when the
    * AvailableNow run drains; the batch twin is Flow.sessionize. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid: Long, evs: Iterator[Ev], state: GroupState[List[SessState]]) =>
          // Sort this batch's events; with AvailableNow the whole
          // group arrives in one batch, so sessions close in-line and
          // the final open session flushes at iterator end.
          val sorted = evs.map(_.tsMicros).toSeq.sorted
          var sessions = List.empty[Session]
          var cur = state.getOption.flatMap(_.headOption)
          sorted.foreach { t =>
            cur match {
              case Some(s) if t - s.last <= gapMicros =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                sessions ::= Session(uid, s.start, s.last, s.n)
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
          }
          cur.foreach(s => sessions ::= Session(uid, s.start, s.last, s.n))
          state.remove()
          sessions.reverseIterator
      }
  }
}
