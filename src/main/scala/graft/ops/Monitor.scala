package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** The reference's end-to-end monitoring pipeline shape
  * (dags/DNS_Requests.py as a whole): fetch staged payload → shape/
  * state validation → on violation, render templated alerts and
  * deliver them per partition, then surface the failure (the Airflow
  * `on_failure_callback` + task-failure pair).
  *
  * Delivery is injected (zero-egress testing; production passes an
  * HTTP POST through [[graft.ops.HttpSink]]'s transport shape).
  */
object Monitor {

  /** Runs the DNS protection-state check. Returns the number of
    * violations after delivering one alert per violation; in strict
    * mode additionally throws (task failure → retry → alert chain). */
  def dnsPipeline(spark: SparkSession, strict: Boolean)(
      post: String => Unit): Long = {
    val status = Sources.adguardStatusSrc(spark)
    val violations = status.filter(!col("running") ||
      (!col("protection_enabled") && col("protection_disabled_duration") === 0))
    val alerts = violations.select(
      format_string("The dag dns_%s failed", col("endpoint")).as("alert_body"))
    HttpSink.send(alerts, "alert_body")(post)
    val n = violations.count()
    if (strict && n > 0)
      throw new IllegalStateException(s"dns check failed for $n endpoints")
    n
  }
}
