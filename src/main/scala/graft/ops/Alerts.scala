package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Failure-callback alerting (reference: every DAG wires
  * `on_failure_callback=AppriseNotifier(body=f"The dag {dag.dag_id}
  * failed")` — dags/DNS_Requests.py:34-40).
  *
  * Spark-native shape: a [[QueryExecutionListener]] on the session. Any
  * failing DataFrame action fires [[FailureAlertListener.onFailure]],
  * which renders the templated body with per-run params and delivers it
  * through the injected transport (production: HTTP POST via
  * [[HttpSink]]'s `post`; tests: an in-process HTTP server). The
  * listener is the session-wide analogue of per-DAG callbacks — one
  * registration covers every query the session runs.
  */
object Alerts {

  /** `{{ key }}` template interpolation — the Jinja subset the
    * reference's alert bodies use ("The dag {{ dag.dag_id }} failed"),
    * plus per-run params (missing-param renders as `{{ key }}` verbatim
    * so a bad template is visible in the alert, never a silent blank). */
  def render(template: String, params: Map[String, String]): String =
    params.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace(s"{{ $k }}", v).replace(s"{{$k}}", v)
    }

  /** Airflow-style date macros for a run at `logicalDate` (UTC):
    * `{{ ds }}` = YYYY-MM-DD, `{{ ds_nodash }}`, `{{ ts }}` = ISO-8601
    * instant, `{{ prev_ds }}` / `{{ next_ds }}` (one schedule interval
    * back/forward when a cron is given, else one day). Merge these
    * under the caller's params so explicit bindings win. */
  def dateMacros(logicalDate: java.time.Instant,
      cronExpr: Option[String] = None): Map[String, String] = {
    val utc = java.time.ZoneOffset.UTC
    def ds(i: java.time.Instant): String =
      java.time.LocalDate.ofInstant(i, utc).toString
    val (prev, next) = cronExpr match {
      case Some(expr) =>
        val cron = Cron.parse(expr)
        // prev fire: step back in day-sized jumps until a fire lands
        // before logicalDate, then walk fires forward to the LAST one
        // before it (cron gaps are <= 8 years — Feb 29 across a
        // skipped century leap year; bounded by nextFire's 9-year guard)
        var back = logicalDate.minus(java.time.Duration.ofDays(1))
        while (cron.nextFire(back).compareTo(logicalDate) >= 0)
          back = back.minus(java.time.Duration.ofDays(1))
        var p = cron.nextFire(back)
        var n = cron.nextFire(p)
        while (n.isBefore(logicalDate)) { p = n; n = cron.nextFire(n) }
        (p, cron.nextFire(logicalDate))
      case None =>
        (logicalDate.minus(java.time.Duration.ofDays(1)),
          logicalDate.plus(java.time.Duration.ofDays(1)))
    }
    Map(
      "ds" -> ds(logicalDate),
      "ds_nodash" -> ds(logicalDate).replace("-", ""),
      "ts" -> logicalDate.toString,
      "prev_ds" -> ds(prev),
      "next_ds" -> ds(next))
  }

  /** Session listener delivering a rendered alert per failed query.
    * `name`/`error` params are bound per failure; `staticParams` are
    * the run-scoped bindings (dag id, env, run date).
    *
    * Delivery is retried `deliveryRetries` times with `retryDelayMs`
    * between attempts — the reference's notifier rides the task's
    * `retries: 2, retry_delay` policy (dags/DNS_Requests.py:13-17) —
    * and a body that exhausts its retries lands in [[deadLetters]]
    * instead of vanishing: the operator's redrive surface. Delivery
    * failures never mask the original query failure. */
  final class FailureAlertListener(
      template: String,
      staticParams: Map[String, String],
      post: String => Unit,
      deliveryRetries: Int = 2,
      retryDelayMs: Long = 0)
      extends QueryExecutionListener {

    /** Most recent rendered bodies (visible for tests / the driver
      * loop). Bounded: a long-lived session with a flaky downstream
      * must not accumulate every alert body ever rendered. */
    val delivered = new ConcurrentLinkedQueue[String]()
    /** Bodies whose delivery failed every attempt — the dead-letter
      * queue a redelivery job (or a test) drains. Same bound. */
    val deadLetters = new ConcurrentLinkedQueue[String]()
    private val maxRetained = 256
    private def bound(q: ConcurrentLinkedQueue[String]): Unit = {
      while (q.size > maxRetained) q.poll()
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = ()

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = {
      val body = render(template, staticParams ++ Map(
        "name" -> funcName,
        "error" -> String.valueOf(exception.getMessage).linesIterator
          .take(1).mkString))
      delivered.add(body); bound(delivered)
      try Flow.withRetry(deliveryRetries, retryDelayMs)(post(body))
      catch { case _: Throwable => deadLetters.add(body); bound(deadLetters) }
    }
  }

  /** Register a failure-alert listener on the session; returns it for
    * [[uninstall]]. Listener callbacks run on the listener bus, off the
    * failing action's thread — delivery is asynchronous, like the
    * reference's notifier. */
  def install(spark: SparkSession, template: String,
      staticParams: Map[String, String] = Map.empty,
      deliveryRetries: Int = 2, retryDelayMs: Long = 0)(
      post: String => Unit): FailureAlertListener = {
    val l = new FailureAlertListener(template, staticParams, post,
      deliveryRetries, retryDelayMs)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: FailureAlertListener): Unit =
    spark.listenerManager.unregister(l)
}
