package graft.ops

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Cron-expression schedule semantics (SURVEY.md §2.4 D4).
  *
  * The reference's schedules are 5-field cron strings — `"0 * * * *"`
  * (dags/DNS_Requests.py:23), `"0 *\/6 * * *"` (dags/Speedtest.py:23),
  * `"*\/5 * * * *"` (dags/Cloudflare_Apps.py:54) — plus the `"@daily"`
  * alias (dags/Airflow_Cleanup.py:29). [[Flow.runRecurring]]'s
  * fixed-rate ticks have the right drift behavior but cannot express
  * "at minute 0" or day-of-week restrictions; this parser computes real
  * next-fire times for [[Flow.runRecurringCron]]'s tick loop.
  *
  * Semantics are classic Vixie cron in UTC (the engine's pinned zone):
  * each field is `*`, a value, a range `a-b`, a step `*\/n` or `a-b/n`,
  * or a comma list; when BOTH day-of-month and day-of-week are
  * restricted the day matches if EITHER does, otherwise the restricted
  * one decides. Day-of-week accepts 0–7 with both 0 and 7 = Sunday.
  */
final case class Cron(
    minutes: Set[Int], hours: Set[Int], daysOfMonth: Set[Int],
    months: Set[Int], daysOfWeek: Set[Int],
    domRestricted: Boolean, dowRestricted: Boolean) {

  private def dayMatches(t: ZonedDateTime): Boolean = {
    val domOk = daysOfMonth(t.getDayOfMonth)
    // java.time: MONDAY=1..SUNDAY=7; cron: SUNDAY=0. Normalized to 0-6.
    val dowOk = daysOfWeek(t.getDayOfWeek.getValue % 7)
    // Vixie: when EITHER field carries the star flag (field begins
    // with '*'), the day must satisfy BOTH sets — "0 0 */2 * 1" is
    // odd-dom Mondays. Only when both are genuinely restricted does
    // the either-match OR apply. A true "*" set contains every value,
    // so the AND is vacuous for it.
    if (!domRestricted || !dowRestricted) domOk && dowOk
    else domOk || dowOk
  }

  def matches(instant: Instant): Boolean = {
    val t = instant.atZone(ZoneOffset.UTC)
    minutes(t.getMinute) && hours(t.getHour) &&
      months(t.getMonthValue) && dayMatches(t)
  }

  /** First fire time strictly after `after`. Walks minute-aligned time
    * with field-sized skips (month/day/hour granularity), so even a
    * yearly schedule resolves in a few hundred steps; bails after nine
    * years — the longest real gap for a 5-field expression is Feb 29
    * across a skipped CENTURY leap year (2096 → 2104 is 8 years). */
  def nextFire(after: Instant): Instant = {
    var t = after.atZone(ZoneOffset.UTC)
      .truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = t.plusYears(9)
    while (t.isBefore(limit)) {
      if (!months(t.getMonthValue))
        t = t.plusMonths(1).withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      else if (!dayMatches(t))
        t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS)
      else if (!hours(t.getHour))
        t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
      else if (!minutes(t.getMinute))
        t = t.plusMinutes(1)
      else
        return t.toInstant
    }
    throw new IllegalArgumentException(
      s"cron expression never fires within 9 years of $after")
  }

  /** Lazy stream of fire times strictly after `after`. */
  def fireTimes(after: Instant): LazyList[Instant] =
    LazyList.iterate(nextFire(after))(nextFire)

  /** Compile this cron to a SQL boolean predicate over timestamp
    * column `c` — the RELATIONAL form of [[matches]], so a schedule
    * can be applied to a whole tick spine in one codegen'd filter
    * instead of a per-row driver callback, and the DuckDB oracle can
    * evaluate the identical semantics. Field sets render as IN lists
    * (full-range fields collapse to `true`); the Vixie either-match
    * rule on dom/dow renders as OR exactly as [[dayMatches]] applies
    * it. `dialect` splits only on day-of-week numbering: Spark's
    * dayofweek() is 1-based (Sunday = 1), DuckDB's 0-based
    * (Sunday = 0); both normalize here to cron's 0 = Sunday. */
  def predicateSql(c: String, dialect: String): String = {
    def inSet(e: String, s: Set[Int], lo: Int, hi: Int): String =
      if ((lo to hi).forall(s)) "true"
      else s"$e IN (${s.toSeq.sorted.mkString(", ")})"
    val dowExpr =
      if (dialect == "spark") s"(dayofweek($c) - 1)" else s"dayofweek($c)"
    val m = inSet(s"minute($c)", minutes, 0, 59)
    val h = inSet(s"hour($c)", hours, 0, 23)
    val mon = inSet(s"month($c)", months, 1, 12)
    val dom = inSet(s"day($c)", daysOfMonth, 1, 31)
    val dow = inSet(dowExpr, daysOfWeek, 0, 6)
    val dayPred =
      if (!domRestricted || !dowRestricted) s"($dom AND $dow)"
      else s"($dom OR $dow)"
    s"($m AND $h AND $mon AND $dayPred)"
  }
}

object Cron {

  private val aliases = Map(
    "@hourly" -> "0 * * * *",
    "@daily" -> "0 0 * * *",
    "@midnight" -> "0 0 * * *",
    "@weekly" -> "0 0 * * 0",
    "@monthly" -> "0 0 1 * *",
    "@yearly" -> "0 0 1 1 *",
    "@annually" -> "0 0 1 1 *")

  def parse(expr: String): Cron = {
    val s = aliases.getOrElse(expr.trim, expr.trim)
    val fields = s.split("\\s+")
    if (fields.length != 5)
      throw new IllegalArgumentException(
        s"cron '$expr': expected 5 fields, got ${fields.length}")
    val Array(m, h, dom, mon, dow) = fields
    Cron(
      minutes = parseField(m, 0, 59, expr),
      hours = parseField(h, 0, 23, expr),
      daysOfMonth = parseField(dom, 1, 31, expr),
      months = parseField(mon, 1, 12, expr),
      // 0-7 with 7 folded onto Sunday=0
      daysOfWeek = parseField(dow, 0, 7, expr).map(_ % 7),
      // Vixie sets the DOM_STAR/DOW_STAR flag whenever the field BEGINS
      // with '*' — so "*/2" is a star field (AND day semantics), not a
      // restriction that triggers the either-match rule
      domRestricted = !dom.startsWith("*"),
      dowRestricted = !dow.startsWith("*"))
  }

  private def parseField(f: String, lo: Int, hi: Int,
      whole: String): Set[Int] =
    f.split(",").toSet.flatMap { part: String =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, st) =>
          val n = toInt(st, whole)
          if (n < 1) err(whole, s"step $n must be >= 1")
          (r, n)
        case _ => err(whole, s"bad step syntax '$part'")
      }
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") => r.split("-") match {
          case Array(a, b) => (toInt(a, whole), toInt(b, whole))
          case _ => err(whole, s"bad range '$r'")
        }
        // a bare value with a step ("3/5") means "a to max by step"
        case v if step > 1 => (toInt(v, whole), hi)
        case v => val n = toInt(v, whole); (n, n)
      }
      if (from < lo || to > hi || from > to)
        err(whole, s"'$part' out of range [$lo, $hi]")
      (from to to by step).toSet
    }

  private def toInt(s: String, whole: String): Int =
    try s.toInt catch {
      case _: NumberFormatException => err(whole, s"'$s' is not a number")
    }

  private def err(expr: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"cron '$expr': $msg")
}
