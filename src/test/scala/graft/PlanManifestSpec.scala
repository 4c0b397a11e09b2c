package graft

/** Registry-wide plan-regression gate (r15 verdict #4): recompute
  * every query's physical-plan fingerprint at sf0.001 and diff
  * against the committed `PLANS.json`. Any drift — a new Exchange, a
  * lost PushedFilter, a broadcast→SMJ flip, a custom operator falling
  * out of a plan, a query added without enrolling its fingerprint —
  * fails with a per-field diff.
  *
  * Intentional changes: regenerate with
  * `sbt "runMain graft.PlanDump"`, review `git diff PLANS.json`, and
  * commit the new manifest with the change that explains it. */
class PlanManifestSpec extends SparkSuite {

  test("toJson/parseJson round-trip values with braces, newlines, " +
      "quotes and control chars") {
    // r16 advice: the old regex parser stopped an object at the first
    // '}' and unescaped only \" and \\ — a pushed-filter value with a
    // brace or newline truncated the entry and read back as spurious
    // drift. The scanner must invert toJson's full escape set.
    val m = Seq(
      "q_brace" -> Map(
        "pushed" -> "In(flag, [a}b, {c])",
        "joins" -> "line1\nline2",
        "scans" -> "quote \" backslash \\ tab \t end"),
      "q_empty" -> Map.empty[String, String],
      "q_plain" -> Map("exchanges" -> "2"))
    val parsed = PlanManifest.parseJson(PlanManifest.toJson(m))
    assert(parsed == m.toMap,
      s"round-trip must be lossless: $parsed")
    intercept[Exception] {
      PlanManifest.parseJson("""{"a": {"k": "v" """)
    }
  }

  test("every registry query's plan fingerprint matches PLANS.json") {
    val path = java.nio.file.Paths.get("PLANS.json")
    assert(java.nio.file.Files.exists(path),
      "PLANS.json missing — run: sbt \"runMain graft.PlanDump\"")
    val committed = PlanManifest.parseJson(
      java.nio.file.Files.readString(path))
    // AQE off for stable, inspectable shapes (PlanDump uses the same)
    val current = graft.Util.withConf(spark,
        "spark.sql.adaptive.enabled", "false") {
      PlanManifest.manifest(spark, "/root/testdata/sf0.001").toMap
    }
    val allNames = (committed.keySet ++ current.keySet).toSeq.sorted
    val diffs = allNames.flatMap { name =>
      (committed.get(name), current.get(name)) match {
        case (None, Some(_)) =>
          Seq(s"$name: NEW query not in PLANS.json — regenerate")
        case (Some(_), None) =>
          Seq(s"$name: in PLANS.json but not in the registry — regenerate")
        case (Some(c), Some(n)) if c != n =>
          val fields = (c.keySet ++ n.keySet).toSeq.sorted.collect {
            case k if c.get(k) != n.get(k) =>
              s"    $k: '${c.getOrElse(k, "<absent>")}' -> " +
                s"'${n.getOrElse(k, "<absent>")}'"
          }
          Seq(s"$name:\n${fields.mkString("\n")}")
        case _ => Nil
      }
    }
    assert(diffs.isEmpty,
      s"\n${diffs.size} plan fingerprint(s) drifted from PLANS.json.\n" +
        "If intentional: sbt \"runMain graft.PlanDump\", review the " +
        "diff, commit it with the change.\n\n" + diffs.mkString("\n\n"))
  }
}
