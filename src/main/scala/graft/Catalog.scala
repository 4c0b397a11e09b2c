package graft

import org.apache.spark.sql.SparkSession

/** SQL API surface: temp views over the engine tables plus the custom
  * function, so users can drive everything through `spark.sql(...)`
  * (the third entry point alongside the DataFrame ops and the typed
  * Dataset stages). */
object Catalog {

  /** Register `graft_<table>` temp views for one scale dir. The events
    * table must go through its nanos-safe reader. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.Names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.table(spark, sfDir, t)
      df.createOrReplaceTempView(s"graft_$t")
    }

  /** Register dot_f32 + the geomean_e2 UDAF for SQL call sites.
    * Idempotent, and registers at most once per session: the
    * re-replacement was harmless but spammed a
    * `SimpleFunctionRegistry: The function dot_f32 replaced...`
    * warning into every bench query's tail. The probe goes through
    * the registry itself (not a session-keyed set) so a fresh
    * session — or one whose registry was reset — still registers. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val already = reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f32"))
    if (!already) {
      reg.createOrReplaceTempFunction(
        "dot_f32",
        exprs => graft.functions.DotF32(exprs.head, exprs(1)),
        "scala_udf")
      spark.udf.register("geomean_e2",
        org.apache.spark.sql.functions.udaf(graft.functions.GeoMeanE2))
    }
  }
}
