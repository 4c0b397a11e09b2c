package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Runtime half of [[TsToMicrosLazy]]: the unit-mode lookup executed on
  * the EXECUTOR, once per task, via [[graft.Tables.tsUnitModeAt]]'s
  * per-file-identity memoization — so each task re-lists the staged
  * directory and a file staged between micro-batches is normalized by
  * its own annotation, not by whatever existed when the stream was
  * declared. */
object TsUnitRuntime {
  def mode(path: String): Int = graft.Tables.tsUnitModeAt(path)

  /** Mode 1/2/3 = NANOS/MICROS/MILLIS; 0 = the magnitude fallback
    * (same three-tier routing as [[graft.Tables.TsToMicrosSql]], in
    * integer arithmetic — Long division truncates toward zero exactly
    * like SQL `div`). */
  def toMicrosWithMode(ts: Long, mode: Int): Long = mode match {
    case 1 => ts / 1000L
    case 2 => ts
    case 3 => ts * 1000L
    case _ =>
      if (math.abs(ts) >= 100000000000000000L) ts / 1000L
      else if (math.abs(ts) >= 100000000000000L) ts
      else ts * 1000L
  }

  def toMicros(ts: Long, path: String): Long =
    toMicrosWithMode(ts, mode(path))
}

/** µs-normalization of a raw INT64 event time whose unit is resolved at
  * TASK runtime from the staged file's parquet footer — the streaming
  * twin of [[graft.Tables.tsToMicrosSqlAt]], which resolves at
  * DataFrame-construction time and therefore bakes the magnitude
  * fallback into any stream declared before its files land (r8 item:
  * a late-staged MILLIS-annotated file was then misrouted for epochs
  * the magnitude tiers cannot distinguish). Codegen resolves the mode
  * once per generated-class instance (one footer read per task via the
  * memoized sniff), then normalizes inline per row. */
case class TsToMicrosLazy(child: Expression, path: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      TsUnitRuntime.toMicros(v.asInstanceOf[Long], path))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val modeVar = ctx.addMutableState("int", "graftTsUnitMode",
      v => s"$v = -1;")
    val esc = path.replace("\\", "\\\\").replace("\"", "\\\"")
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($modeVar < 0) {
        $modeVar = graft.functions.TsUnitRuntime.mode("$esc");
      }
      ${ev.value} = graft.functions.TsUnitRuntime.toMicrosWithMode($c, $modeVar);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TsToMicrosLazy = copy(child = newChild)
}

object TsExpr {
  /** `ts_to_micros_lazy(tsCol, stagedPath)` as a Column. */
  def tsToMicrosLazy(ts: Column, path: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TsToMicrosLazy(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(ts), path))
}
