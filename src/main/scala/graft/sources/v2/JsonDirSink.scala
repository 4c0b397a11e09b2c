package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector: JSON-lines output with the full
  * two-phase commit protocol (the write half of the DSv2 surface, next
  * to [[StagedHttpSource]]'s read half).
  *
  * Exactly-once shape: every task writes to a uniquely-named staging
  * file (`_staging/part-<partition>-<task>.jsonl` — task RETRIES get a
  * fresh taskId, so a zombie attempt can never collide), its commit
  * message carries the staged name, and only the DRIVER's
  * `BatchWrite.commit` promotes committed messages into place and
  * drops a `_SUCCESS` marker. Aborted attempts are deleted in
  * `DataWriter.abort` / `BatchWrite.abort`. This is the same protocol
  * a 1000-executor job needs against object storage: no output is
  * visible until the single driver-side commit.
  *
  * Field surface: STRING, BIGINT/INT, DOUBLE, BOOLEAN (the engine's
  * payload types; FIXTURES.md §A).
  *
  * Usage:
  *   df.write.format("graft.sources.v2.JsonDirSink")
  *     .option("path", "/out/dir").mode("append").save()
  */
class JsonDirSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema arrives from the df
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonDirTable(schema, properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

class JsonDirTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"json_dir($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonDirWriteBuilder(info.schema(), path, info.queryId())
}

/** SupportsTruncate backs `mode("overwrite")`: the truncate happens on
  * the driver at commit time, immediately before promotion — the write
  * itself never destroys committed data (staging is fully written and
  * task-committed first), and no torn individual file is ever visible.
  * The delete-then-move pair is NOT atomic as a unit: a reader listing
  * the directory mid-commit can see it briefly empty, and a driver
  * crash between the two loses the prior output while the replacement
  * sits in `_staging/` — the same guarantee Spark's own built-in
  * overwrite-to-directory provides. Readers needing stronger isolation
  * gate on `_SUCCESS`, which is written only after promotion. */
class JsonDirWriteBuilder(schema: StructType, path: String, queryId: String,
    truncate: Boolean = false) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new JsonDirWriteBuilder(schema, path, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new JsonDirBatchWrite(schema, path, queryId, truncate)
  }
}

case class JsonDirCommit(staged: String, finalName: String)
    extends WriterCommitMessage

class JsonDirBatchWrite(schema: StructType, path: String, queryId: String,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new JsonDirWriterFactory(schema, path, queryId)

  /** Driver-side commit: promote every committed task's staging file.
    * Nothing under `path/` (except `_staging/`) exists before this
    * runs — the all-or-nothing visibility point. Final names carry the
    * job's queryId, so successive appends coexist instead of a later
    * job silently replacing an earlier one's part files. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) {
      val dir = Paths.get(path).toFile
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile &&
          (f.getName.endsWith(".jsonl") || f.getName == "_SUCCESS"))
        .foreach(_.delete())
    }
    messages.foreach { case JsonDirCommit(staged, finalName) =>
      val src = Paths.get(staged)
      if (Files.exists(src))
        Files.move(src, Paths.get(path, finalName),
          StandardCopyOption.ATOMIC_MOVE)
    }
    Files.write(Paths.get(path, "_SUCCESS"), Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case JsonDirCommit(staged, _) =>
        Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

class JsonDirWriterFactory(schema: StructType, path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new JsonDirWriter(schema, path, partitionId, taskId, queryId)
}

class JsonDirWriter(schema: StructType, path: String, partitionId: Int,
    taskId: Long, queryId: String) extends DataWriter[InternalRow] {
  private val stagingDir = Paths.get(path, "_staging")
  Files.createDirectories(stagingDir)
  private val staged =
    stagingDir.resolve(f"part-$partitionId%05d-$taskId.jsonl")
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  override def write(row: InternalRow): Unit = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case BooleanType => row.getBoolean(i).toString
          case dt => throw new IllegalArgumentException(
            s"unsupported sink type $dt for field ${f.name}")
        }
      "\"" + esc(f.name) + "\":" + v
    }
    out.write(fields.mkString("{", ",", "}"))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    JsonDirCommit(staged.toString, f"part-$queryId-$partitionId%05d.jsonl")
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}
