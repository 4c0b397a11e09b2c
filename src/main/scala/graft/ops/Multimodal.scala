package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Util._

/** Opaque binary payload + doc id (the multimodal row shape). */
case class DocBin(doc_id: Long, bytes: Array[Byte])

/** Extracted metadata for one binary asset. The width/height/frame
  * fields come from [[Multimodal.decodeStub]] — a deterministic stand-in
  * for a real image/av decode (libs absent in this environment); the
  * Spark-side plumbing (schema, encoders, partition-batch iteration) is
  * the real production shape. */
case class MmMeta(doc_id: Long, n_bytes: Int, sha256: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column operators (builder brief): treat image/audio/video
  * as opaque binary columns; decode/feature-extract runs per partition
  * over typed Datasets — the Scala analogue of `mapInPandas` batch UDFs.
  * At 100 TB the binary column stays off the shuffle path: metadata is
  * extracted in the scan stage and only the small typed columns move.
  */
object Multimodal {

  /** STUB decode: a real implementation would hand `d.bytes` to an
    * image/audio codec here (per-partition, reusing a decoder instance).
    * This deterministic fake keeps the pipeline testable end-to-end. */
  def decodeStub(d: DocBin): MmMeta = {
    val n = d.bytes.length
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(d.bytes).map("%02x".format(_)).mkString
    MmMeta(d.doc_id, n, sha, n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)
  }

  /** Binary ingest → per-partition decode → typed metadata columns. */
  def mmMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
      .as[DocBin]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }
  val mmMetadataSql: String =
    """SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
       sha256(text) AS sha256,
       CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS width,
       CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS INT) AS height,
       CAST(octet_length(CAST(text AS BLOB)) % 30 + 1 AS INT) AS n_frames
       FROM documents ORDER BY doc_id"""

  /** Frame sampling: ~4 evenly spaced frame indices per asset — the
    * explode row-shape a video pipeline feeds to per-frame models. */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
      .as[DocBin]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(expr(
          "sequence(0, n_frames - 1, greatest(1, CAST(floor(n_frames / 4) AS INT)))"))
          .as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  val mmFrameSampleSql: String =
    """SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, greatest(1, n_frames // 4))) AS INT) AS frame_idx
       FROM (SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) % 30 + 1 AS INT) AS n_frames
             FROM documents)
       ORDER BY doc_id, frame_idx"""

  val queries: Map[String, QFn] = Map(
    "mm_metadata" -> mmMetadata,
    "mm_frame_sample" -> mmFrameSample)

  val oracles: Map[String, String] = Map(
    "mm_metadata" -> mmMetadataSql,
    "mm_frame_sample" -> mmFrameSampleSql)
}
