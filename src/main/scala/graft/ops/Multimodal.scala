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

  /** Per-partition STUB decode: ONE decoder handle (here a
    * MessageDigest standing in for an image/audio codec context) is
    * created per partition and reused across its whole batch — the
    * production shape for native codec handles, which are expensive to
    * open and not thread-safe to share. The decode itself is a
    * deterministic fake (libs absent in this environment); everything
    * around it is real. */
  def decodePartition(it: Iterator[DocBin]): Iterator[MmMeta] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    it.map { d =>
      val n = d.bytes.length
      md.reset()
      val sha = md.digest(d.bytes).map("%02x".format(_)).mkString
      MmMeta(d.doc_id, n, sha, n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)
    }
  }

  /** Single-row decode (tests / driver-side probes). */
  def decodeStub(d: DocBin): MmMeta = decodePartition(Iterator(d)).next()

  /** Binary ingest → per-partition decode → typed metadata columns. */
  def mmMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
      .as[DocBin]
      .mapPartitions(decodePartition)
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
      .mapPartitions(decodePartition)
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

  /** Resize planning: fit each asset's (stub-decoded) dimensions into a
    * 224×224 box preserving aspect ratio — the pure-arithmetic half of
    * an image-resize stage (the pixel work would run in the same
    * per-partition decode pass as [[decodeStub]]). Scale math is
    * identical IEEE double ops in both engines, so the floored target
    * dims are oracle-exact. */
  def mmResizePlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
      .as[DocBin]
      .mapPartitions(decodePartition)
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        least(lit(224.0) / col("width"), lit(224.0) / col("height"))
          .as("scale"))
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), floor(col("width") * col("scale"))).as("out_w"),
        greatest(lit(1L), floor(col("height") * col("scale"))).as("out_h"))
      .orderBy(col("doc_id"))
  }
  val mmResizePlanSql: String =
    """SELECT doc_id, width, height,
       greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_w,
       greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_h
       FROM (SELECT doc_id, width, height,
               least(224.0 / width, 224.0 / height) AS scale
             FROM (SELECT doc_id,
                     CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS width,
                     CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS INT) AS height
                   FROM documents))
       ORDER BY doc_id"""

  /** Binary feature extraction: header/trailer slices and a content
    * digest straight off the opaque bytes column — the shape of magic-
    * number sniffing / container probing before a full decode. */
  def mmFeatureExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
      .select(col("doc_id"),
        length(col("bytes")).cast("int").as("n_bytes"),
        lower(hex(substring(col("bytes"), 1, 8))).as("head_hex"),
        lower(hex(expr("substring(bytes, greatest(1, length(bytes) - 3), 4)")))
          .as("tail_hex"),
        md5(col("bytes")).as("digest"))
      .orderBy(col("doc_id"))
  // DuckDB cannot slice BLOBs directly (no substring(BLOB, i, n)), so
  // the oracle slices the hex string: bytes [i, i+n) == hex chars
  // [2i−1, 2i−1+2n).
  val mmFeatureExtractSql: String =
    """SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
       lower(substring(hex(CAST(text AS BLOB)), 1, 16)) AS head_hex,
       lower(substring(hex(CAST(text AS BLOB)),
         greatest(1, 2 * octet_length(CAST(text AS BLOB)) - 7), 8)) AS tail_hex,
       md5(text) AS digest
       FROM documents ORDER BY doc_id"""

  /** Binary-asset dedup by content fingerprint: per-partition decode →
    * 64-bit fingerprint (here the sha256 head; a real pipeline slots a
    * perceptual hash into the same decode stage) → one groupBy on the
    * 8-byte key. Only (doc_id, fingerprint) ever shuffles — the binary
    * payload stays in the scan stage, which is what makes this viable
    * when the assets are 100 TB. */
  def mmPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // canonicalize before hashing (lower/strip/collapse — the same
    // normalize-then-fingerprint shape as Text.normalize): byte-exact
    // duplicates are rare, canonical duplicates are the real target
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")), "utf-8").as("bytes"))
      .as[DocBin]
      .mapPartitions(decodePartition)
      .toDF()
      .select(col("doc_id"), substring(col("sha256"), 1, 16).as("phash"))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .filter(col("n_copies") > 1)
      .orderBy(col("phash"))
  }
  val mmPhashDedupSql: String =
    """SELECT substr(sha256(trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))), 1, 16) AS phash,
       count(1) AS n_copies, min(doc_id) AS keeper
       FROM documents GROUP BY 1 HAVING count(1) > 1 ORDER BY phash"""

  val queries: Map[String, QFn] = Map(
    "mm_phash_dedup" -> mmPhashDedup,
    "mm_metadata" -> mmMetadata,
    "mm_frame_sample" -> mmFrameSample,
    "mm_resize_plan" -> mmResizePlan,
    "mm_feature_extract" -> mmFeatureExtract)

  val oracles: Map[String, String] = Map(
    "mm_phash_dedup" -> mmPhashDedupSql,
    "mm_metadata" -> mmMetadataSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_resize_plan" -> mmResizePlanSql,
    "mm_feature_extract" -> mmFeatureExtractSql)
}
