package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Util._

/** Deduplication operators for training-data pipelines (builder brief /
  * SURVEY.md §2.6): exact, hash-keyed exact, MinHash+LSH near-dup,
  * SimHash near-dup, n-gram Jaccard.
  *
  * Scale design: near-dup candidate generation NEVER cross-joins — it
  * is a `groupBy`-style self-join on LSH bucket keys (banded MinHash
  * signatures / SimHash byte-bands), so the shuffle volume is
  * O(docs × bands) and candidate verification touches only bucket
  * collisions. The DuckDB oracles compute the *exact* all-pairs answer
  * (feasible at oracle scale); band parameters are sized so LSH recall
  * at the thresholds is ~1 − 1e-15 (J ≥ 0.7: 32 bands × 4 rows;
  * Hamming ≤ 3 over 32 bits: 4 bands × 8 bits is exact by pigeonhole).
  */
object Dedup {

  // -- shared shingle stage ------------------------------------------------

  /** docs → (doc_id, shingles[], hs[]) with distinct 3-word shingles and
    * their 32-bit hashes, computed in a TYPED map stage
    * (graft.functions.TextHash).
    *
    * Two deliberate choices, both measured at sf0.1:
    *  - repartition BEFORE the map spreads per-doc work across all
    *    cores (document files often arrive as one fat split);
    *  - the typed map is a SerializeFromObject boundary: Catalyst
    *    cannot collapse it into downstream Generates or infer scan-level
    *    filters that re-evaluate the text pipeline per output row (the
    *    SQL-expression formulation of this stage was inlined 4× into a
    *    Filter by InferFiltersFromGenerate — minutes instead of
    *    seconds).
    */
  private[ops] def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Flow.sharedScanOf(spark, s"shingled:$sfDir",
        graft.Util.fileFingerprint(s"$sfDir/documents.parquet")) {
      import spark.implicits._
      val parallelism = spark.sparkContext.defaultParallelism
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .repartition(parallelism)
        .as[(Long, String)]
        .map { case (id, text) =>
          val sh = graft.functions.TextHash.shingles(text)
          (id, sh, sh.map(graft.functions.TextHash.h32))
        }
        .toDF("doc_id", "shingles", "hs")
    }

  /** Banded minhash bucket keys, shared (persist-once) between the
    * batch LSH dedup and the incremental batch-vs-index variant — the
    * signature computation is the index artifact; neither consumer
    * re-runs the shingle stage. */
  private[ops] def minhashBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Flow.sharedScanOf(spark, s"minhash_buckets:$sfDir",
        graft.Util.fileFingerprint(s"$sfDir/documents.parquet")) {
      import spark.implicits._
      shingled(spark, sfDir).select(col("doc_id"), col("hs"))
        .as[(Long, Array[Long])]
        .flatMap { case (id, hs) =>
          if (hs.isEmpty) Nil
          else graft.functions.TextHash.minhashBands(hs).map(b => (id, b))
        }
        .toDF("doc_id", "bucket")
    }

  // -- exact dedup ---------------------------------------------------------

  /** Exact dedup: keep min doc_id per distinct text. The groupBy key is
    * sha256(text), NOT the text — the shuffle moves 32-byte digests
    * instead of document bodies, which is the difference between a
    * metadata-sized exchange and re-shuffling the corpus at 100 TB.
    * Semantics are by-text (collision odds 2⁻¹²⁸); the oracle groups by
    * the raw text, so the digest grouping itself is cross-checked. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    digestGroups(spark, sfDir)
      .select(col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))
  val exactDedupSql: String =
    """SELECT CAST(min(doc_id) AS BIGINT) AS keeper, count(1) AS n_copies
       FROM documents GROUP BY text ORDER BY keeper"""

  /** The shared digest-keyed aggregate behind both exact-dedup views. */
  private def digestGroups(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exact dedup keyed on sha256(text), digest exposed: at 100 TB you
    * shuffle 32-byte digests, not document bodies. */
  def exactHashDedup(spark: SparkSession, sfDir: String): DataFrame =
    digestGroups(spark, sfDir).orderBy(col("h"))
  val exactHashDedupSql: String =
    """SELECT sha256(text) AS h, CAST(min(doc_id) AS BIGINT) AS keeper,
       count(1) AS n_copies
       FROM documents GROUP BY 1 ORDER BY h"""

  // -- MinHash + LSH near-dup ----------------------------------------------

  /** Near-dup pairs with 3-word-shingle Jaccard ≥ 0.7.
    *
    * Pipeline: per-doc MinHash signature (128 hashes, computed as array
    * expressions — zero shuffle) → 32 banded bucket keys → exploded
    * bucket table → self-join on bucket key (shuffle on key, no
    * cross-join) → distinct candidate pairs → exact Jaccard verify on
    * the shingle sets → threshold. Output is exact (candidates are
    * verified), so it hash-matches the all-pairs oracle as long as LSH
    * recall holds (≥ 1 − 1e-15 at J ≥ 0.7 with 32×4).
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    minhashPairsCompute(spark, sfDir).orderBy(col("da"), col("db"))

  /** The LSH candidate + verify kernel (unordered) — the registered
    * query adds the deterministic ORDER BY; [[minhashPairs]] persists
    * this frame as the registry artifact downstream consumers read. */
  private def minhashPairsCompute(spark: SparkSession,
      sfDir: String): DataFrame = {
    val base = shingled(spark, sfDir)

    // Signature + banding in one tight typed-stage JVM loop per doc,
    // shared with the incremental variant (see [[minhashBuckets]]).
    val buckets = minhashBuckets(spark, sfDir)

    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()

    val sets = base.select(col("doc_id"), col("shingles"))
    cand
      .join(sets.select(col("doc_id").as("da"), col("shingles").as("sa")), "da")
      .join(sets.select(col("doc_id").as("db"), col("shingles").as("sb")), "db")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("u", size(col("sa")) + size(col("sb")) - col("i"))
      .filter(lit(1.0) * col("i") / col("u") >= 0.7)
      .select(col("da"), col("db"),
        e4(lit(1.0) * col("i") / col("u")).as("j_e4"))
  }

  /** The verified near-dup PAIR SET as a registry artifact (r18,
    * guide §1.2 — don't recompute a stage output you already have):
    * it is the near-dedup stage's OUTPUT, bounded by true duplicate
    * volume (never corpus-sized), and the corpus pipelines, the
    * drop-lineage audit and the clustering tail each consumed it by
    * re-running the bucket self-join + exact verification per
    * invocation. File-backed (the sharedTableOf rationale: several
    * consumer actions, codegen-fused read-back). The registered
    * `dedup_minhash_lsh` query stays un-memoized so its bench row
    * keeps measuring the real LSH sweep — the ann_brute_topk
    * convention. */
  private[ops] def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Flow.sharedTableOf(spark, s"minhash_pairs:$sfDir",
        graft.Util.fileFingerprint(s"$sfDir/documents.parquet")) {
      minhashPairsCompute(spark, sfDir)
    }
  /** The near-dup acceptance threshold (3-word-shingle Jaccard) —
    * one constant for the Spark verify, the LSH oracle, and the
    * pipeline oracle's drop set. */
  val JaccardThreshold = 0.7

  /** All-pairs shingle intersection CTEs over the shared `sh` table —
    * ONE SQL definition for [[minhashLshSql]] and
    * [[graft.ops.Text.corpusBuildPipelineSql]]'s drop set: defines
    * `cnt(doc_id, n)` and `inter(da, db, i)`. */
  val jaccardPairCtes: String =
    """cnt AS (SELECT doc_id, count(1) AS n FROM sh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(1) AS i
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)"""

  def minhashLshSql: String =
    s"""WITH ${Text.shingleCte},
       $jaccardPairCtes
       SELECT da, db,
         CAST(floor((1.0 * i / (ca.n + cb.n - i)) * 10000.0) AS BIGINT) AS j_e4
       FROM inter
       JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
       WHERE 1.0 * i / (ca.n + cb.n - i) >= $JaccardThreshold
       ORDER BY da, db"""

  /** Analytic banded-LSH catch probability per Jaccard decile,
    * 1 − (1 − s^r)^b at the decile midpoint, e4-floored ONCE here so
    * the Spark plan and the DuckDB oracle embed the identical
    * constants (cross-engine pow in the last ulp can differ; shared
    * literals cannot). */
  private val lshAnalyticE4: IndexedSeq[Long] = (0 to 9).map { bkt =>
    val s = (bkt + 0.5) / 10.0
    math.floor((1.0 - math.pow(
      1.0 - math.pow(s, graft.functions.TextHash.BandRows.toDouble),
      graft.functions.TextHash.NumBands.toDouble)) * 10000.0).toLong
  }

  /** `dedup_lsh_calibration` — MEASURED banding S-curve for the
    * corpus: does the 32×4 MinHash banding actually catch what it
    * promises on THIS data? A deterministic fixed-size doc sample
    * (≈256 docs — [[graft.ops.Text.hashSampleFixed]], so the pair
    * count is bounded at ~32k whatever the corpus size) gets exact
    * all-pairs Jaccard and the real banded signatures; per Jaccard
    * decile the output reports pairs, banding catches, the measured
    * catch rate, and the analytic 1−(1−s⁴)³² reference. This is the
    * eval a dedup owner reads before trusting LSH parameters on a new
    * corpus — measured recall above the 0.7 threshold, measured
    * candidate pollution below it — in the held-out-eval house style
    * (langid, classifier, retrieval). All pair work runs on the
    * broadcast 256-row sample; the only corpus-sized cost is the
    * shared shingle artifact both sides already pay. */
  def lshCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sample = Text.hashSampleFixed(
      shingled(spark, sfDir).filter(size(col("shingles")) > 0),
      "doc_id", 256L)
    val withBands = sample.select(col("doc_id"), col("shingles"), col("hs"))
      .as[(Long, Array[String], Array[Long])]
      .map { case (id, sh, hs) =>
        (id, sh, graft.functions.TextHash.minhashBands(hs).toArray) }
      .toDF("doc_id", "shingles", "bands")
    val l = withBands.select(col("doc_id").as("da"),
      col("shingles").as("sa"), col("bands").as("ba"))
    val r = withBands.select(col("doc_id").as("db"),
      col("shingles").as("sb"), col("bands").as("bb"))
    val analytic = (0 to 9).foldLeft(lit(0L)) { (acc, bkt) =>
      when(col("bucket") === bkt, lit(lshAnalyticE4(bkt))).otherwise(acc)
    }
    l.join(broadcast(r), col("da") < col("db"))
      .withColumn("i",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("u",
        size(col("sa")).cast("long") + size(col("sb")).cast("long")
          - col("i"))
      .withColumn("bucket",
        least(lit(9L), floor(lit(1.0) * col("i") / col("u") * lit(10.0))))
      .withColumn("caught", arrays_overlap(col("ba"), col("bb")))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("caught"), 1L).otherwise(0L)).as("n_caught"))
      .withColumn("catch_e4", expr("n_caught * 10000 DIV n_pairs"))
      .withColumn("analytic_e4", analytic)
      .orderBy(col("bucket"))
  }
  /** Oracle: the sampled pairs' exact Jaccard via the shared shingle
    * CTE, and the banding REPLAYED in SQL — h32 is the md5-prefix
    * convention, and the 128 (a, b) universal-hash parameters embed
    * as a VALUES table straight from [[graft.functions.TextHash]], so
    * both engines band with literally the same constants. */
  def lshCalibrationSql: String = {
    val params = graft.functions.TextHash.hashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val analytic = lshAnalyticE4.zipWithIndex
      .map { case (v, bkt) => s"WHEN $bkt THEN $v" }.mkString(" ")
    s"""WITH ${Text.shingleCte},
       docs3 AS (
         SELECT doc_id FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3),
       nn AS (SELECT count(1) AS n FROM docs3),
       ss AS (
         SELECT doc_id FROM docs3 CROSS JOIN nn
         WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT)
           < floor(4294967296.0 * least(1.0, 256.0 / n))),
       shs AS (SELECT sh.doc_id AS doc_id, sh.s AS s
         FROM sh JOIN ss ON ss.doc_id = sh.doc_id),
       scnt AS (SELECT doc_id, count(1) AS n FROM shs GROUP BY 1),
       sinter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(1) AS i
         FROM shs a JOIN shs b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT a.doc_id AS da, b.doc_id AS db,
           coalesce(i.i, 0) AS i,
           ca.n + cb.n - coalesce(i.i, 0) AS u
         FROM ss a JOIN ss b ON a.doc_id < b.doc_id
         LEFT JOIN sinter i ON i.da = a.doc_id AND i.db = b.doc_id
         JOIN scnt ca ON ca.doc_id = a.doc_id
         JOIN scnt cb ON cb.doc_id = b.doc_id),
       params(pi, pa, pb) AS (VALUES $params),
       hset AS (
         SELECT DISTINCT doc_id,
           CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS h
         FROM shs),
       sig AS (
         SELECT doc_id, pi, min((pa * h + pb) % 4294967311) AS v
         FROM hset CROSS JOIN params GROUP BY 1, 2),
       bands AS (
         SELECT doc_id, pi // 4 AS bd,
           CAST(pi // 4 AS VARCHAR) || '-' ||
             string_agg(CAST(v AS VARCHAR), '-' ORDER BY pi) AS key
         FROM sig GROUP BY doc_id, pi // 4),
       caughtp AS (
         SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bands a JOIN bands b
           ON a.bd = b.bd AND a.key = b.key AND a.doc_id < b.doc_id),
       agg AS (
         SELECT least(9, CAST(floor((1.0 * p.i / p.u) * 10.0) AS BIGINT))
             AS bucket,
           CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS caught
         FROM pairs p
         LEFT JOIN caughtp c ON c.da = p.da AND c.db = p.db)
       SELECT bucket,
         CAST(count(1) AS BIGINT) AS n_pairs,
         CAST(sum(caught) AS BIGINT) AS n_caught,
         CAST(sum(caught) * 10000 // count(1) AS BIGINT) AS catch_e4,
         CAST(CASE bucket $analytic END AS BIGINT) AS analytic_e4
       FROM agg GROUP BY bucket ORDER BY bucket"""
  }

  /** Incremental near-dedup: a NEW batch checked against the existing
    * INDEX — the production shape once a corpus is deduped once. The
    * batch's banded signatures join the (persisted, at scale) index
    * band table instead of self-joining the whole corpus, so the work
    * is O(batch) per ingest, not O(corpus²): re-deduplicating 100 TB
    * for every incoming shard is exactly what this avoids. Docs with
    * doc_id % 10 == 0 stand in for the incoming batch; candidates are
    * exact-verified like [[minhashLsh]], so the output hash-matches
    * the batch-vs-index all-pairs oracle. */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val buckets = minhashBuckets(spark, sfDir)
    val isNew = col("doc_id") % 10 === 0
    val cand = buckets.filter(isNew).as("x")
      .join(buckets.filter(!isNew).as("y"), col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("index_id"))
      .distinct()
    verifyJaccardPairs(spark, sfDir, cand)
  }

  /** Exact-verification tail shared by the batch incremental dedup and
    * its streaming sibling (`stream_dedup_index`): candidate
    * (new_id, index_id) pairs joined to their shingle sets, Jaccard
    * ≥ 0.7 kept, e4-floored. One verifier ⇒ batch and stream CANNOT
    * drift — they differ only in how candidates were discovered. */
  private[graft] def verifyJaccardPairs(spark: SparkSession, sfDir: String,
      cand: DataFrame): DataFrame = {
    val sets = shingled(spark, sfDir).select(col("doc_id"), col("shingles"))
    cand
      .join(sets.select(col("doc_id").as("new_id"), col("shingles").as("sa")),
        "new_id")
      .join(sets.select(col("doc_id").as("index_id"), col("shingles").as("sb")),
        "index_id")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("u", size(col("sa")) + size(col("sb")) - col("i"))
      .filter(lit(1.0) * col("i") / col("u") >= 0.7)
      .select(col("new_id"), col("index_id"),
        e4(lit(1.0) * col("i") / col("u")).as("j_e4"))
      .orderBy(col("new_id"), col("index_id"))
  }
  /** The incremental (new-vs-index) exact-Jaccard oracle body; the
    * optional extra index-side predicate generates the retract twin
    * from the SAME template — one shingle CTE, one threshold, one
    * rounding, so the two oracles cannot drift (review r15). */
  private def incrementalSqlWith(indexPred: String): String =
    s"""WITH ${Text.shingleCte},
       cnt AS (SELECT doc_id, count(1) AS n FROM sh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS new_id, b.doc_id AS index_id, count(1) AS i
         FROM sh a JOIN sh b ON a.s = b.s
         WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0$indexPred
         GROUP BY 1, 2)
       SELECT new_id, index_id,
         CAST(floor((1.0 * i / (ca.n + cb.n - i)) * 10000.0) AS BIGINT) AS j_e4
       FROM inter
       JOIN cnt ca ON ca.doc_id = new_id JOIN cnt cb ON cb.doc_id = index_id
       WHERE 1.0 * i / (ca.n + cb.n - i) >= 0.7
       ORDER BY new_id, index_id"""
  val incrementalDedupSql: String = incrementalSqlWith("")

  /** [[incrementalDedupSql]] with the takedown predicate applied to
    * the index side — the `stream_dedup_retract` ground truth: after
    * the index forgets doc_id % 16 == 12, surviving pairs are exactly
    * the batch pairs whose index member was not retracted. */
  val dedupRetractSql: String =
    incrementalSqlWith("\n           AND b.doc_id % 16 <> 12")

  // -- SimHash near-dup ----------------------------------------------------

  /** 32-bit SimHash over shingle hashes; near-dup = Hamming ≤ 3.
    * Candidates via 4 byte-bands (pigeonhole ⇒ exact recall for
    * Hamming ≤ 3), verified with bit_count(xor). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Majority-vote bit packing in the typed stage (see shingled()).
    val sigs = shingled(spark, sfDir)
      .select(col("doc_id"), col("hs"))
      .as[(Long, Array[Long])]
      .flatMap { case (id, hs) =>
        if (hs.isEmpty) None
        else Some((id, graft.functions.TextHash.simhash32(hs)))
      }
      .toDF("doc_id", "sh32")

    val bandCols = (0 until 4).map { k =>
      concat_ws("-", lit(k), expr(s"(shiftright(sh32, ${8 * k}) & 255)"))
    }
    val buckets = sigs
      .select(col("doc_id"), col("sh32"),
        explode(array(bandCols: _*)).as("bucket"))

    buckets.as("x")
      .join(buckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.sh32").as("ha"), col("y.sh32").as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }
  val simhashSql: String =
    s"""WITH ${Text.shingleCte},
       hs AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::UBIGINT AS h FROM sh),
       bits AS (
         SELECT doc_id, b,
           sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM hs, LATERAL unnest(range(0, 32)) AS t(b)
         GROUP BY doc_id, b),
       sig AS (
         SELECT doc_id,
           sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh32
         FROM bits GROUP BY doc_id)
       SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(bit_count(xor(a.sh32, b.sh32)) AS INT) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sh32, b.sh32)) <= 3
       ORDER BY da, db"""

  // -- n-gram Jaccard (direct, low-threshold variant) ----------------------

  /** Shingle-inverted-index Jaccard: pairs sharing ≥ 1 *rare* shingle
    * scored over the rare-shingle sets, threshold 0.5. Same shuffle
    * shape as a groupBy (inverted index on shingle), still no
    * cross-join; for high thresholds prefer [[minhashLsh]] which
    * prunes candidates before scoring.
    *
    * Stop-shingle cap (the [[graft.ops.Text.docOverlapPairs]]
    * mechanism): shingles appearing in > `MaxShingleDf` docs are
    * dropped before the self-join — one boilerplate shingle shared by
    * m docs would otherwise make its bucket m², and near-dup pairs by
    * definition share many rare shingles, so the cap bounds candidate
    * volume without losing true pairs. Jaccard is computed over kept
    * shingles on both sides (per-doc sizes count kept shingles only),
    * keeping the score a true Jaccard of the capped sets. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    // The capped postings table is the index artifact: materialized
    // ONCE (persist via the D3 registry) and fed to all three
    // consumers — the per-doc size aggregate and both sides of the
    // pair self-join. Without it each consumer re-runs the typed
    // shingle stage (exchange reuse does not canonicalize across the
    // self-join clones): three corpus-wide shingle scans at 100 TB
    // where one suffices. df via a count window, not groupBy +
    // join-back: the capped table needs one exchange on s instead of
    // an aggregate plus a join back onto the full shingle stream
    // (measured 16% faster at sf0.1).
    intersections(spark, sfDir)
      .withColumn("u", col("na") + col("nb") - col("i"))
      .filter(lit(1.0) * col("i") / col("u") >= 0.5)
      .select(col("da"), col("db"),
        e4(lit(1.0) * col("i") / col("u")).as("j_e4"))
      .orderBy(col("da"), col("db"))
  }

  /** Shared pair-intersection table (da, db, i, na, nb) over the
    * capped postings — the expensive self-join computed ONCE per
    * session and read by both [[ngramJaccard]] and [[containment]]
    * (which differ only in the final similarity metric). */
  private def intersections(spark: SparkSession, sfDir: String): DataFrame =
    Flow.sharedScanOf(spark, s"ngram_pairs:$sfDir",
        graft.Util.fileFingerprint(s"$sfDir/documents.parquet")) {
      val kept = keptPostings(spark, sfDir)
      val cnt = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      kept.select(col("doc_id").as("da"), col("s"))
        .join(kept.select(col("doc_id").as("db"), col("s")), "s")
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("i"))
        .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
    }
  /** Document-frequency cap for [[ngramJaccard]]'s inverted index. */
  val MaxShingleDf = 50

  /** The df-capped postings index — the shared artifact behind
    * [[ngramJaccard]] and [[containment]] (persist-once via the D3
    * registry; see the comment in ngramJaccard). */
  private def keptPostings(spark: SparkSession, sfDir: String): DataFrame =
    Flow.sharedScanOf(spark, s"ngram_kept:$sfDir",
        graft.Util.fileFingerprint(s"$sfDir/documents.parquet")) {
      val sh = shingled(spark, sfDir)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
      val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
      sh.withColumn("df", count(lit(1)).over(wS))
        .filter(col("df") <= MaxShingleDf)
        .select(col("doc_id"), col("s"))
    }

  /** ASYMMETRIC containment near-dup: flag pairs where the smaller
    * document's shingles are mostly inside the bigger one —
    * c = i / min(|A|, |B|) ≥ 0.8 — the quoting/subset duplication
    * Jaccard structurally misses (a 100-shingle doc embedded verbatim
    * in a 10,000-shingle doc has J ≈ 0.01 but c = 1.0). Shares the
    * df-capped postings index with [[ngramJaccard]]: same single
    * materialization, same capped semantics mirrored in the oracle.
    * The RefinedWeb-style sub-document dedup pass. */
  def containment(spark: SparkSession, sfDir: String): DataFrame = {
    intersections(spark, sfDir)
      .filter(lit(1.0) * col("i") / least(col("na"), col("nb")) >= 0.8)
      .select(col("da"), col("db"), col("i"), col("na"), col("nb"),
        e4(lit(1.0) * col("i") / least(col("na"), col("nb"))).as("c_e4"))
      .orderBy(col("da"), col("db"))
  }
  val containmentSql: String =
    s"""WITH ${Text.shingleCte},
       rare AS (SELECT s FROM sh GROUP BY s HAVING count(1) <= $MaxShingleDf),
       kept AS (SELECT doc_id, sh.s FROM sh JOIN rare USING (s)),
       cnt AS (SELECT doc_id, count(1) AS n FROM kept GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(1) AS i
         FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT da, db, i, ca.n AS na, cb.n AS nb,
         CAST(floor((1.0 * i / least(ca.n, cb.n)) * 10000.0) AS BIGINT)
           AS c_e4
       FROM inter
       JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
       WHERE 1.0 * i / least(ca.n, cb.n) >= 0.8
       ORDER BY da, db"""
  val ngramJaccardSql: String =
    s"""WITH ${Text.shingleCte},
       rare AS (SELECT s FROM sh GROUP BY s HAVING count(1) <= $MaxShingleDf),
       kept AS (SELECT doc_id, sh.s FROM sh JOIN rare USING (s)),
       cnt AS (SELECT doc_id, count(1) AS n FROM kept GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(1) AS i
         FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT da, db,
         CAST(floor((1.0 * i / (ca.n + cb.n - i)) * 10000.0) AS BIGINT) AS j_e4
       FROM inter
       JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
       WHERE 1.0 * i / (ca.n + cb.n - i) >= 0.5
       ORDER BY da, db"""

  // -- near-dup cluster formation ------------------------------------------

  /** Connected components over the verified near-dup pair graph:
    * every document gets the minimum doc_id of its component as
    * cluster representative (keep rep, drop the rest — the final step
    * of a near-dedup pipeline).
    *
    * Implementation is iterative min-label propagation: each round
    * joins labels across edges and keeps the smaller label, until a
    * fixpoint (the driver loop runs log(diameter) rounds; each round
    * is one shuffle join — the standard scalable CC shape). The DuckDB
    * oracle computes the same fixpoint with a recursive CTE. */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // r18: read the persisted pair artifact — clustering is a TAIL
    // over the near-dedup stage's output, not a reason to re-run it
    val pairs = minhashPairs(spark, sfDir).select(col("da"), col("db"))

    // Near-dup pair graphs are tiny relative to the corpus (they are
    // the OUTPUT of dedup, bounded by true duplicate volume). Up to a
    // hard cap we run union-find on the driver — one job instead of
    // log(diameter) shuffle rounds; past the cap, fall back to the
    // distributed min-label loop below. Both produce the component-min
    // representative, so the oracle is unchanged.
    val MaxDriverPairs = 1 << 20
    val collected = pairs.limit(MaxDriverPairs + 1).collect()
    if (collected.length <= MaxDriverPairs) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      collected.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          parent(hi) = lo
        }
      }
      return parent.keys.toSeq.sorted
        .map(id => (id, find(id)))
        .toDF("doc_id", "cluster_rep")
        .orderBy(col("doc_id"))
    }

    val edges = pairs
      .union(pairs.select(col("db").as("da"), col("da").as("db")))
      .persist()
    var labels = edges.select(col("da").as("id")).distinct()
      .withColumn("rep", col("id"))
      .persist()
    var changed = 1L
    // previous round's checkpointed blocks — Dataset.unpersist() cannot
    // free them (graft.Util.checkpointRdd); the final round's blocks
    // stay live because the returned plan reads them.
    var prevCk: Option[org.apache.spark.rdd.RDD[_]] = None
    while (changed > 0) {
      val neighborMin = edges
        .join(labels.select(col("id").as("db"), col("rep").as("nrep")), "db")
        .groupBy(col("da")).agg(min(col("nrep")).as("min_nrep"))
      // localCheckpoint truncates the logical plan each round — with
      // persist alone the unrolled lineage re-analyzes per iteration
      // and driver planning time grows superlinearly with diameter
      // (same fix as Relational.graphPagerank)
      val updated = labels
        .join(neighborMin.select(col("da").as("id"), col("min_nrep")),
          Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("min_nrep"), col("rep"))).as("rep"),
          col("rep").as("old_rep"))
        .localCheckpoint(true)
      changed = updated.filter(col("rep") =!= col("old_rep")).count()
      labels.unpersist()
      prevCk.foreach(_.unpersist(false))
      prevCk = graft.Util.checkpointRdd(updated)
      labels = updated.select(col("id"), col("rep"))
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
      .orderBy(col("doc_id"))
  }
  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${Text.shingleCte},
       cnt AS (SELECT doc_id, count(1) AS n FROM sh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(1) AS i
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT da, db FROM inter
         JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
         WHERE 1.0 * i / (ca.n + cb.n - i) >= 0.7),
       edges AS (SELECT da, db FROM pairs
                 UNION ALL SELECT db, da FROM pairs),
       nodes AS (SELECT DISTINCT da AS id FROM edges),
       walk(id, r) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.db, w.r FROM walk w JOIN edges e ON e.da = w.id)
       SELECT id AS doc_id, min(r) AS cluster_rep
       FROM walk GROUP BY id ORDER BY doc_id"""

  // -- representative selection ---------------------------------------------

  /** Keep-best selection: within each canonical-duplicate group (md5 of
    * the normalized text, same canon as Text.normalize) keep the
    * highest-quality copy — longest raw text, then lowest doc_id.
    *
    * The document BODY is projected away before the shuffle: the window
    * sorts only (fp, len, doc_id), ~30 bytes/doc, so the exchange
    * volume is independent of document size — the difference between a
    * 3 GB and a 100 TB shuffle at corpus scale (measured 4.6 s → 1.5 s
    * even at sf0.1). The verdict row carries the dropped count so the
    * downstream filter is a broadcast-able keeper list, not a second
    * pass over the corpus. */
  def keepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp"))
      .orderBy(col("keeper_len").desc, col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("keeper_len"),
        md5(trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))).as("fp"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("rk") === 1)
      .select(col("fp"), col("doc_id").as("keeper"), col("keeper_len"),
        (col("n_copies") - 1).as("n_dropped"))
      .orderBy(col("fp"))
  }
  val keepBestSql: String =
    """SELECT fp, doc_id AS keeper, CAST(length(text) AS INT) AS keeper_len,
       n_copies - 1 AS n_dropped
       FROM (
         SELECT fp, doc_id, text,
           CAST(row_number() OVER (PARTITION BY fp
             ORDER BY length(text) DESC, doc_id) AS INT) AS rk,
           count(1) OVER (PARTITION BY fp) AS n_copies
         FROM (SELECT doc_id, text,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
               FROM documents))
       WHERE rk = 1 ORDER BY fp"""

  /** URL canonicalization + exact dedup — the web-corpus dedup step
    * that runs BEFORE any content hashing: the same page fetched as
    * `HTTPS://Host.Example.com:443/docs/7/?utm_source=feed&id=3#top`
    * and `https://host.example.com/docs/7?id=3` must collapse to one
    * canonical key. The canonicalizer (strip fragment → lowercase
    * scheme/authority → drop default :443 port → drop tracking params
    * → fold the path's trailing slash) is generated ONCE as SQL text
    * and evaluated by both engines, so the oracle exercises the real
    * transformation rather than restating it. Portability constraints
    * baked into that text: anchored single-match regexes only (DuckDB
    * `regexp_replace` is first-match where Spark's is all-match) and
    * no backreferences (`$1` vs `\1` divergence); multi-occurrence
    * strips use plain `replace()`, all-occurrence in both engines.
    * Raw URLs derive deterministically from doc fields — the test
    * tables ship no URL column — while the canonicalizer itself is
    * input-agnostic. Scale: a pure per-row map feeding one groupBy on
    * the canonical key, the same shuffle shape as [[exactHashDedup]]. */
  private[graft] val rawUrlExpr: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
        CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
        '.Example.com' ||
        CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
        '/docs/' || CAST(doc_id % 50 AS STRING) ||
        CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
        CASE doc_id % 3
          WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS STRING)
          WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS STRING)
          ELSE '' END ||
        CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END)"""
  private[graft] def canonUrlExpr(in: String): String = {
    val noFrag = s"regexp_replace($in, '#.*', '')"
    // The default-port strip is anchored to the END of the extracted
    // authority (':443$'), never a positional replace over the whole
    // URL — a path containing the literal ':443/' must survive (the
    // r6 advice's adversarial case, specced in OperatorSpecs).
    val authPart =
      s"regexp_replace(lower(regexp_extract($noFrag, '^[a-zA-Z]+://[^/?#]*', 0)), ':443$$', '')"
    val auth = s"($authPart" +
      s" || regexp_replace($noFrag, '^[a-zA-Z]+://[^/?#]*', ''))"
    val noUtm = s"replace($auth, '?utm_source=feed&', '?')"
    val noSlashQ = s"replace($noUtm, '/?', '?')"
    s"regexp_replace($noSlashQ, '/$$', '')"
  }
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("url", expr(canonUrlExpr(rawUrlExpr)))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("url"))
  val urlDedupSql: String =
    s"""SELECT url, count(1) AS n_copies, min(doc_id) AS keep_doc_id
       FROM (SELECT doc_id, ${canonUrlExpr(rawUrlExpr)} AS url FROM documents)
       GROUP BY 1 HAVING count(1) >= 2 ORDER BY url"""

  // -- exact substring-span dedup ------------------------------------------

  /** Exact substring-level duplication (the suffix-array dedup shape
    * from the training-data-dedup literature, re-expressed for Spark):
    * find maximal character spans that are duplicated ACROSS documents,
    * reported per document as `[span_start, span_end)` with the number
    * of stride windows that witnessed the duplication.
    *
    * Pipeline: stride windows (W=40 chars, S=10) → per-window 128-bit
    * key (two independent xxhash64 of the window text, computed
    * MAP-SIDE so only `(k1,k2,doc_id,pos)` ever cross an exchange — the
    * corpus text never shuffles) → cross-doc duplication test as
    * `min(doc_id) ≠ max(doc_id)` over a (k1,k2) window → per-doc
    * gaps-and-islands merge of overlapping/adjacent windows into
    * maximal spans.
    *
    * 100 TB shape: window volume is `len/S` per doc (linear in corpus),
    * and the whole query is ONE corpus scan plus two metadata-only
    * exchanges (by window key, then by doc_id). Duplication fans out
    * one row per *occurrence*, never per pair, so a boilerplate 40-gram
    * shared by 10⁸ docs costs 10⁸ 28-byte rows in one spill-capable
    * sort partition — linear — where a pair-join would cost 10¹⁶. The
    * oracle groups by the raw window text; the 128-bit double-hash
    * grouping is therefore cross-checked (collision odds ~2⁻¹²⁸/pair).
    */
  def substringSpans(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 40
    val S = 10
    val wins = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= W)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - W, lit(S))).as("pos"))
      .select(col("doc_id"), col("pos"),
        col("text").substr(col("pos") + 1, lit(W)).as("w"))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("w")).as("k1"), xxhash64(col("w"), lit(0x9E37L)).as("k2"))
    // "≥ 2 distinct docs" as min≠max doc_id over a (k1,k2) window: ONE
    // corpus scan and ONE metadata-only exchange. The groupBy+self-join
    // alternative needs the window stage twice (its partial aggregate
    // sits below the exchange, so ReuseExchange cannot unify the
    // build and probe subtrees — two corpus scans), and countDistinct
    // would add a third (k1,k2,doc_id)-keyed shuffle. Hot-key bound:
    // a boilerplate 40-gram with B occurrences puts B rows of 28 bytes
    // in one spill-capable sort partition — linear in occurrences,
    // never pairwise.
    val byKey = Window.partitionBy(col("k1"), col("k2"))
    val hits = wins
      .withColumn("mn", min(col("doc_id")).over(byKey))
      .withColumn("mx", max(col("doc_id")).over(byKey))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= W, lit(0)).otherwise(lit(1)))
      .withColumn("grp_id",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp_id"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + W).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
      .orderBy(col("doc_id"), col("span_start"))
  }
  val substringSpansSql: String =
    """WITH wins AS (
         SELECT d.doc_id, gs.pos AS pos,
                substr(d.text, CAST(gs.pos + 1 AS INT), 40) AS w
         FROM documents d, LATERAL (
           SELECT unnest(generate_series(0, CAST(length(d.text) AS BIGINT) - 40, 10)) AS pos) gs
         WHERE length(d.text) >= 40
       ), dup AS (
         SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2
       ), hits AS (
         SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM dup)
       ), islands AS (
         SELECT doc_id, pos,
           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 40
                THEN 0 ELSE 1 END AS brk
         FROM hits
       ), grp AS (
         SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp_id
         FROM islands
       )
       SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
              CAST(max(pos) + 40 AS BIGINT) AS span_end, count(*) AS n_windows
       FROM grp GROUP BY doc_id, grp_id ORDER BY doc_id, span_start"""

  /** Entity resolution by blocked fuzzy match — the record-linkage
    * shape: collapse to DISTINCT names first (exact-dedup composition:
    * 2,000 part rows → ~100 names, each carrying its support count),
    * block on the head noun (last name token), then verify only
    * within-block pairs with an edit-distance ≤ 2 gate.
    *
    * Never an all-pairs join: candidates are bounded by
    * Σ_block |block|², and blocks are value-bounded (a vocabulary,
    * not the corpus — at 100 TB the blocking key would be a
    * phonetic/sorted-neighborhood key with a per-block posting cap,
    * the dedup_ngram_jaccard mechanism). Levenshtein is the same
    * integer DP in both engines, so the pair set is oracle-exact.
    * Support counts ride the collapsed names, so downstream merge
    * decisions (keep the higher-support spelling) need no second scan. */
  def erFuzzyBlock(spark: SparkSession, sfDir: String): DataFrame = {
    // head noun = 2nd token; names are "adjective noun" by schema. A
    // 1-token name must blk=null and drop via the isNotNull filter on
    // BOTH sides (none exist in the data) — try_element_at, not
    // element_at: under ANSI mode (Spark 4 default) element_at throws
    // INVALID_ARRAY_INDEX out-of-bounds, so the null-drop guard would
    // be dead code and one malformed name would fail the whole query.
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", expr("try_element_at(split(p_name, ' '), 2)"))
      .filter(col("blk").isNotNull)
    val a = names.select(col("blk"), col("p_name").as("a_name"),
      col("n_rows").as("a_rows"))
    val b = names.select(col("blk"), col("p_name").as("b_name"),
      col("n_rows").as("b_rows"))
    a.join(b, "blk").filter(col("a_name") < col("b_name"))
      .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
      .filter(col("lev") <= 2)
      .select(col("a_name"), col("b_name"), col("lev"),
        col("a_rows"), col("b_rows"))
      .orderBy(col("a_name"), col("b_name"))
  }
  val erFuzzyBlockSql: String =
    """WITH names AS (
         SELECT p_name, count(1) AS n_rows,
           split_part(p_name, ' ', 2) AS blk
         FROM part GROUP BY p_name
         HAVING split_part(p_name, ' ', 2) <> '')
       SELECT a.p_name AS a_name, b.p_name AS b_name,
         CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
         a.n_rows AS a_rows, b.n_rows AS b_rows
       FROM names a JOIN names b
         ON a.blk = b.blk AND a.p_name < b.p_name
       WHERE levenshtein(a.p_name, b.p_name) <= 2
       ORDER BY a_name, b_name"""

  /** The ACTION half of substring-level dedup (`dedup_substring_spans`
    * detects; this scrubs): per doc, total characters the merged
    * duplicated spans would cut, the kept remainder, and the e4
    * reduction ratio — the number a curation run reports ("exact
    * substring dedup removed 7.2 % of the corpus", the suffix-array
    * pipeline's headline stat). Consumes the SAME span table the
    * detector emits (plan = execution, like d4_backfill_run), so the
    * two can never disagree about what was cut. Spans are merged
    * non-overlapping by construction (gaps-and-islands), so the cut
    * is Σ(span_end − span_start) with no double counting; docs with
    * no duplicated span keep everything and report 0. */
  def spanScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val spans = substringSpans(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("cut_chars"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .join(spans, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "cut_chars"))
      // a span's tail window can overrun the text end by < stride;
      // clamp so kept_chars is never negative on short tails
      .withColumn("cut_chars", least(col("cut_chars"), col("n_chars")))
      .select(col("doc_id"), col("n_chars"), col("n_spans"),
        col("cut_chars"), (col("n_chars") - col("cut_chars")).as("kept_chars"),
        expr("(cut_chars * 10000) div n_chars").as("reduction_e4"))
      .orderBy(col("doc_id"))
  }
  val spanScrubSql: String = {
    // the detector's own span CTE, aggregated — oracle replays the
    // same arithmetic end-to-end
    val inner = substringSpansSql
      .replaceAll("ORDER BY doc_id, span_start\\s*$", "")
    s"""WITH spans AS ($inner),
       agg AS (
         SELECT doc_id, count(1) AS n_spans,
           CAST(sum(span_end - span_start) AS BIGINT) AS cut0
         FROM spans GROUP BY doc_id)
       SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         coalesce(a.n_spans, 0) AS n_spans,
         least(coalesce(a.cut0, 0), CAST(length(d.text) AS BIGINT))
           AS cut_chars,
         CAST(length(d.text) AS BIGINT)
           - least(coalesce(a.cut0, 0), CAST(length(d.text) AS BIGINT))
           AS kept_chars,
         (least(coalesce(a.cut0, 0), CAST(length(d.text) AS BIGINT)) * 10000)
           // CAST(length(d.text) AS BIGINT) AS reduction_e4
       FROM documents d LEFT JOIN agg a USING (doc_id)
       ORDER BY d.doc_id"""
  }

  val queries: Map[String, QFn] = Map(
    "er_fuzzy_block" -> erFuzzyBlock,
    "dedup_substring_spans" -> substringSpans,
    "dedup_span_scrub" -> spanScrub,
    "dedup_url" -> urlDedup,
    "dedup_keep_best" -> keepBest,
    "dedup_exact" -> exactDedup,
    "dedup_exact_hash" -> exactHashDedup,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_lsh_calibration" -> lshCalibration,
    "dedup_incremental" -> incrementalDedup,
    "dedup_simhash" -> simhash,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_containment" -> containment,
    "dedup_clusters" -> dedupClusters)

  val oracles: Map[String, String] = Map(
    "er_fuzzy_block" -> erFuzzyBlockSql,
    "dedup_substring_spans" -> substringSpansSql,
    "dedup_span_scrub" -> spanScrubSql,
    "dedup_url" -> urlDedupSql,
    "dedup_keep_best" -> keepBestSql,
    "dedup_exact" -> exactDedupSql,
    "dedup_exact_hash" -> exactHashDedupSql,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_lsh_calibration" -> lshCalibrationSql,
    "dedup_incremental" -> incrementalDedupSql,
    "dedup_simhash" -> simhashSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_containment" -> containmentSql,
    "dedup_clusters" -> dedupClustersSql)
}
