package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {
  test("streaming windowed counts equal the batch tumbling aggregation") {
    // FileStreamSource wants a directory: stage the events file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventsStream.readEvents(spark, dir.toString)
    val got = EventsStream.runToMemory(spark,
      EventsStream.windowedCounts(stream), "win_counts")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"), col("k_sum"))
      .collect().toSet
    val want = Relational.tumblingWindowAgg(spark, sf).collect().toSet
    assert(got == want)
  }

  test("declare-then-stage: late MILLIS-annotated file parses by its annotation") {
    import spark.implicits._
    // The r8 item-4 scenario, impossible before the lazy ts expression:
    // the stream is DECLARED over an empty directory (construction-time
    // unit resolution would bake the magnitude fallback into the plan),
    // THEN a MILLIS-annotated file lands whose epoch the fallback
    // misroutes: 1e14 ms (year ~5138) has |ts| >= 1e14, so the
    // magnitude tiers read it as MICROSECONDS → 1973. The annotation
    // must win: the first batch returns the year-5138 instant.
    val dir = java.nio.file.Files.createTempDirectory("graft_late_millis")
      .toString
    val declared = EventsStream.readEvents(spark, dir)
      .select(col("event_id"), col("ts"))
    val ms = 100000000000000L // 1e14 ms
    graft.Util.withConf(spark,
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS") {
      Seq((1L, new java.sql.Timestamp(ms), 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/staged.parquet")
      // flatten the part files up into the watched dir
      val part = Option(new java.io.File(s"$dir/staged.parquet").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Path.of(s"$dir/events.parquet"))
    }
    val out = EventsStream.runIncremental(spark, declared, "late_millis",
      dir, org.apache.spark.sql.streaming.OutputMode.Append())
    val got = out.select(col("event_id"), col("ts")).collect()
    assert(got.length == 1)
    assert(got(0).getAs[java.sql.Timestamp]("ts").getTime == ms,
      s"late-staged MILLIS annotation must win over the magnitude " +
        s"fallback: ${got(0)}")
  }

  test("incremental runner is idempotent under micro-batch replay") {
    import org.apache.spark.sql.streaming.OutputMode
    // foreachBatch is at-least-once: simulate the crash window (parquet
    // committed, checkpoint commit lost) by deleting the newest commit
    // file and re-triggering — the engine replays the batch through
    // foreachBatch with the SAME batchId, which must overwrite its own
    // partition, not append a second copy of every row.
    val dir = java.nio.file.Files.createTempDirectory("graft_replay")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    def run(name: String) = {
      val src = spark.readStream.schema(EventsStream.rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir.toString)
        .select(col("event_id"), col("event_type"))
      EventsStream.runIncremental(spark, src, name, dir.toString,
        OutputMode.Append())
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    val first = rows(run("replay_a"))
    assert(first.nonEmpty && first.distinct == first)
    // Clone the runner's state (checkpoint + output) to the path a
    // runner named replay_b would use, then drop the newest commit
    // record in the CLONE — the crashed-before-checkpoint-commit
    // image. (Spark 4 refuses in-place commit-log tampering on a
    // checkpoint this session already ran — the clone sidesteps the
    // guard without weakening the scenario.)
    val key = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir.toString))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_stream_" +
      spark.sparkContext.applicationId
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      }
    }
    copyTree(java.nio.file.Paths.get(s"$root/replay_a_$key"),
      java.nio.file.Paths.get(s"$root/replay_b_$key"))
    val commits = new java.io.File(s"$root/replay_b_$key/ckpt/commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(latest.delete(), "failed to drop the commit record")
    // and its Hadoop ChecksumFS sidecar — a stale .crc makes the
    // replay's commit rename fail as a phantom concurrent writer
    new java.io.File(commits, s".${latest.getName}.crc").delete()
    val second = rows(run("replay_b"))
    assert(second == first,
      s"replayed batch must not change the output: ${second.size} vs ${first.size}")
  }

  test("native streaming session_window equals the batch session grouping") {
    // AvailableNow + Complete replays the whole history, so the final
    // gap-merged windows must equal Relational.sessionizeNative row
    // for row (same start/end/count — the stateful operator's merge
    // logic agrees with the batch grouping).
    val got = EventsStream.streamSessionWindow(spark, sf).collect().toSeq
    val want = Relational.sessionizeNative(spark, sf).collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("transformWithState running counts equal batch groupBy (RocksDB store)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = EventsStream.runningCounts(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = Tables.events(spark, sf).groupBy(col("user_id")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, "stateful totals must equal the batch aggregation")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream heavy hitters: exact vs batch, candidate state bounded") {
    // equality with the batch SQL answer (the oracle's shape)
    val got = EventsStream.streamHeavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val keyed = Tables.events(spark, sf)
      .select(expr(EventsStream.HHFoldSql).as("k"))
    val n = keyed.count()
    val want = keyed.groupBy(col("k")).count()
      .filter(col("count") * EventsStream.HHPhiInv > n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }.toSeq
    assert(got == want, s"stream HH must equal batch exact counts")
    assert(got.nonEmpty, "fixture fold must yield at least one heavy hitter")
    // the bounded-state contract: the incremental stage's total emitted
    // candidate set (a superset of what ever lived in MG state) stays
    // within shards x (1/phi) per batch — independent of |keys| and n
    val candDir = s"${graft.Util.sessionTmpDir(spark, "graft_stream")}/" +
      s"hh_${java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sf))}/out"
    val perBatch = spark.read.parquet(candDir)
      .groupBy(col("batch")).count().collect().map(_.getLong(1))
    assert(perBatch.nonEmpty, "guard: candidate dump must exist")
    perBatch.foreach(c =>
      assert(c <= EventsStream.HHShards * EventsStream.HHPhiInv,
        s"a batch emitted $c candidates — MG state bound violated"))
  }

  test("stream dedup index equals batch incremental dedup; bucket state bounded") {
    // one verifier (Dedup.verifyJaccardPairs) feeds both paths, so
    // equality here proves candidate DISCOVERY matched — the stateful
    // LSH index surfaced exactly the batch bucket-join's pairs
    val got = EventsStream.streamDedupIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = graft.ops.Dedup.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "stream index must equal the batch incremental dedup")
    // state-bound contract: per-bucket postings volume is governed by
    // minhash band uniformity — pin the hottest bucket on the staged
    // corpus (the ListState for a bucket holds exactly these postings)
    val maxBucket = {
      import spark.implicits._
      Tables.documents(spark, sf).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val hs = graft.functions.TextHash.shingles(text)
            .map(graft.functions.TextHash.h32)
          if (hs.isEmpty) Nil
          else graft.functions.TextHash.minhashBands(hs).map(b => (b, id))
        }
        .groupByKey(_._1).count().collect().map(_._2).max
    }
    assert(maxBucket <= 64,
      s"hottest LSH bucket holds $maxBucket postings — band hash is not " +
        "spreading; the per-bucket state contract would degrade")
    // the equality above ran on this uncapped regime: ≤64 postings per
    // bucket means MaxBucketPostings never binds on the real corpus
    assert(maxBucket <= EventsStream.MaxBucketPostings)
  }

  test("stream ANN append equals the batch index append; state bounded by cells") {
    // same assignment kernel + same gates tail = structural equality;
    // this pins it row-for-row at the flushed horizon
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    val got = shape(graft.ops.Vector.streamAnnAppend(spark, sf))
    val want = shape(graft.ops.Vector.annIndexAppend(spark, sf))
    assert(got == want, "stream append must equal the batch append's gates")
    assert(got.nonEmpty && got.forall(r => r._3 && r._5),
      "recall and completeness gates must hold")
    // cells-not-corpus state bound: the staged delta artifact carries
    // the processor's occupancy emissions — per cell, the max
    // occupancy equals that cell's delta count (ONE counter per cell
    // is the whole state), and the touched-cell count is bounded by k
    val key = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sf))
    val staged = spark.read.parquet(
      s"${graft.Util.sessionTmpDir(spark, "graft_stream")}/annx_$key/out")
    val perCell = staged.groupBy(col("cell"))
      .agg(max(col("cell_occupancy")).as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(perCell.nonEmpty, "guard: staged delta must exist")
    perCell.foreach(r => assert(r.getAs[Long]("mx") == r.getAs[Long]("n"),
      s"cell ${r.get(0)}: occupancy ${r.get(1)} != postings ${r.get(2)}"))
    assert(perCell.length <= graft.ops.Vector.corpusK(spark, sf),
      "touched cells must be bounded by the quantizer size")
  }

  test("stream corpus append equals the batch append; rerun is a durable no-op") {
    // same base-frozen artifacts + same appendTail = structural
    // equality; this pins it row-for-row at the flushed horizon
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    val got = shape(graft.ops.Text.streamCorpusAppend(spark, sf))
    val want = shape(graft.ops.Text.corpusAppendPipeline(spark, sf))
    assert(got == want, "stream append must equal the batch append")
    assert(got.nonEmpty, "guard: manifest must be non-empty")
    // the append really appends: delta rows exist at sf0.001+ corpora
    // only if gates admit any — pin the FROZEN-base half is present
    // and bins are the batch twin's (already equal above); then pin
    // the durable-checkpoint contract: a second invocation re-reads
    // the staged horizon (no new files => no new micro-batches) and
    // returns the identical manifest
    val again = shape(graft.ops.Text.streamCorpusAppend(spark, sf))
    assert(again == got, "re-trigger with no new arrivals must be a no-op")
    // per-doc gate atomicity makes micro-batch slicing invariance
    // structural (a doc is one row in one file; all its candidate
    // evidence rides stream-static joins inside its arrival batch,
    // and DocGateReducer retains zero cross-batch state) — pin the
    // zero-state claim at the API level: the reducer registers no
    // state handles, so nothing CAN persist across batches
    val red = new graft.ops.Text.DocGateReducer
    val out = red.handleInputRows(7L,
      Iterator((7L, "h", 5L, true, false), (7L, "h", 5L, true, true)),
      null).toSeq
    assert(out == Seq((7L, "h", 5L, false)),
      "reducer must fold near-dup evidence with any()")
  }

  test("stream retract equals the batch retract; multi-batch CoW; rerun no-op") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7),
        r.getBoolean(8))).toSeq
    val got = shape(graft.ops.Text.streamRetract(spark, sf))
    val want = shape(graft.ops.Text.corpusRetractRun(spark, sf))
    assert(got == want, "stream retract must equal the batch retract")
    assert(got.nonEmpty, "guard: audit must be non-empty")
    assert(got.forall(_._9), "every bin must reconcile")
    // the feed is sliced into 3 files at maxFilesPerTrigger=1, so the
    // scrub genuinely ran across MULTIPLE micro-batches (cumulative
    // CoW, not a single-shot rewrite) whenever any doc was retracted
    val tag = graft.Util.fileFingerprint(s"$sf/documents.parquet")
    val logDir = new java.io.File(
      s"${graft.Util.sessionTmpDir(spark, "graft_stream_retract")}/$tag/log")
    val batches = Option(logDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    if (got.exists(_._5 > 0))
      assert(batches.length > 1,
        s"expected multiple micro-batches, saw ${batches.map(_.getName)}")
    // re-trigger with no new takedown files: zero micro-batches, the
    // overlay is untouched, the audit re-reads the same state
    val again = shape(graft.ops.Text.streamRetract(spark, sf))
    assert(again == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("stream ann retract equals the batch twin; multi-batch CoW; rerun no-op") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    val got = shape(graft.ops.Vector.streamAnnRetract(spark, sf))
    val want = shape(graft.ops.Vector.annIndexRetract(spark, sf))
    assert(got == want, "stream index retract must equal the batch twin")
    assert(got.nonEmpty && got.forall(r => r._3 && r._6),
      "recall and CoW reconciliation gates must hold")
    // 3 feed slices at maxFilesPerTrigger=1: the scrub really ran
    // across multiple micro-batches whenever anything was retracted
    val tag = java.lang.Integer.toHexString(
      graft.ops.Vector.dataKey(sf).hashCode)
    val logDir = new java.io.File(
      s"${graft.Util.sessionTmpDir(spark, "graft_ann_sretract")}/$tag/log")
    val batches = Option(logDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    if (got.exists(_._5 > 0))
      assert(batches.length > 1,
        s"expected multiple micro-batches, saw ${batches.map(_.getName)}")
    val again = shape(graft.ops.Vector.streamAnnRetract(spark, sf))
    assert(again == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("stream_ann_query: serve == batch probe per rank, multi-batch, " +
      "aggregate recall ≥ 70%, re-trigger no-op") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5))).toSeq
    val got = shape(graft.ops.Vector.streamAnnQuery(spark, sf))
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 && r._6),
      s"same_as_batch + recall floor must hold: ${got.filterNot(_._4)}")
    // the serve stream genuinely crossed micro-batches: each of the 3
    // feed slices is non-empty for this query set, and each arrival's
    // top-k lands in its own batch partition of the staged output
    val key = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        graft.Util.sessionTmpDir(spark, "graft_ann_serve") + "/" +
          java.lang.Integer.toHexString(
            graft.ops.Vector.dataKey(sf).hashCode) + "/feed"))
    val outDir = new java.io.File(
      s"${graft.Util.sessionTmpDir(spark, "graft_stream")}/annserve_$key/out")
    val batches = Option(outDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batches.length > 1,
      s"expected multiple serve micro-batches, saw ${batches.map(_.getName)}")
    // aggregate recall of the served (== batch, gated above) top-10 vs
    // exact brute: per-query floors are weak on this clusterless
    // synthetic corpus (nprobe 4/8 cells, measured 4–10 per query),
    // but the aggregate is stable — ≥ 70% (measured 75–78%)
    val served = graft.ops.Vector.serveBatchTopk(spark, sf)
      .select(org.apache.spark.sql.functions.col("qid"),
        org.apache.spark.sql.functions.col("vec_id"))
    val brute = graft.ops.Vector.serveBruteTopk(spark, sf)
      .select(org.apache.spark.sql.functions.col("qid"),
        org.apache.spark.sql.functions.col("vec_id"))
    val hits = served.join(brute, Seq("qid", "vec_id")).count()
    val total = brute.count()
    assert(hits * 10 >= total * 7,
      s"aggregate serve recall must be ≥ 70%: $hits/$total")
    // durable checkpoint: re-trigger with no new query arrivals plans
    // zero micro-batches and reads back the identical ranked sets
    val again = shape(graft.ops.Vector.streamAnnQuery(spark, sf))
    assert(again == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("stream_ann_query_pq: ADC serve == batch twin, recall matches the " +
      "full-vector leg, codes artifact is ~16 B/vec, re-trigger no-op") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5))).toSeq
    val got = shape(graft.ops.Vector.streamAnnQueryPq(spark, sf))
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 && r._6),
      s"same_as_batch + recall floor must hold: ${got.filterNot(_._4)}")
    // the PQ shortlist (C = PqServeCandC) must cost no MEASURED recall
    // vs the full-vector serving leg on this corpus: aggregate hits vs
    // exact brute are equal between the two legs' batch twins
    import org.apache.spark.sql.functions.col
    val brute = graft.ops.Vector.serveBruteTopk(spark, sf)
      .select(col("qid"), col("vec_id"))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("vec_id"))
        .join(brute, Seq("qid", "vec_id")).count()
    val pqHits = hits(graft.ops.Vector.servePqBatchTopk(spark, sf))
    val fullHits = hits(graft.ops.Vector.serveBatchTopk(spark, sf))
    assert(pqHits >= fullHits,
      s"PQ serving must not cost measured recall: $pqHits < $fullHits")
    // the candidate-scan unit is ~16 B/vec: codes.parquet stores one
    // 8-byte code + an 8-byte id per vector; parquet framing keeps the
    // on-disk figure within 4x of that (vs ~264 B for the f32 row)
    val dir = graft.ops.Vector.persistPqDir(spark, sf)
    val codesDir = new java.io.File(s"$dir/codes.parquet")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val bytes = walk(codesDir).filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val n = spark.read.parquet(s"$dir/codes.parquet").count()
    assert(n > 0 && bytes > 0)
    assert(bytes <= n * 64,
      s"codes artifact must stay near 16 B/vec: $bytes bytes / $n vecs")
    // durable checkpoint: re-trigger plans zero batches, same answer
    val again = shape(graft.ops.Vector.streamAnnQueryPq(spark, sf))
    assert(again == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("stream_mm_ingest: planted twins gate correctly, re-trigger no-op, zero-state fold") {
    def run() = ops.Multimodal.streamMmIngest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq
    val got = run()
    assert(got.nonEmpty)
    // planted fixture structure: brightness-shifted 'b' PNG twins are
    // exact perceptual dups of their 'a' base; corner-perturbed 'n'
    // twins are near (Hamming 1..3); jpeg 'b' twins are byte-identical
    val bs = got.filter(_._1.matches("img[0-9]+b\\.png"))
    assert(bs.nonEmpty && bs.forall(g =>
      g._2 == "dup" && g._4 == 0 && g._3 == g._1.replace("b.png", "a.png")),
      bs.toString)
    // 'n' twins land within Hamming 0..3 of their own base (some
    // perturbations don't move the 8x8 block means — those are exact)
    val ns = got.filter(_._1.matches("img[0-9]+n\\.png"))
    assert(ns.nonEmpty && ns.forall(g =>
      Set("dup", "near")(g._2) && g._4 >= 0 && g._4 <= 3 &&
        g._3 == g._1.replace("n.png", "a.png")), ns.toString)
    val js = got.filter(_._1.matches("jpg[0-9]+b\\.jpg"))
    assert(js.nonEmpty && js.forall(g => g._2 == "dup" && g._4 == 0),
      js.toString)
    // durable checkpoint: a re-trigger with no new files reads back the
    // identical staged verdicts (zero new micro-batches)
    assert(run() == got, "re-trigger with no new arrivals must be a no-op")
    // the fold retains no state across batches: pure per-batch reduction
    val p = new ops.Multimodal.ArrivalFoldProcessor
    val out = p.handleInputRows("f",
      Iterator(("f", 2, "x"), ("f", -1, ""), ("f", 1, "y"), ("f", 1, "a")),
      null).toSeq
    assert(out == Seq(("f", 1, "a")), "min (hamming, file) fold")
    val none = p.handleInputRows("g",
      Iterator(("g", -1, ""), ("g", 9, "z")), null).toSeq
    assert(none == Seq(("g", -1, "")), "no candidate within 3 -> novel")
  }

  test("stream reinstate twins equal their batch twins; multi-batch; rerun no-op") {
    // corpus side
    def cShape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.toSeq).toSeq
    val cRows = ops.Text.streamReinstate(spark, sf).collect()
    val cGot = cRows.map(_.toSeq).toSeq
    val cWant = cShape(ops.Text.corpusReinstateRun(spark, sf))
    assert(cGot == cWant, "stream corpus reinstate must equal the batch twin")
    // the gates themselves must HOLD, not merely match (a regression
    // in the shared tail would break both twins identically)
    assert(cRows.nonEmpty && cRows.forall(_.getAs[Boolean]("reinstate_ok")),
      "corpus reinstate reconciliation gates must hold")
    // index side
    val iRows = graft.ops.Vector.streamAnnReinstate(spark, sf).collect()
    val iGot = iRows.map(_.toSeq).toSeq
    val iWant = cShape(graft.ops.Vector.annIndexReinstate(spark, sf))
    assert(iGot == iWant, "stream index reinstate must equal the batch twin")
    assert(iRows.nonEmpty && iRows.forall(r =>
      r.getAs[Boolean]("recall_ok") && r.getAs[Boolean]("reinstate_ok")),
      "index reinstate recall + reconciliation gates must hold")
    // the cleared feeds really staged as 3 slices -> multi-batch CoW
    // on BOTH sides
    def batchesUnder(prefix: String, tag: String) = {
      val logDir = new java.io.File(
        s"${graft.Util.sessionTmpDir(spark, prefix)}/$tag/log")
      Option(logDir.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    }
    val cBatches = batchesUnder("graft_stream_reinstate",
      graft.Util.fileFingerprint(s"$sf/documents.parquet"))
    assert(cBatches.length > 1,
      s"corpus side: expected multiple micro-batches, saw ${cBatches.length}")
    val iBatches = batchesUnder("graft_ann_sreinstate",
      java.lang.Integer.toHexString(graft.ops.Vector.dataKey(sf).hashCode))
    assert(iBatches.length > 1,
      s"index side: expected multiple micro-batches, saw ${iBatches.length}")
    // re-trigger with no new arrivals is a no-op on both sides
    assert(cShape(ops.Text.streamReinstate(spark, sf)) == cGot)
    assert(cShape(graft.ops.Vector.streamAnnReinstate(spark, sf)) == iGot)
  }

  test("stream_dedup_retract: index forgets takedowns, equals batch minus retracted") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = shape(EventsStream.streamDedupRetract(spark, sf))
    val batch = shape(ops.Dedup.incrementalDedup(spark, sf))
    val want = batch.filterNot(_._2 % 16 == 12)
    assert(got == want, s"stream must equal batch minus retracted index docs")
    assert(batch.exists(_._2 % 16 == 12),
      "guard: the takedown must remove at least one real pair")
    // the feed really staged as 3 ordered phase files -> 3 micro-batches
    val root = s"${graft.Util.sessionTmpDir(spark, "graft_dedup_retract")}/" +
      graft.Util.fileFingerprint(s"$sf/documents.parquet")
    val feedFiles = new java.io.File(s"$root/feed").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(feedFiles.map(_.getName).toSeq == Seq("p0.parquet", "p1.parquet",
      "p2.parquet") &&
      feedFiles.map(_.lastModified).sorted.sameElements(
        feedFiles.map(_.lastModified)),
      "phase files must stage with ascending mtimes")
    // re-trigger with no new files is a no-op
    assert(shape(EventsStream.streamDedupRetract(spark, sf)) == got)
  }

  test("stream_pair_ingest: both-modalities rule gates arrivals, re-trigger no-op") {
    def run() = ops.Multimodal.streamPairIngest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSeq
    val got = run()
    assert(got.nonEmpty)
    val byFile = got.map(g => g._1 -> g).toMap
    // caption-sharing pixel twins are pair dups of their base
    ops.MultimodalFixtures.CaptionDupPair.foreach { id =>
      val g = byFile(f"img$id%02db.png")
      assert(g._2 == "pair_dup" && g._3 == f"img$id%02da.png" && g._4 == 0,
        g.toString)
    }
    // identical pixels with a genuinely different caption = NOVEL pair
    // (new supervision for known pixels — the cross-modal rule)
    (ops.MultimodalFixtures.PairIds.toSet --
      ops.MultimodalFixtures.CaptionDupPair.toSet).foreach { id =>
      val g = byFile(f"img$id%02db.png")
      assert(g._2 == "novel" && g._3 == "", g.toString)
    }
    // corner-perturbed caption-sharers: dup at Hamming 1..3
    ops.MultimodalFixtures.CaptionDupVar.foreach { id =>
      val g = byFile(f"img$id%02dv.png")
      assert(g._2 == "pair_dup" && g._3 == f"img$id%02da.png" &&
        g._4 >= 0 && g._4 <= 3, g.toString)
    }
    assert(run() == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("stream_video_ingest: renditions dup, fresh footage novel, re-trigger no-op") {
    def run() = ops.Multimodal.streamVideoIngest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    val got = run()
    assert(got.length == ops.MultimodalFixtures.videoIngestSpecs.length,
      s"one verdict per arrival: $got")
    // +10-brightness renditions: every encoded byte differs, the
    // per-frame-aHash scene signature keys to the canonical original
    val vd = got.filter(_._1.matches("ivid[0-9]+d\\.gif"))
    assert(vd.nonEmpty && vd.forall(g => g._2 == "dup" &&
      g._3 == g._1.replace("ivid", "vid").replace("d.gif", ".gif")),
      vd.toString)
    val sd = got.filter(_._1.matches("iscn[0-9]+d\\.gif"))
    assert(sd.nonEmpty && sd.forall(g => g._2 == "dup" &&
      g._3 == g._1.replace("iscn", "scn").replace("d.gif", ".gif")),
      sd.toString)
    // fresh hash-noise footage shares no signature with the corpus
    val nv = got.filter(_._1.matches("ivid[0-9]+n\\.gif"))
    assert(nv.nonEmpty && nv.forall(g => g._2 == "novel" && g._3 == ""),
      nv.toString)
    // the signature is order-sensitive AND frame-count-keyed: no two
    // distinct canonical assets collide (guards the polynomial fold)
    val sigs = ops.Multimodal.videoSigPartition(
      new java.io.File(ops.MultimodalFixtures.ensure()).listFiles()
        .filter(_.getName.matches("^(vid|scn)[0-9]+\\.gif$")).sortBy(_.getName)
        .iterator.map(f => ops.ImgBin(f.getName,
          java.nio.file.Files.readAllBytes(f.toPath)))).toSeq
    assert(sigs.map(s => (s._2, s._3)).distinct.length == sigs.length,
      "canonical scene signatures must be pairwise distinct")
    // durable idempotent log: re-trigger with no new files is a no-op
    assert(run() == got, "re-trigger with no new arrivals must be a no-op")
  }

  test("LSH index bucket cap binds on a planted hot bucket") {
    // a degenerate band bucket (boilerplate collapse) must not grow
    // state past MaxBucketPostings: arrivals beyond the cap pair but
    // are not retained (r11 verdict nit #1)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("lshcap").toString
    graft.Util.withConf(spark,
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val input = MemoryStream[EventsStream.BandDoc]
      val q = input.toDS().groupByKey(_.bucket)
        .transformWithState(new EventsStream.LshIndexProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("new_id", "index_id")
        .writeStream.format("memory").queryName("lshcap")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        // batch 1: 100 index-side postings into ONE bucket (> cap)
        input.addData((1L to 100L).map(i =>
          EventsStream.BandDoc("hot", i, is_new = false)))
        q.processAllAvailable()
        assert(spark.table("lshcap").count() == 0,
          "same-side postings must not pair")
        // batch 2: one new-side arrival — pairs against the RETAINED
        // head only: exactly MaxBucketPostings pairs, not 100
        input.addData(Seq(EventsStream.BandDoc("hot", 9999L, is_new = true)))
        q.processAllAvailable()
        val pairs = spark.table("lshcap").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(pairs.size == EventsStream.MaxBucketPostings,
          s"capped bucket paired ${pairs.size} times — state grew past the cap")
        // first-come retention: the retained head is doc_ids 1..cap
        assert(pairs.map(_._2).sorted ==
          (1L to EventsStream.MaxBucketPostings.toLong))
        assert(pairs.forall(_._1 == 9999L))
      } finally q.stop()
    }
  }

  test("stream z-score anomaly equals the batch trailing window") {
    val got = EventsStream.streamZscoreAnomaly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = graft.ops.Relational.windowZscoreTrailing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, "stream and batch flag the same events")
    // sf0.001's sparse frames rarely reach the n >= 10 floor — the
    // non-vacuity of the flagged set is pinned by the sf0.01 oracle
    // gate (178 rows); here assert the shared pipeline at least SAW
    // frames on both paths by checking the batch side's input
    assert(Tables.events(spark, sf).count() > 0, "guard: events exist")
  }

  test("foreachBatch upsert: incremental state equals batch latest-wins") {
    val src = java.nio.file.Files.createTempDirectory("graft_upsert_src")
    val state = java.nio.file.Files.createTempDirectory("graft_upsert_state")
    // two staged files => two micro-batches (maxFilesPerTrigger=1)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), src.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), src.resolve("b.parquet"))
    val last = EventsStream.runUpsert(spark, src.toString, state.toString)
    assert(last >= 1L, "expected at least two micro-batches")
    val got = spark.read.parquet(s"$state/v$last")
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: latest (ts, event_id) per user over the same events
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "incremental upsert state must equal batch compaction")
  }

  test("mapGroupsWithState sessionizer matches batch sessionize counts") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_timestamp(col("ts")).cast("long") * 1000000L +
          expr("CAST(date_format(ts, 'SSSSSS') AS LONG)"))
      .toDF("user_id", "tsMicros").as[EventsStream.Ev]
    // run the stateful sessionizer in a batch context equivalent:
    // group-sorted iterator semantics hold because all data arrives at once
    val sessions = EventsStream.sessionize(evs).collect()
    val batch = graft.ops.Flow.sessionize(spark, sf).collect()
    assert(sessions.length == batch.length,
      s"stream ${sessions.length} vs batch ${batch.length}")
  }

  test("streaming parquet sink tracks progress via checkpoint (exactly-once files)") {
    import org.apache.spark.sql.streaming.Trigger
    val in = java.nio.file.Files.createTempDirectory("graft_sink_in")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_sink_cp").toString
    def runOnce(): Unit = {
      val q = EventsStream.readEvents(spark, in.toString)
        .select(col("event_id"), col("ts"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    val n = Tables.events(spark, sf).count()
    java.nio.file.Files.copy(src, in.resolve("a.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == n)
    // second batch: only the NEW file is processed on restart
    java.nio.file.Files.copy(src, in.resolve("b.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == 2 * n)
  }

  test("watermark drops late rows; windows finalize exactly once (Append)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_wm_in")
    val out = java.nio.file.Files.createTempDirectory("graft_wm_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_wm_cp").toString
    def stage(name: String, ts: Seq[String]): Unit =
      ts.map(Timestamp.valueOf).toDF("ts").coalesce(1)
        .write.parquet(s"$in/$name")
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("ts TIMESTAMP").parquet(s"$in/*")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w")).agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("n"))
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: watermark ends at 13:10-1h=12:10 → only the 10:00 window
    // (2 rows) finalizes.
    stage("a", Seq("2024-03-01 10:05:00", "2024-03-01 10:20:00",
      "2024-03-01 12:59:00", "2024-03-01 13:10:00"))
    runOnce()
    // run 2: 10:45 is LATE (behind the 12:10 watermark) and must be
    // dropped; 14:30 advances the watermark to 13:30, finalizing the
    // 12:00 window with n=1 — NOT 2.
    stage("b", Seq("2024-03-01 10:45:00", "2024-03-01 14:30:00"))
    runOnce()
    val got = spark.read.parquet(out)
      .select(date_format(col("ws"), "HH:mm").as("ws"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("10:00" -> 2L, "12:00" -> 1L), s"got $got")
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_ddww")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val deduped = EventsStream.readEvents(spark, dir.toString)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("ddww")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ddww").count()
    assert(got == Tables.events(spark, sf).count(), s"got $got")
  }

  test("stream-stream interval join matches the batch range join") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    def side(t: String, pfx: String) =
      EventsStream.readEvents(spark, dir.toString)
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${pfx}_id"), col("user_id").as(s"${pfx}_uid"),
          col("ts").as(s"${pfx}_ts"))
        .withWatermark(s"${pfx}_ts", "1 hour")
    // purchases attributed to clicks of the same user within 30 min —
    // both sides watermarked so state is bounded (the join evicts rows
    // older than watermark + interval).
    val joined = side("click", "c").join(side("purchase", "p"),
      expr("""c_uid = p_uid AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj").count()
    val e = Tables.events(spark, sf)
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
    val want = c.join(p, expr(
      "c_uid = p_uid AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"))
      .count()
    assert(got == want, s"stream $got vs batch $want")
    assert(want > 0)
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query and matching columns") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("dot_f32 is callable from spark.sql over registered views") {
    Catalog.registerFunctions(spark)
    Catalog.registerViews(spark, sf)
    val row = spark.sql(
      """SELECT vec_id, dot_f32(embedding, embedding) AS n2
         FROM graft_embeddings ORDER BY vec_id LIMIT 1""").collect()(0)
    assert(row.getDouble(1) > 0.0)
  }

  test("query registry has no cross-module name collisions") {
    import graft.ops._
    val perModule = Seq(Validate.queries, Relational.queries, Semi.queries,
      Config.queries, Acl.queries, Text.queries, Dedup.queries,
      Vector.queries, Multimodal.queries, Sinks.queries, Flow.queries,
      graft.streaming.EventsStream.queries, graft.plans.Plans.queries)
    assert(SparkEntry.queries.size == perModule.map(_.size).sum,
      "a module query name shadows another module's")
  }

  test("health probe reports live streaming queries with freshness") {
    // the scheduler/triggerer analogy (config/healthcheck.sh:20-41):
    // while a query is live the probe must carry a fresh per-query row
    // and count it in the summary; after stop() both disappear and the
    // summary returns to the oracle's constant (0, true) shape.
    val q = spark.readStream.format("rate").option("rowsPerSecond", "1")
      .load()
      .writeStream.format("memory").queryName("graft_health_live")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (q.lastProgress == null && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val rows = graft.ops.Semi.s12HealthProbe(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      val summary = rows.find(_._1 == "streaming").get
      assert(summary._2 >= 1L && summary._3,
        s"live query must be counted fresh: $summary")
      assert(rows.exists(r => r._1 == "streaming:query:graft_health_live" &&
        r._2 == 1L && r._3), s"missing live query row: ${rows.toSeq}")
    } finally q.stop()
    val after = graft.ops.Semi.s12HealthProbe(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(after.exists(r => r._1 == "streaming" && r._2 == 0L && r._3),
      s"stopped query must leave the constant summary: ${after.toSeq}")
  }

  test("StreamCow foldInto: a torn target (no _SUCCESS) is rebuilt, " +
      "not converged by file name") {
    import spark.implicits._
    import graft.streaming.StreamCow
    // r16 advice (medium): a crash mid-fold leaves a target dir with
    // some links and no _SUCCESS; on the auto-compaction path the
    // replayed micro-batch rewrites the overlay with fresh part-file
    // UUIDs, so name-keyed convergence would commit BOTH attempts'
    // files — duplicated rows. The fold must delete a torn target.
    val root = java.nio.file.Files.createTempDirectory("graft_torn").toString
    val baseDir = s"$root/base"
    val baseDf = (0L until 20L).map(k => (k, (k % 2).toInt, s"p$k"))
      .toDF("key", "cell", "payload")
    baseDf.write.partitionBy("cell").mode("overwrite").parquet(baseDir)
    val locator = spark.read.parquet(baseDir).select(col("key"), col("cell"))
    val spec = StreamCow.Spec("key", Seq("cell"), baseDir, s"$root/runs/a")
    StreamCow.stageFeed(spec, baseDf.filter(col("key") % 5 === 0)
      .select(col("key")))
    StreamCow.run(spark, spec, locator)
    // simulate the torn first attempt: a stale old-UUID link in a
    // touched cell of an UNcommitted v2
    val stale = new java.io.File(
      s"${spec.compactDir}/cell=0/part-stale-uuid.parquet")
    stale.getParentFile.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File(s"${spec.overlayDir}/cell=0").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath, stale.toPath)
    val v2 = StreamCow.compact(spark, spec, locator)
    assert(!stale.exists(),
      "torn-attempt file must be deleted, not committed alongside")
    val got = spark.read.parquet(v2).count()
    assert(got == 16L, s"fold must not double-count rows: $got")
  }

  test("StreamCow: a zero-survivor committed generation no-ops later " +
      "batches instead of throwing schema inference") {
    import spark.implicits._
    import graft.streaming.StreamCow
    // r16 advice: a generation holding only _SUCCESS (every row
    // retracted) made ss.read.parquet(curBase) throw
    // 'unable to infer schema' when a later batch still resolved
    // cells from the locator (duplicate retraction / re-staged feed).
    val root = java.nio.file.Files.createTempDirectory("graft_zsg").toString
    val baseDir = s"$root/base"
    val baseDf = (0L until 12L).map(k => (k, (k % 2).toInt, s"p$k"))
      .toDF("key", "cell", "payload")
    baseDf.write.partitionBy("cell").mode("overwrite").parquet(baseDir)
    val locator = spark.read.parquet(baseDir).select(col("key"), col("cell"))
    val spec = StreamCow.Spec("key", Seq("cell"), baseDir, s"$root/runs/a")
    // pre-commit an empty generation: the state a fully-retracted
    // fold leaves behind (foldInto links nothing, marker only)
    val gen = new java.io.File(spec.genDir(1))
    gen.mkdirs()
    java.nio.file.Files.createFile(
      new java.io.File(gen, "_SUCCESS").toPath)
    assert(StreamCow.currentBase(spec) == gen.getPath)
    // the feed retracts keys the locator still resolves — the
    // duplicate-retraction shape; this threw before the guard
    StreamCow.stageFeed(spec, baseDf.filter(col("key") % 2 === 0)
      .select(col("key")))
    StreamCow.run(spark, spec, locator)
    // live view stays empty: nothing to rewrite from an empty base
    val overlayHasRows =
      graft.Util.anyParquetPart(new java.io.File(spec.overlayDir)) &&
        spark.read.parquet(spec.overlayDir).count() > 0
    assert(!overlayHasRows,
      "no overlay rows may materialize from an empty generation")
  }

  test("StreamCow compact: row-for-row fold, vacuum, next batch reads v2 transparently") {
    import spark.implicits._
    import graft.streaming.StreamCow
    // synthetic cell-partitioned base: 40 keys over 4 cells, with a
    // payload column so row identity (not just counts) is pinned
    val root = java.nio.file.Files.createTempDirectory("graft_cow").toString
    val baseDir = s"$root/base"
    val baseDf = (0L until 40L).map(k => (k, (k % 4).toInt, s"p$k"))
      .toDF("key", "cell", "payload")
    baseDf.write.partitionBy("cell").mode("overwrite").parquet(baseDir)
    val locator = spark.read.parquet(baseDir).select(col("key"), col("cell"))
    // retract every cell-3 row (an EMPTIED cell) plus keys % 10 == 0.
    // Each spec root gets its own parent dir: stageFeed vacuums stale
    // sibling fingerprints, which must not see the base or each other.
    val spec = StreamCow.Spec("key", Seq("cell"), baseDir, s"$root/runs1/a")
    StreamCow.stageFeed(spec, baseDf
      .filter(col("cell") === 3 || col("key") % 10 === 0)
      .select(col("key")))
    StreamCow.run(spark, spec, locator)
    // pre-compact live view: untouched base cells ∪ overlay
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.select(col("key"), col("cell").cast("int"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
    val overlay = spark.read.parquet(spec.overlayDir)
    val touched = overlay.select(col("cell")).distinct()
      .collect().map(_.get(0).toString).toSet + "3" // emptied cell too
    val liveBefore = rows(spark.read.parquet(baseDir)
        .filter(!col("cell").cast("string").isInCollection(touched)))
      .union(rows(overlay))
    val v2 = StreamCow.compact(spark, spec, locator)
    assert(rows(spark.read.parquet(v2)) == liveBefore,
      "post-compact read must equal the pre-compact live view row-for-row")
    assert(!new java.io.File(s"$v2/cell=3").exists(),
      "a fully-retracted cell must have no directory in the compacted base")
    StreamCow.vacuum(spec)
    for (d <- Seq(spec.overlayDir, spec.logDir, spec.ckptDir, spec.feedDir))
      assert(!new java.io.File(d).exists(), s"superseded dir must be gone: $d")
    // the next stream batch reads the compacted base TRANSPARENTLY: a
    // fresh spec over v2 with a new takedown list starts from an empty
    // log and scrubs v2 exactly as it would the original base
    val spec2 = StreamCow.Spec("key", Seq("cell"), v2, s"$root/runs2/a")
    val locator2 = spark.read.parquet(v2).select(col("key"), col("cell"))
    StreamCow.stageFeed(spec2, spark.read.parquet(v2)
      .filter(col("key") % 10 === 1).select(col("key")))
    StreamCow.run(spark, spec2, locator2)
    val overlay2 = spark.read.parquet(spec2.overlayDir)
    val touched2 = overlay2.select(col("cell")).distinct()
      .collect().map(_.get(0).toString).toSet
    val liveAfter = rows(spark.read.parquet(v2)
        .filter(!col("cell").cast("string").isInCollection(touched2)))
      .union(rows(overlay2))
    val want = rows(baseDf.filter(col("cell") =!= 3 &&
      col("key") % 10 =!= 0 && col("key") % 10 =!= 1))
    assert(liveAfter == want,
      "post-compact stream batch must scrub v2 like any frozen base")
  }

  test("StreamCow auto-compaction: mid-stream generation roll invisible to readers") {
    import spark.implicits._
    import graft.streaming.StreamCow
    val root = java.nio.file.Files.createTempDirectory("graft_cow_auto")
      .toString
    val baseDir = s"$root/base"
    val baseDf = (0L until 40L).map(k => (k, (k % 4).toInt, s"p$k"))
      .toDF("key", "cell", "payload")
    baseDf.write.partitionBy("cell").mode("overwrite").parquet(baseDir)
    val locator = spark.read.parquet(baseDir).select(col("key"), col("cell"))
    // retract ALL of cell 3 (keys ≡ 3 mod 4, spread across the three
    // pmod-3 feed slices — the cell empties only AFTER a generation
    // roll, exercising the post-roll emptied-cell cleanup) plus
    // keys % 10 == 0; threshold 1 → the policy fires mid-stream
    val spec = StreamCow.Spec("key", Seq("cell"), baseDir, s"$root/runs/a",
      autoCompactLogRows = Some(1L))
    val retractKeys = baseDf
      .filter(col("cell") === 3 || col("key") % 10 === 0)
      .select(col("key"))
    StreamCow.stageFeed(spec, retractKeys)
    val over = StreamCow.run(spark, spec, locator)
    // the policy FIRED: the live base is a committed generation, the
    // original v1 base is untouched, and the log holds only the
    // post-roll batches (strictly fewer rows than the takedown list)
    val curBase = StreamCow.currentBase(spec)
    assert(curBase != baseDir, "auto-compaction must have rolled a generation")
    assert(new java.io.File(s"$curBase/_SUCCESS").exists())
    assert(spark.read.parquet(baseDir).count() == 40L,
      "v1 base files must survive the roll untouched")
    val nRetract = retractKeys.count()
    def logRows: Long =
      if (!graft.Util.anyParquetPart(new java.io.File(spec.logDir))) 0L
      else spark.read.parquet(spec.logDir).count()
    assert(logRows < nRetract,
      s"post-roll log must hold only post-roll batches ($logRows/$nRetract)")
    // reads are CONTINUOUS across the boundary: the standard
    // (base ∖ mask) ∪ (overlay ∩ mask) formula against currentBase —
    // mask = the log's touched cells — yields exactly the batch
    // retract semantics, row-for-row
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.select(col("key"), col("cell").cast("int"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
    def liveView(): Set[(Long, Int, String)] = {
      val cb = StreamCow.currentBase(spec)
      val covered =
        if (!graft.Util.anyParquetPart(new java.io.File(spec.logDir)))
          Set.empty[String]
        else locator
          .join(spark.read.parquet(spec.logDir).select(col("key")),
            Seq("key"))
          .select(col("cell")).distinct()
          .collect().map(_.get(0).toString).toSet
      val overRows =
        if (!graft.Util.anyParquetPart(new java.io.File(over)))
          Set.empty[(Long, Int, String)]
        else rows(spark.read.parquet(over)
          .filter(col("cell").cast("string")
            .isInCollection(covered + "-")))
      rows(spark.read.parquet(cb)
        .filter(!col("cell").cast("string").isInCollection(covered + "-")))
        .union(overRows)
    }
    val want = rows(baseDf.filter(col("cell") =!= 3 && col("key") % 10 =!= 0))
    assert(liveView() == want,
      "live view across the auto-compact boundary must equal batch semantics")
    // the emptied cell is GONE from every surface: the end-of-batch
    // roll folds it away (touched in the pre-fold base, no overlay
    // rewrite) — the post-roll resurrection hazard this test pins
    assert(!new java.io.File(s"$over/cell=3").exists(),
      "an emptied cell must have no overlay partition")
    assert(!new java.io.File(s"$curBase/cell=3").exists(),
      "an emptied cell must be folded out of the generation")
    // replay idempotence: a second run over the same checkpoint plans
    // zero micro-batches and leaves generations + live view unchanged
    val gensBefore = Option(new java.io.File(spec.root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.startsWith("gen"))
    StreamCow.run(spark, spec, locator)
    val gensAfter = Option(new java.io.File(spec.root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.startsWith("gen"))
    assert(gensAfter == gensBefore, "replay must not roll new generations")
    assert(liveView() == want, "replay must leave the live view unchanged")
  }

  test("StreamCow compact converges on retry after a crash mid-link") {
    import spark.implicits._
    import graft.streaming.StreamCow
    // regression for the r15 review finding: a session killed between
    // a partial link pass and the _SUCCESS commit must not abort every
    // retry on FileAlreadyExistsException
    val root = java.nio.file.Files.createTempDirectory("graft_cow_crash")
      .toString
    val baseDir = s"$root/base"
    val baseDf = (0L until 20L).map(k => (k, (k % 2).toInt, s"p$k"))
      .toDF("key", "cell", "payload")
    baseDf.write.partitionBy("cell").mode("overwrite").parquet(baseDir)
    val locator = spark.read.parquet(baseDir).select(col("key"), col("cell"))
    val spec = StreamCow.Spec("key", Seq("cell"), baseDir, s"$root/runs/a")
    StreamCow.stageFeed(spec, baseDf.filter(col("key") % 10 === 0)
      .select(col("key")))
    StreamCow.run(spark, spec, locator)
    // simulate the crash: a first compact() whose _SUCCESS we remove —
    // every data file is already linked, the commit marker is not
    StreamCow.compact(spark, spec, locator)
    assert(new java.io.File(s"${spec.compactDir}/_SUCCESS").delete())
    // the retry must converge (skip the existing links) and re-commit
    val v2 = StreamCow.compact(spark, spec, locator)
    assert(new java.io.File(s"$v2/_SUCCESS").exists(),
      "retry after a partial compact must re-commit")
    val got = spark.read.parquet(v2).count()
    assert(got == 18L, s"retried compact must hold the survivors, got $got")
    // zero-survivor edge (the 10× GenData rehearsal path): a base with
    // no cells at all still compacts to a committed, empty v2
    val emptyBase = s"$root/empty_base"
    new java.io.File(emptyBase).mkdirs()
    val spec0 = StreamCow.Spec("key", Seq("cell"), emptyBase,
      s"$root/runs0/a")
    val v20 = StreamCow.compact(spark, spec0, locator.limit(0))
    assert(new java.io.File(s"$v20/_SUCCESS").exists(),
      "an empty base must still commit an empty v2")
  }

  test("corpus_compact_run vacuums superseded dirs even after the v2 commit") {
    // regression for the r15 review finding: vacuum sat inside the
    // _SUCCESS guard, so a crash after the commit stranded the
    // overlay/log dirs forever and vacuum_ok read false on every
    // later run. Simulate the stranded state by re-creating the dirs
    // AFTER a completed run, then re-invoke the query.
    val first = graft.ops.Text.corpusCompactRun(spark, sf).collect()
    assert(first.nonEmpty && first.forall(r =>
        r.getBoolean(8) && r.getBoolean(11)),
      "guard: compact_ok and vacuum_ok must hold on the completed run")
    val tag = graft.Util.fileFingerprint(s"$sf/documents.parquet")
    val root =
      s"${graft.Util.sessionTmpDir(spark, "graft_corpus_compact")}/$tag"
    for (d <- Seq("overlay", "log"))
      assert(new java.io.File(s"$root/$d").mkdirs(),
        s"guard: could not simulate stranded $d")
    val again = graft.ops.Text.corpusCompactRun(spark, sf).collect()
    assert(again.forall(_.getBoolean(11)),
      "a stranded overlay/log must be vacuumed on the next run")
    assert(!new java.io.File(s"$root/overlay").exists() &&
      !new java.io.File(s"$root/log").exists(),
      "superseded dirs must be gone after the re-run")
  }
}
