package graft

import org.apache.spark.sql.SparkSession

/** Component-timing probe behind OPTIMIZATION_r18.md: decomposes the
  * bench's heaviest query families into their stage artifacts and
  * times each stage separately (cold = first materialization of the
  * per-session artifact, warm = steady-state re-read), so optimization
  * effort lands on the stage that actually owns the wall-clock.
  *
  * NOT part of the query surface — a measurement utility main, like
  * [[Probe]] / [[RagScaleProbe]] / [[SkewProbe]].
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe <sfDir> [family ...]"
  *   families: rag graph ann corpus (default: all)
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fams = if (args.length > 1) args.tail.toSet
      else Set("rag", "graph", "ann", "corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[opt] $label%-36s $s%8.3f s  $rows%,d rows")
    }
    def t2(label: String)(body: => Long): Unit = {
      t(s"$label (cold)")(body); t(s"$label (warm)")(body)
    }

    // planning-vs-execution split: force analysis+optimization+physical
    // planning without running a job, then time the action separately
    def plan(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val frame = df
      val t0 = System.nanoTime()
      frame.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = frame.count()
      val tRun = (System.nanoTime() - t1) / 1e9
      println(f"[opt] $label%-36s plan $tPlan%7.3f s  run $tRun%7.3f s  $rows%,d rows")
    }

    if (fams("rag")) {
      println("== rag ==")
      t2("termFreqs")(ops.Text.termFreqs(spark, sfDir).count())
      plan("bm25Topk p/r")(ops.Text.bm25Topk(spark, sfDir))
      plan("bm25Topk p/r 2")(ops.Text.bm25Topk(spark, sfDir))
      plan("qlTopk p/r")(ops.Text.qlTopk(spark, sfDir))
      plan("ragFusionRrf p/r")(ops.Text.ragFusionRrf(spark, sfDir))
      plan("ragFusionRrf p/r 2")(ops.Text.ragFusionRrf(spark, sfDir))
      t2("bm25Topk")(ops.Text.bm25Topk(spark, sfDir).count())
      t2("qlTopk")(ops.Text.qlTopk(spark, sfDir).count())
      t2("denseTopk (brute)")(ops.Text.denseTopk(spark, sfDir).count())
      t2("denseIvfTopk")(ops.Text.denseIvfTopk(spark, sfDir).count())
      t2("rag_fusion_rrf (full)")(
        ops.Text.ragFusionRrf(spark, sfDir).count())
      t2("rag_context_pack (full)")(
        ops.Text.ragContextPack(spark, sfDir).count())
    }

    if (fams("graph")) {
      println("== graph ==")
      t2("graph_pagerank (full)")(
        ops.Relational.graphPagerank(spark, sfDir).count())
      t2("graph_triangles (full)")(
        ops.Relational.graphTriangles(spark, sfDir).count())
    }

    if (fams("ann")) {
      println("== ann serve ==")
      t("persistIndexDir (build)") {
        ops.Vector.persistIndexDir(spark, sfDir); 0L }
      t2("serveBatchTopk")(ops.Vector.serveBatchTopk(spark, sfDir).count())
      t2("serveBruteTopk")(ops.Vector.serveBruteTopk(spark, sfDir).count())
      t2("stream_ann_query (full)")(
        ops.Vector.streamAnnQuery(spark, sfDir).count())
      t2("stream_ann_query_pq (full)")(
        ops.Vector.streamAnnQueryPq(spark, sfDir).count())
    }

    if (fams("corpus")) {
      println("== corpus pipelines ==")
      t2("verdictArtifact")(ops.Text.verdictArtifact(spark, sfDir).count())
      t2("minhashLsh")(ops.Dedup.minhashLsh(spark, sfDir).count())
      t2("decontam")(ops.Text.decontam(spark, sfDir).count())
      t2("corpus_build_pipeline (full)")(
        ops.Text.corpusBuildPipeline(spark, sfDir).count())
      t2("corpus_append_pipeline (full)")(
        ops.Text.corpusAppendPipeline(spark, sfDir).count())
    }
    spark.stop()
  }
}
