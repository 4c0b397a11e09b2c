package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeExpr, BpeRuntime, BpeVocab}
import org.apache.spark.unsafe.types.UTF8String

/** Pins the merge-learned vocab greedy longest-match tokenizer: vocab
  * size/shape realism, the committed-fixture == learned-pieces
  * contract the DuckDB oracle rides on, agreement with an independent
  * reference re-implementation, eval↔codegen parity, the zero-shuffle
  * plan shape, and the r12 size-robustness pins (CSR trie memory,
  * byte-walk throughput). */
class BpeSpec extends SparkSuite {
  private def cnt(s: String): Long = BpeRuntime.count(UTF8String.fromString(s))

  // the spec's own greedy longest-match oracle: per-BYTE-position
  // substring probe against the raw byte-piece set — the DuckDB join
  // (byte == code-point positions on its ASCII slice), in Scala.
  // ISO-8859-1 decode is the byte-per-char embedding piecesRaw uses.
  private val pieceSet = BpeVocab.piecesRaw.toSet
  private def ref(text: String): Long = {
    val bs = text.getBytes("UTF-8")
    var i = 0; var n = 0L
    while (i < bs.length) {
      if (bs(i) == ' ') i += 1
      else {
        var adv = 1
        var l = math.min(BpeVocab.maxLen, bs.length - i)
        while (l >= 2 && adv == 1) {
          if (pieceSet.contains(new String(bs, i, l, "ISO-8859-1"))) adv = l
          l -= 1
        }
        n += 1; i += adv
      }
    }
    n
  }

  test("vocab is realistic-size, merge-derived, and structurally sound") {
    assert(BpeVocab.piecesRaw.size >= 2000,
      s"vocab must be thousands of pieces, got ${BpeVocab.piecesRaw.size}")
    assert(BpeVocab.maxLen >= 8 && BpeVocab.maxLen <= 20)
    // BPE's hallmark: the highest-weight suffixes and function words
    // fuse into pieces
    Seq("ing", "ed", "er", "the", "and").foreach(p =>
      assert(pieceSet.contains(p), s"expected learned piece '$p'"))
    // mid-frequency structure survives: not everything is whole-word
    assert(BpeVocab.piecesRaw.count(_.length == 2) >= 50)
    // byte-level slice: a real share of the budget went to multi-byte
    // merges (whole characters through whole words)
    assert(BpeVocab.piecesRaw.count(_.exists(_ >= 0x80)) >= 20,
      "expected learned multi-byte byte-sequence pieces")
  }

  test("committed fixture equals the learned pieces (oracle contract)") {
    // Read the COMMITTED bytes before any ensureFixture() call from this
    // suite can repair them — calling it first would make the assert a
    // tautology (r12 ADVICE). Residual hazard: another suite in the same
    // sbt-test JVM may have run a BPE query (which self-heals the file)
    // before this test; a standalone `testOnly graft.BpeSpec` from a
    // fresh checkout exercises the committed artifact itself.
    val f = java.nio.file.Paths.get(BpeVocab.fixturePath)
    assert(java.nio.file.Files.isRegularFile(f),
      "fixtures/bpe_vocab.txt is not committed")
    val onDisk = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .split("\n").filter(_.nonEmpty).toVector
    assert(onDisk == BpeVocab.pieces.sorted,
      "fixtures/bpe_vocab.txt drifted from BpeVocab.pieces")
  }

  test("greedy longest-match: corpus words, fallback, spaces, edge cases") {
    assert(cnt("") == 0L)
    assert(cnt("   ") == 0L)
    assert(cnt("a") == 1L)              // bare fallback char
    assert(cnt("table value") == ref("table value"))
    assert(cnt("  table  ") == ref("table"))
    assert(cnt("x9!") == ref("x9!"))    // non-letters fall back per cp
    // common words fuse whole; mid-frequency domain words split — the
    // honest ws-vs-bpe divergence at a small-vocab budget
    assert(cnt("the") == 1L && cnt("table") == 1L && cnt("window") == 1L)
    assert(cnt("customer") > 1L, "a ~2.5k vocab splits mid-freq words")
    // longest-match must win over a shorter prefix piece: probe with a
    // real (piece, extension-piece) pair from the learned vocab
    val ext = BpeVocab.piecesRaw.find(p =>
      p.length >= 3 && p.forall(_ < 0x80) && pieceSet.contains(p.take(2))).get
    assert(cnt(ext) == 1L, s"longest match must take '$ext' whole")
  }

  test("byte-level multi-byte pieces: learned fusions and byte fallback") {
    def rawOf(s: String) = new String(s.getBytes("UTF-8"), "ISO-8859-1")
    // learned whole-character and whole-word byte pieces count 1 token
    Seq("é", "の", "日本", "—", "’").foreach { w =>
      assert(pieceSet.contains(rawOf(w)), s"expected byte piece for '$w'")
      assert(cnt(w) == 1L, s"'$w' must count as one learned piece")
    }
    // the walk equals the byte-level reference on mixed text
    Seq("café au lait", "データの中国", "a—b ‘x’", "naïve café").foreach(t =>
      assert(cnt(t) == ref(t), s"mismatch on: $t"))
    // unseen scripts decompose to UTF-8 BYTES (the GPT-2 byte
    // fallback): no piece covers them, so bytes are the budget
    assert(cnt("𝄞") == 4L)              // U+1D11E, 4 bytes, unseeded
    assert(cnt("Ж") == 2L)              // U+0416, 2 bytes, unseeded
  }

  test("greedy longest-match equals the reference re-implementation on corpus text") {
    val texts = Tables.documents(spark, sf).select(lower(col("text")))
      .limit(50).collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach(t => assert(cnt(t) == ref(t), s"mismatch on: ${t.take(60)}"))
  }

  test("BpeCount eval and codegen agree; query plan is a zero-shuffle map") {
    val df = Tables.documents(spark, sf)
      .select(BpeExpr.bpe_count(lower(col("text"))).as("n"))
    val viaCodegen = df.agg(sum(col("n"))).collect()(0).getLong(0)
    val viaEval = Tables.documents(spark, sf).select(lower(col("text")))
      .collect().map(r => BpeRuntime.count(
        UTF8String.fromString(r.getString(0)))).sum
    assert(viaCodegen == viaEval)
    Util.withConf(spark, "spark.sql.adaptive.enabled", "false") {
      val plan = ops.Text.tokenBpe(spark, sf).queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // one exchange allowed: the deterministic ORDER BY for the oracle
      assert(shuffles.size <= 1, s"unexpected shuffles:\n$plan")
      val codegenSpans = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(codegenSpans.nonEmpty, "bpe_count fell out of whole-stage codegen")
    }
  }

  test("size-robustness pins: CSR trie memory and byte-walk throughput") {
    // O(edges) memory: a ~2.5k-piece vocab must stay in the tens of KB
    // (the r11 dense nodes x 91 layout would be megabytes here)
    assert(BpeRuntime.trieBytes < 512 * 1024,
      s"trie ballooned to ${BpeRuntime.trieBytes} bytes")
    // Linearity pin instead of a wall-clock floor (r12 ADVICE: absolute
    // MB/s asserts flake under host load). Time the walk at 1x and 8x
    // input inside one test: a linear walk scales ~8x, an accidental
    // O(n^2) ~64x — the ratio is load-resistant because both arms see
    // the same box. Absolute throughput is reported advisory-only.
    val unit = "the customer table joined a stream window " * 3000
    def timeCount(t: UTF8String, reps: Int): (Long, Long) = {
      var i = 0; var s = 0L
      val t0 = System.nanoTime()
      while (i < reps) { s += BpeRuntime.count(t); i += 1 }
      (System.nanoTime() - t0, s)
    }
    val small = UTF8String.fromString(unit)
    val big = UTF8String.fromString(unit * 8)
    timeCount(big, 2) // JIT warmup on the larger arm
    // best-of-3 per arm: min discards GC/scheduler spikes
    val (tSmall, sSmall) = (1 to 3).map(_ => timeCount(small, 16)).minBy(_._1)
    val (tBig, sBig) = (1 to 3).map(_ => timeCount(big, 2)).minBy(_._1)
    // equal total bytes per arm and the unit ends in whitespace, so the
    // two sums must agree exactly (counts are additive over the repeat)
    assert(sSmall > 0 && sBig == sSmall,
      s"count not additive over concatenation: $sSmall vs $sBig")
    val ratio = tBig.toDouble / tSmall.toDouble // equal bytes/arm -> ~1.0
    assert(ratio < 6.0,
      f"byte walk no longer linear: 8x-input/equal-bytes ratio $ratio%.2f")
    val mbps = 16.0 * small.numBytes / (tSmall / 1e9) / 1e6
    info(f"advisory byte-walk throughput: $mbps%.1f MB/s")
  }

  test("t_token_bpe exposes the ws-vs-bpe divergence the budgets need") {
    val rows = ops.Text.tokenBpe(spark, sf)
      .agg(avg(col("ratio_e4"))).collect()
    val mean = rows(0).getDouble(0)
    // measured ~1.39x on the documents corpus at the 2.5k-piece
    // budget: mid-frequency domain words split 2-4x, common words
    // don't — the real small-vocab band
    assert(mean > 11000 && mean < 20000,
      s"mean bpe/ws ratio $mean outside the realistic 1.1-2.0x band")
  }

  test("t_bpe_train: merge table is a valid BPE trajectory") {
    val rows = graft.ops.Text.tBpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to graft.ops.Text.BpeTrainMerges),
      "ranks must be contiguous from 1")
    assert(rows.map(_._4).distinct.length == rows.length,
      "merged pieces must be distinct")
    // every merge's sides come from the current symbol alphabet:
    // single BYTES (two hex digits) or earlier merge products
    rows.zipWithIndex.foreach { case ((_, a, b, m, w), i) =>
      val earlier = rows.take(i).map(_._4).toSet
      assert(m == a + b, s"merged must be lhs+rhs at rank ${i + 1}")
      assert((a + b).forall(c => c.isDigit || (c >= 'a' && c <= 'f')),
        s"symbols must stay in the closed hex alphabet: '$a'+'$b'")
      assert(a.length == 2 || earlier(a),
        s"lhs '$a' at rank ${i + 1} is neither a byte nor an earlier merge")
      assert(b.length == 2 || earlier(b),
        s"rhs '$b' at rank ${i + 1} is neither a byte nor an earlier merge")
      assert(w > 0)
    }
  }

  test("t_bpe_train is byte-level: accented/CJK corpus trains green and " +
      "the merge table round-trips through the oracle-replay semantics") {
    import spark.implicits._
    // a corpus the r17 a-z trainer REJECTED outright: accented latin,
    // CJK, quotes and backslashes, with enough repetition for 16 merges
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_ml")
      .toString
    val phrases = Seq(
      "café au lait café au lait 中文分词 中文分词 naïve café",
      "über señor café 中文分词 naïve über señor 中文分词",
      "the \"quoted\" word and back\\slash the \"quoted\" café",
      "中文分词 café au lait über naïve señor the 中文分词",
      "café café café 中文分词 中文分词 naïve naïve über über")
    (0 until 40).map(i => (i.toLong, phrases(i % phrases.length),
        "xx", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = graft.ops.Text.tBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.length == graft.ops.Text.BpeTrainMerges)
    // ---- reference replay of the oracle's per-round semantics ----
    def prep(w: String): String = " " + w.getBytes("UTF-8")
      .map(b => f"${b & 0xff}%02x").mkString(" ") + " "
    def hexToBytes(h: String): Seq[Int] =
      h.grouped(2).map(Integer.parseInt(_, 16)).toSeq
    val counts = phrases.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w, ws.size.toLong * (40 / phrases.length))
      }.toSeq
    var table = counts.map { case (w, c) => (w, prep(w), c) }
    merges.foreach { case (rank, a, b, m, w) =>
      // (1) the learned pair IS the round's argmax by (weight DESC,
      //     lhs ASC, rhs ASC) over positional adjacent pairs — what
      //     the oracle's b<k> stage computes
      val pairW = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (_, s, c) =>
        s.trim.split(" ").toSeq.sliding(2).foreach {
          case Seq(x, y) => pairW((x, y)) = pairW.getOrElse((x, y), 0L) + c
          case _ =>
        }
      }
      val best = pairW.toSeq.minBy { case ((x, y), pw) => (-pw, x, y) }
      assert(best._1 == ((a, b)) && best._2 == w,
        s"rank $rank: learned ($a,$b,$w) != replayed $best")
      // (2) apply the merge exactly as both engines do: single-pass
      //     leftmost non-overlapping delimited replace
      table = table.map { case (word, s, c) =>
        (word, s.replace(s" $a $b ", s" $m "), c)
      }
      // (3) LOSSLESS at every round: each state's symbols decode back
      //     to the word's exact UTF-8 bytes
      table.foreach { case (word, s, _) =>
        val decoded = s.trim.split(" ").toSeq.flatMap(hexToBytes)
        assert(decoded == word.getBytes("UTF-8").toSeq.map(_ & 0xff),
          s"round $rank corrupted '$word': $s")
      }
    }
    // the trainer really fused multi-byte text: some merge spans a
    // multi-byte UTF-8 sequence (a non-ASCII lead byte 0xc0-0xf4)
    assert(merges.exists { case (_, _, _, m, _) =>
      hexToBytes(m).exists(b => b >= 0xc0) },
      s"no merge crossed a multi-byte char: ${merges.map(_._4).toSeq}")
  }

  test("t_bpe_fertility_gain: corpus-trained vocab beats the fixture " +
      "on every source") {
    val rows = graft.ops.Text.tBpeFertilityGain(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("improved"),
        s"${r.getString(0)}: learned vocab must not be worse")
      assert(r.getAs[Long]("gain_e4") > 0L,
        s"${r.getString(0)}: expected a strictly positive gain")
    }
  }

  test("BpeCountIn with the fixture pieces equals the static BpeCount " +
      "(trie parameterization is faithful)") {
    import org.apache.spark.sql.functions._
    val trie = new graft.functions.BpeTrie(graft.functions.BpeVocab.piecesRaw)
    val diff = graft.Tables.documents(spark, sf)
      .select(
        graft.functions.BpeExpr.bpe_count(lower(col("text"))).as("a"),
        graft.functions.BpeExpr.bpe_count_in(trie, lower(col("text")))
          .as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L, s"$diff rows disagree between static and " +
      "instance tries")
  }
}
