package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeExpr, BpeRuntime, BpeVocab}
import org.apache.spark.unsafe.types.UTF8String

/** Pins the committed-vocab greedy longest-match tokenizer: hand-walked
  * token counts, the fallback/space contract, eval↔codegen parity, and
  * the zero-shuffle plan shape of the counting query. */
class BpeSpec extends SparkSuite {
  private def cnt(s: String): Long = BpeRuntime.count(UTF8String.fromString(s))

  test("greedy longest-match: hand-walked corpus words") {
    // whole-word pieces
    assert(cnt("table") == 1L && cnt("value") == 1L && cnt("join") == 1L)
    // two-piece merges (custom|er, col|umn, str|eam, wind|ow, ba|tch)
    assert(cnt("customer") == 2L)
    assert(cnt("column") == 2L)
    assert(cnt("stream") == 2L)
    assert(cnt("window") == 2L)
    assert(cnt("batch") == 2L)
    // piece + single-char fallback (spar|k)
    assert(cnt("spark") == 2L)
    // longest-match must win over a shorter prefix piece: "str" ∈ vocab
    // beats "st", so "stream" is str|eam (2), never st|re|am (3)
    assert(cnt("stream") == 2L)
  }

  test("fallback, spaces, and edge cases") {
    assert(cnt("") == 0L)
    assert(cnt("   ") == 0L)
    assert(cnt("a") == 1L)            // bare fallback char
    assert(cnt("zzz") == 3L)          // no piece: one token per char
    assert(cnt("table value") == 2L)  // space delimits, costs nothing
    assert(cnt("  table  ") == 1L)
    assert(cnt("x9!") == 3L)          // non-letters fall back per char
    assert(cnt("café") == 4L)    // non-ASCII char: 1-token fallback (c|a|f|é)
  }

  test("greedy longest-match equals a reference re-implementation on corpus text") {
    // independent oracle: per-position scan probing substring lengths
    // maxLen..2 against the piece set (the DuckDB CASE, in Scala)
    val set = BpeVocab.pieces.toSet
    def ref(text: String): Long = {
      var i = 0; var n = 0L
      while (i < text.length) {
        if (text.charAt(i) == ' ') i += 1
        else {
          var adv = 1
          var l = math.min(BpeVocab.maxLen, text.length - i)
          while (l >= 2 && adv == 1) {
            if (set.contains(text.substring(i, i + l))) adv = l
            l -= 1
          }
          n += 1; i += adv
        }
      }
      n
    }
    val texts = Tables.documents(spark, sf).select(lower(col("text")))
      .limit(50).collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach(t => assert(cnt(t) == ref(t), s"mismatch on: ${t.take(60)}"))
  }

  test("BpeCount eval and codegen agree; query plan is a zero-shuffle map") {
    val df = Tables.documents(spark, sf)
      .select(BpeExpr.bpe_count(lower(col("text"))).as("n"))
    // codegen path (normal execution) vs interpreted eval (nullSafeEval
    // via a non-codegen context: collect through an RDD row map)
    val viaCodegen = df.agg(sum(col("n"))).collect()(0).getLong(0)
    val viaEval = Tables.documents(spark, sf).select(lower(col("text")))
      .collect().map(r => BpeRuntime.count(
        UTF8String.fromString(r.getString(0)))).sum
    assert(viaCodegen == viaEval)
    // the counting query shuffles nothing before its final sort
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

  test("t_token_bpe exposes the ws-vs-bpe divergence the budgets need") {
    val rows = ops.Text.tokenBpe(spark, sf)
      .agg(avg(col("ratio_e4"))).collect()
    val mean = rows(0).getDouble(0)
    assert(mean > 13000 && mean < 20000,
      s"mean bpe/ws ratio $mean outside the realistic 1.3-2.0x band")
  }
}
