package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions entry point: registers the graft custom
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(...)")`
  * and the DataFrame API share one codegen'd implementation.
  *
  * Wire up with either
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
object GraftChecks {
  /** Max k the bounded-heap aggregate accepts (16 bytes/entry per group per
    * task buffer — 1M entries ≈ 16 MB per group, the sane ceiling).
    */
  val MaxTopK = 1 << 20

  val noOversizedTopK: LogicalPlan => Unit = plan =>
    plan.foreach(_.expressions.foreach(_.foreach {
      case t: TopKAgg if t.k > MaxTopK =>
        throw new IllegalArgumentException(
          s"topk k=${t.k} exceeds the $MaxTopK cap; a bounded-heap this " +
            "large defeats the aggregate's purpose — use a window rank or " +
            "raise GraftChecks.MaxTopK deliberately")
      case _ => ()
    }))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def reg(ext: SparkSessionExtensions, name: String, usage: String,
      builder: FunctionBuilder): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  private def intArg(name: String, e: Expression): Int = e match {
    case IntegerLiteral(i) => i
    case _ => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $e")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    reg(ext, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float arrays.", {
        case Seq(a, b) => CosineSimilarity(a, b)
        case args => throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${args.length}")
      })
    reg(ext, "vec_dot",
      "vec_dot(a, b) - dot product of two float arrays.", {
        case Seq(a, b) => DotProduct(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_dot expects 2 arguments, got ${args.length}")
      })
    reg(ext, "vec_quantize",
      "vec_quantize(emb) - per-vector symmetric int8 quantization.", {
        case Seq(a) => VecQuantize(a)
        case args => throw new IllegalArgumentException(
          s"vec_quantize expects 1 argument, got ${args.length}")
      })
    reg(ext, "vec_dequantize",
      "vec_dequantize(q) - int8 struct back to a float array.", {
        case Seq(a) => VecDequantize(a)
        case args => throw new IllegalArgumentException(
          s"vec_dequantize expects 1 argument, got ${args.length}")
      })
    reg(ext, "word_shingles",
      "word_shingles(text, n) - word n-grams of the normalized text.", {
        case Seq(t, n) => WordShingles(t, intArg("word_shingles", n))
        case args => throw new IllegalArgumentException(
          s"word_shingles expects 2 arguments, got ${args.length}")
      })
    reg(ext, "word_shingle_hashes",
      "word_shingle_hashes(text, n) - distinct xxhash64 of each word n-gram.", {
        case Seq(t, n) => WordShingleHashes(t, intArg("word_shingle_hashes", n))
        case args => throw new IllegalArgumentException(
          s"word_shingle_hashes expects 2 arguments, got ${args.length}")
      })
    reg(ext, "minhash_sig",
      "minhash_sig(shingles, k) - k-long MinHash signature of a string array.", {
        case Seq(s, k) => MinHashSig(s, intArg("minhash_sig", k))
        case args => throw new IllegalArgumentException(
          s"minhash_sig expects 2 arguments, got ${args.length}")
      })
    reg(ext, "winnow",
      "winnow(text, n, w) - winnowed k-gram fingerprint sketch (MOSS).", {
        case Seq(t, n, w) => Winnow(t, intArg("winnow", n), intArg("winnow", w))
        case args => throw new IllegalArgumentException(
          s"winnow expects 3 arguments, got ${args.length}")
      })
    reg(ext, "simhash64",
      "simhash64(tokens) - 64-bit SimHash of a string array.", {
        case Seq(t) => SimHash64(t)
        case args => throw new IllegalArgumentException(
          s"simhash64 expects 1 argument, got ${args.length}")
      })
    reg(ext, "text_stats",
      "text_stats(text) - struct of all per-doc text signals in one pass.", {
        case Seq(t) => TextStats(t)
        case args => throw new IllegalArgumentException(
          s"text_stats expects 1 argument, got ${args.length}")
      })
    reg(ext, "sig_agreement",
      "sig_agreement(a, b) - fraction of agreeing positions of two long arrays.", {
        case Seq(a, b) => SigAgreement(a, b)
        case args => throw new IllegalArgumentException(
          s"sig_agreement expects 2 arguments, got ${args.length}")
      })
    reg(ext, "topk",
      "topk(score, id, k) - aggregate: k highest (score,id) pairs, sorted desc.", {
        case Seq(s, i, k) =>
          TopKAgg(s, i, intArg("topk", k)).toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"topk expects 3 arguments, got ${args.length}")
      })
    // Analysis-time guard: every group's topk buffer lives on the heap of
    // every task, so an absurd k is an executor OOM discovered mid-job.
    // Failing at analysis keeps the mistake interactive.
    ext.injectCheckRule(_ => GraftChecks.noOversizedTopK)
  }
}
