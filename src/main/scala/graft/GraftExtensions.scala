package graft

import graft.functions.{CosineSimilarity, DamerauLevenshteinExpr, DotProduct, HashEmbed, JaroWinklerExpr, L2Normalize, MinHashSignature, QuantizeInt8, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works like any built-in
  * (SURVEY.md §2.9). Two entry points, same registry:
  *
  *  - config `spark.sql.extensions=graft.GraftExtensions` (cluster-wide);
  *  - `GraftExtensions.register(spark)` on a live session (library use).
  *
  * All functions are codegen'd Catalyst expressions (VectorFunctions /
  * Fingerprints), not UDFs — they stay inside whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // whole-operator tier: custom logical nodes lower through these
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    // constant-fold before rejecting (ADVICE r15): SQL like `k = -1`
    // arrives as UnaryMinus(Literal(1)), and `2 + 1` as Add — both
    // resolved foldable INT trees, which the kernel handles fine
    case other if other.resolved && other.foldable &&
        other.dataType == org.apache.spark.sql.types.IntegerType =>
      other.eval() match {
        case i: Int => i
        case _ => throw new IllegalArgumentException(
          s"$what must be a non-NULL constant integer, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be a constant integer (a literal or an expression " +
        s"foldable to INT at plan time), got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    Seq(
      (FunctionIdentifier("cosine_similarity"),
        info("cosine_similarity",
          "cosine_similarity(a, b) - cosine of two ARRAY<DOUBLE> vectors"),
        (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
      (FunctionIdentifier("vector_dot"),
        info("vector_dot",
          "vector_dot(a, b) - dot product of two ARRAY<DOUBLE> vectors"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))),
      (FunctionIdentifier("hash_embed"),
        info("hash_embed",
          "hash_embed(text, dim) - deterministic unit-norm feature-hash embedding"),
        (args: Seq[Expression]) =>
          HashEmbed(args(0), litInt(args(1), "hash_embed dim"))),
      (FunctionIdentifier("simhash64"),
        info("simhash64",
          "simhash64(tokens) - 64-bit SimHash of an ARRAY<STRING> token column"),
        (args: Seq[Expression]) => SimHash64(args(0))),
      (FunctionIdentifier("minhash_signature"),
        info("minhash_signature",
          "minhash_signature(shingles, k) - k-hash MinHash signature"),
        (args: Seq[Expression]) =>
          MinHashSignature(args(0), litInt(args(1), "minhash_signature k"))),
      (FunctionIdentifier("l2_normalize"),
        info("l2_normalize",
          "l2_normalize(v) - unit-normalize an ARRAY<DOUBLE> vector"),
        (args: Seq[Expression]) => L2Normalize(args(0))),
      (FunctionIdentifier("quantize_int8"),
        info("quantize_int8",
          "quantize_int8(v) - symmetric int8 quantization (scale = max|x|/127)"),
        (args: Seq[Expression]) => QuantizeInt8(args(0))),
      (FunctionIdentifier("damerau_levenshtein"),
        info("damerau_levenshtein",
          "damerau_levenshtein(a, b) - full Damerau-Levenshtein edit " +
            "distance (UTF-8 byte grain, DuckDB-compatible)"),
        (args: Seq[Expression]) =>
          DamerauLevenshteinExpr(args(0), args(1))),
      (FunctionIdentifier("damerau_levenshtein_at_most"),
        info("damerau_levenshtein_at_most",
          "damerau_levenshtein_at_most(a, b, k) - TRUE iff " +
            "damerau_levenshtein(a, b) <= k, via the banded O(|a|*(2k+1)) " +
            "kernel (exact verdict; the join-predicate form)"),
        (args: Seq[Expression]) =>
          graft.functions.DamerauLevenshteinAtMostExpr(args(0), args(1),
            litInt(args(2), "damerau_levenshtein_at_most k"))),
      (FunctionIdentifier("jaro_winkler"),
        info("jaro_winkler",
          "jaro_winkler(a, b) - Jaro-Winkler similarity (UTF-8 byte " +
            "grain, boost >0.7, prefix cap 4; DuckDB-compatible)"),
        (args: Seq[Expression]) => JaroWinklerExpr(args(0), args(1))),
      (FunctionIdentifier("dhash64"),
        info("dhash64",
          "dhash64(bytes) - 64-bit perceptual difference hash of an " +
            "image BINARY column (NULL when undecodable)"),
        (args: Seq[Expression]) => graft.functions.DHash64Expr(args(0))),
      (FunctionIdentifier("audio_fingerprint64"),
        info("audio_fingerprint64",
          "audio_fingerprint64(bytes) - 64-bit energy-contour " +
            "fingerprint of a WAV BINARY column, amplitude-invariant " +
            "(NULL when undecodable or shorter than 65 samples)"),
        (args: Seq[Expression]) =>
          graft.functions.AudioFingerprintExpr(args(0))))

  /** Register on an already-running session (idempotent): SQL functions
    * into the registry, planner strategies into
    * `experimental.extraStrategies`. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}
