package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions in the SQL function registry so they are usable from
  * `spark.sql(...)` as well as the Column API. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * SQL surface:
  *   minhash_signature(text, n, k, seed) → array<bigint>
  *   shingle_hashes(text, n)             → array<bigint> (distinct, sorted)
  *   token_shingle_hashes(text, n)       → array<bigint> (distinct, sorted)
  *   shingle_hash_counts(text, n)        → array<struct<h:bigint,c:int>>
  *   cdc_cuts(text, window, modulus)     → array<int> (cut positions + len)
  *   simhash64(text)                     → bigint
  *   vector_dot(a, b) / vector_cosine(a, b) → double
  *   unicode_normalize(text[, form])     → string (form: NFC/NFD/NFKC/NFKD)
  *   compression_ratio(text)             → double (deflate bytes / raw bytes)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def strArg(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)  => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ReplaceSizeOfCollectList)

    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "one-pass MinHash signature over char n-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n, k, seed) =>
          MinHashSignature(text, intArg(n, "n"), intArg(k, "k"), longArg(seed, "seed"))
        case Seq(text, n, k) =>
          MinHashSignature(text, intArg(n, "n"), intArg(k, "k"), 42L)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(text, n, k[, seed])")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "distinct xxhash64 set of char n-gram shingles, one pass"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShingleHashes(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text, n)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("token_shingle_hashes"),
      info("token_shingle_hashes", "distinct xxhash64 set of word n-gram shingles, one pass"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => TokenShingleHashes(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("token_shingle_hashes(text, n)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("shingle_hash_counts"),
      info("shingle_hash_counts", "(xxhash64, count) per distinct char n-gram, one pass"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShingleHashCounts(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("shingle_hash_counts(text, n)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("cdc_cuts"),
      info("cdc_cuts", "content-defined-chunking cut positions (rolling polynomial hash)"),
      (args: Seq[Expression]) => args match {
        case Seq(text, w, m) => CdcCuts(text, intArg(w, "window"), intArg(m, "modulus"))
        case _ => throw new IllegalArgumentException("cdc_cuts(text, window, modulus)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "one-pass 64-bit SimHash over whitespace tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => SimHash64(text)
        case _ => throw new IllegalArgumentException("simhash64(text)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "fused dot product of two float/double arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VectorSimilarity(a, b, "dot")
        case _ => throw new IllegalArgumentException("vector_dot(a, b)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "fused cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VectorSimilarity(a, b, "cosine")
        case _ => throw new IllegalArgumentException("vector_cosine(a, b)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "NFC/NFD/NFKC/NFKD normalization of a string"),
      (args: Seq[Expression]) => args match {
        case Seq(text, form) => UnicodeNormalize(text, strArg(form, "form"))
        case Seq(text)       => UnicodeNormalize(text, "NFC")
        case _ => throw new IllegalArgumentException("unicode_normalize(text[, form])")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    e.injectFunction((FunctionIdentifier("compression_ratio"),
      info("compression_ratio", "deflate ratio of a string's UTF-8 bytes (repetitiveness signal)"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => CompressionRatio(text)
        case _ => throw new IllegalArgumentException("compression_ratio(text)")
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
