package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text sketches for the scale extensions (SURVEY.md §7.1-8):
  * feature-hash embeddings (the offline stand-in for the reference's OpenAI
  * ada-002 call, qdrant_text_loader.py:58-64), SimHash and MinHash signatures
  * for near-duplicate detection, and word shingles.
  *
  * Hashing is splitmix64-style finalization — stable across JVMs and
  * partitions, so signatures computed on different executors agree (a
  * requirement for LSH bucketing at 100 TB: bucket keys must be
  * machine-independent).
  */
object Hashing {
  /** 64-bit avalanche (splitmix64 finalizer). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit string hash: FNV-1a over UTF-8 bytes + avalanche. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def hash64(s: String, seed: Long): Long =
    hash64(UTF8String.fromString(s), seed)

  val MinHashSeedStep = 0x9e3779b97f4a7c15L
  val SimHashSeed = 0x5deece66dL
  val EmbedSeed = 0x9e3779b97f4a7c15L

  /** MinHash signature of a shingle set: base hash per shingle, k cheap
    * seeded remixes, elementwise min. Order-independent; and
    * minhash(A ∪ B) == elementwise-min(minhash(A), minhash(B)) — the
    * mergeability LSH banding relies on (property-tested). */
  def minhash(shingles: IterableOnce[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    shingles.iterator.foreach { s =>
      val base = hash64(s, 0L)
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (MinHashSeedStep * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    sig
  }

  /** 64-bit SimHash of a token sequence: per-token hash, bitwise ±1 vote,
    * sign → bit. Multiset-order-independent. */
  def simhash(tokens: IterableOnce[String]): Long = {
    val votes = new Array[Int](64)
    tokens.iterator.foreach { tok =>
      val h = hash64(tok, SimHashSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Feature-hash embedding: lowercase whitespace tokens → signed bucket
    * contributions → L2 normalize (all-zero stays all-zero). */
  def hashEmbedVec(text: String, dim: Int): Array[Double] = {
    val vec = new Array[Double](dim)
    text.toLowerCase.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val h = hash64(tok, EmbedSeed)
        val bucket = java.lang.Math.floorMod(h >>> 1, dim.toLong).toInt
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        vec(bucket) += sign
      }
    }
    var norm2 = 0.0
    var i = 0
    while (i < dim) { norm2 += vec(i) * vec(i); i += 1 }
    if (norm2 > 0) {
      val inv = 1.0 / math.sqrt(norm2)
      i = 0
      while (i < dim) { vec(i) *= inv; i += 1 }
    }
    vec
  }
}

/** Feature-hash a text into a `dim`-dimensional unit-norm ARRAY<DOUBLE>:
  * whitespace tokens → signed bucket contributions → L2 normalize.
  * Deterministic stand-in for T15 (the reference's per-question embedding
  * call); 100% CPU-local, no network, trivially data-parallel. */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, "embedding dim must be positive")
  override def prettyName: String = "hash_embed"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Hashing.hashEmbedVec(input.asInstanceOf[UTF8String].toString, dim))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash over an ARRAY<STRING> token column: per-token 64-bit hash,
  * bitwise +1/-1 vote, sign → bit. Near-dup docs differ in few bits →
  * compare with `bit_count(a ^ b) <= maxHamming`. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val toks = (0 until arr.numElements())
      .iterator.filterNot(arr.isNullAt).map(arr.getUTF8String(_).toString)
    java.lang.Long.valueOf(Hashing.simhash(toks))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature (k independent hash functions via seeded remix) over an
  * ARRAY<STRING> shingle column → ARRAY<BIGINT> length k. Jaccard(A,B) ≈
  * fraction of agreeing signature slots; LSH bands the signature for
  * sub-quadratic candidate generation. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, "signature length must be positive")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val shs = (0 until arr.numElements())
      .iterator.filterNot(arr.isNullAt).map(arr.getUTF8String(_).toString)
    new GenericArrayData(Hashing.minhash(shs, k))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Fingerprints {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def hashEmbed(text: Column, dim: Int): Column =
    column(HashEmbed(expression(text), dim))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def minhashSignature(shingles: Column, k: Int): Column =
    column(MinHashSignature(expression(shingles), k))

  /** Word-level n-gram shingles from a token array — pure built-ins
    * (sequence + transform + slice), fully codegen'd. Returns the empty array
    * when the doc has fewer than n tokens. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace tokenizer shared by the dedup/text-analysis ops. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Exact-dup fingerprint: md5 of the raw text (also computable by the
    * DuckDB oracle, so it is end-to-end verifiable). */
  def md5Fingerprint(text: Column): Column = md5(text)

  /** Rolling/winnowing-style fingerprint: min 64-bit hash over character
    * 8-gram shingles — cheap doc identity robust to small edits. */
  def rollingFingerprint(text: Column, gram: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (gram - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(gram)))))
}
