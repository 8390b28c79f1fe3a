package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (dedup,
  * language-ID, quality scoring, fingerprinting). All pure Column
  * expressions over `functions._` higher-order array ops — codegen'd,
  * fully distributed, and reproducible in the DuckDB oracle dialect.
  */
object Text {

  /** Whitespace word tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Distinct k-word shingles, joined with single spaces.
    * k=3 gives a sparse space even over a small vocabulary, which is what
    * separates planted near-duplicates from random overlap. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    // Guard: sequence(0, n) with n<0 would produce a DESCENDING sequence
    // (not empty) — short docs must yield an empty shingle set.
    when(size(toks) >= k,
      array_distinct(
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
    .otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Deterministic 60-bit hash of a string, seeded: first 15 hex digits of
    * md5(seed:s) as a non-negative bigint. Chosen because the identical
    * value is computable in DuckDB (`cast('0x'||substr(md5(..),1,15) as
    * bigint)`), giving hash-level oracle parity for MinHash/SimHash. */
  def hash60(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), s)), 1, 15), 16, 10)
      .cast("bigint")

  /** Modulus for the MinHash affine rehash family (2^30). */
  val MinhashMod: Long = 1073741824L

  /** Affine rehash constants (Carter–Wegman style universal family):
    * odd multiplier + offset per permutation, derived from fixed mixing
    * constants so both engines embed the identical literals. */
  def minhashA(j: Int): Long = ((2654435761L * (j + 1)) % MinhashMod) | 1L
  def minhashB(j: Int): Long = (1779033703L * (j + 1)) % MinhashMod

  /** 30-bit base hash array for MinHash: ONE md5 per shingle. Materialize
    * this as its own column before calling [[minhashSigFromBase]], so the
    * digest pass isn't inlined once per permutation. */
  def minhashBase(shingleArr: Column): Column =
    transform(shingleArr, s => pmod(hash60(s, 0), lit(MinhashMod)))

  /** MinHash signature from a base-hash array: each permutation is a
    * cheap affine transform mod 2^30 (odd multiplier → a permutation of
    * the low bits) — k× fewer digests than hashing per-seed, in Spark AND
    * in the SQL oracle. */
  def minhashSigFromBase(baseArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(baseArr, h =>
        pmod(h * lit(minhashA(j)) + lit(minhashB(j)), lit(MinhashMod))))
    }: _*)

  /** MinHash signature over a raw shingle array (convenience; hot paths
    * should materialize [[minhashBase]] first). */
  def minhashSig(shingleArr: Column, numHashes: Int): Column =
    minhashSigFromBase(minhashBase(shingleArr), numHashes)

  /** SimHash fingerprint (`bits`-wide, default 32) from a PRE-HASHED
    * feature array: per-bit majority vote of feature-hash bits. Callers
    * should materialize the hash array in its own projection first — the
    * vote references it `bits` times, and keeping it a separate (non-cheap)
    * attribute stops CollapseProject from inlining `bits` copies of the
    * md5 work into the plan. */
  def simhashOfHashes(hashes: Column, bits: Int = 32): Column = {
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash over a raw token/shingle array (hashes computed inline —
    * prefer [[simhashOfHashes]] on a materialized hash column). */
  def simhash(tokArr: Column, bits: Int = 32): Column =
    simhashOfHashes(transform(tokArr, t => hash60(t, 0)), bits)

  /** Marker-token count for language scoring: how many array elements are
    * in the marker set. */
  def markerCount(tokArr: Column, markers: Seq[String]): Column =
    size(filter(tokArr, t => t.isin(markers.map(lit(_)): _*)))

  /** Polynomial rolling-hash fingerprint of the whole token sequence:
    * fp = sum((hash60(tok_i) mod 2^20) * 31^(i mod 8)) mod 2^61-1 —
    * order-sensitive (unlike a token-set hash) and SQL-expressible.
    *
    * Overflow discipline: the hash is reduced to 20 bits BEFORE the power
    * multiply, so each term is < 2^20 * 31^7 < 2^55 and the running
    * (mod p) accumulator stays < 2^61 + 2^55 — no silent bigint wrap in
    * Spark, no overflow error in the oracle engine. The 31^e powers are
    * exact integer literals (31^7 < 2^53), never a runtime pow(). */
  def rollingFingerprint(tokArr: Column): Column = {
    val p = lit(2305843009213693951L) // 2^61 - 1
    val powers = array(Seq.iterate(1L, 8)(_ * 31L).map(lit(_)): _*)
    aggregate(
      zip_with(tokArr, sequence(lit(0), size(tokArr) - 1), (t, i) =>
        pmod(hash60(t, 7), lit(1048576L)) *
          element_at(powers, (pmod(i, lit(8)) + 1).cast("int"))),
      lit(0L), (acc, x) => pmod(acc + x, p))
  }
}
