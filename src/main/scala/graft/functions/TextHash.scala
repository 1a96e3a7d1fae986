package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing and text primitives.
  *
  * Everything here is defined so the exact same value is computable in any
  * ANSI-ish SQL engine (the DuckDB oracle re-derives them): hashes come from
  * md5 hex (not engine-specific hash functions), permutations are integer
  * arithmetic mod a Mersenne prime.
  *
  * These are the building blocks for the dedup family (SURVEY.md §2C):
  * MinHash-LSH, SimHash, n-gram Jaccard, document fingerprints.
  */
object TextHash {

  /** Mersenne prime 2^31-1: modulus for MinHash permutations. */
  val P: Long = 2147483647L

  /** MinHash signature length (permutation count). */
  val K: Int = 32

  /** LSH bands (rows per band r = K / Bands = 2). With r=2, b=16 the
    * candidate probability at jaccard s is 1-(1-s²)^16 — ≥ 0.99 for s ≥ 0.5,
    * while background pairs (s≈0.02) fire at ~0.6%. False candidates are
    * removed by exact verification, so we bias for recall.
    */
  val Bands: Int = 16

  def permA(i: Int): Long = ((2L * i + 1) * 1103515245L) % P
  def permB(i: Int): Long = (i * 12345L + 6789L) % P

  /** 60-bit stable hash: first 15 hex chars of md5, base-16 → long.
    * Portable: DuckDB spells it CAST('0x'||substr(md5(x),1,15) AS BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Distinct 3-word shingles from a token array (requires size >= 3). */
  def shingles3(toks: Column): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  /** Shingle hashes reduced mod P (MinHash domain) — fused per-array pass
    * ([[Hash60Array]]); the transform-HOF form evaluates interpreted per
    * element.
    */
  def shingleHashes(sh: Column): Column =
    VectorExpressions.hash60Array(sh, P)

  /** MinHash signature: array of K minima in one fused codegen pass
    * ([[MinHashSig]]) — the K× transform+array_min HOF chain is interpreted
    * and was the sf0.1 bottleneck.
    */
  def minhashSignature(h0s: Column): Column = VectorExpressions.minhashSig(h0s)

  /** LSH band keys: Bands structs of (bid, sig[2j]·2³¹ + sig[2j+1]).
    *
    * The packed LONG replaces the former "sig0,sig1" string key: sig
    * values are minima mod P < 2³¹, so the packing is injective and the
    * (bid, bkey) buckets are EXACTLY the buckets the string form produced
    * — same candidates, same pairs, same query output — while each key
    * shuffles as 8 fixed bytes instead of a ~13–21 char string (guide
    * §2.3 "narrower types") and the per-row concat/format work disappears
    * from the band fan-out, the hottest narrow stage of the whole dedup
    * family. (The DuckDB oracles keep their own string keys: bucket
    * equality is representation-independent.)
    */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { j =>
      struct(lit(j).as("bid"),
        (sig(2 * j) * lit(2147483648L) + sig(2 * j + 1)).as("bkey"))
    }: _*)

  /** 60-bit SimHash over the token multiset (counts weigh the ±1 votes):
    * hash each token once, then one fused vote pass ([[SimHash64]]).
    */
  def simhash60(toks: Column): Column =
    VectorExpressions.simhash64(VectorExpressions.hash60Array(toks, 0L))

  /** Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
}
