package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SimHash near-duplicate fingerprinting.
  *
  * 16-bit variant: bit j of the signature is the sign of
  * Σ_tokens (bit j of md5(token) ? +1 : -1). Bit j of the token hash
  * is read from hex digit j of the md5 (high bit of the nibble:
  * digit ∈ [8-f]) — portable to any engine with md5/substr.
  *
  * Per-row expression over the token array — no shuffle. Hamming
  * proximity then clusters near-identical documents; bucketing by a
  * signature prefix bounds the pair search exactly like MinHash bands.
  */
object SimHash {
  val Bits = 16

  private def hexHighBit(hash: Column, j: Int): Column =
    when(substring(hash, j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
      .otherwise(-1)

  /** Σ over token hashes of ±1 for bit j. */
  private def bitSum(hashes: Column, j: Int): Column =
    aggregate(hashes, lit(0), (acc, h) => acc + hexHighBit(h, j))

  /** The 16-bit simhash as a long (bit 0 = most significant hex digit).
    * Tokens are hashed ONCE (`transform` to md5 array) and the 16 bit
    * sums read hex digits off the cached hashes — md5 per token per
    * bit would cost 16× the hashing. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(text, " "), t => md5(t))
    (0 until Bits).map(j =>
      when(bitSum(hashes, j) > 0, lit(1L << (Bits - 1 - j))).otherwise(0L))
      .reduce(_ + _).cast(LongType)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bucket key = top `prefixBits` of the signature (LSH-style
    * candidate restriction for the pair join). */
  def bucket(sim: Column, prefixBits: Int = 8): Column =
    shiftright(sim, Bits - prefixBits)
}
