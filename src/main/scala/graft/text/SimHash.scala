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

  private def bitContribution(tok: Column, j: Int): Column =
    when(substring(md5(tok), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
      .otherwise(-1)

  /** Σ over tokens of ±1 for bit j. */
  private def bitSum(toks: Column, j: Int): Column =
    aggregate(toks, lit(0), (acc, t) => acc + bitContribution(t, j))

  /** The 16-bit simhash as a long (bit 0 = most significant hex digit). */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    (0 until Bits).map(j =>
      when(bitSum(toks, j) > 0, lit(1L << (Bits - 1 - j))).otherwise(0L))
      .reduce(_ + _).cast(LongType)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bucket key = top `prefixBits` of the signature (LSH-style
    * candidate restriction for the pair join). */
  def bucket(sim: Column, prefixBits: Int = 8): Column =
    shiftright(sim, Bits - prefixBits)
}
