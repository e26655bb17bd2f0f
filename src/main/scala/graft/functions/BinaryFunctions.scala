package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary (de)serialization helpers for container-format columns, built
  * from codegen'd builtins (hex / unhex / lpad / substring / concat) — no
  * UDFs, so header synthesis stays inside whole-stage codegen.
  *
  * Values must be non-negative and fit the target width; the engine only
  * feeds these from bounded arithmetic (dims, rates, lengths), so no
  * masking is applied — a hex string longer than the lpad width would be
  * a caller bug and surfaces as a corrupt (hence parse-failing) header
  * rather than a silent truncation.
  */
object BinaryFunctions {

  private def beHex(v: Column, hexWidth: Int): Column =
    lpad(hex(v.cast("long")), hexWidth, "0")

  /** Byte-reverse a fixed-width hex string (big→little endian). */
  private def reverseHexBytes(h: Column, hexWidth: Int): Column =
    concat((hexWidth - 1 to 1 by -2).map(i => substring(h, i, 2)): _*)

  /** 32-bit big-endian encoding of an integral column. */
  def intBE(v: Column): Column = unhex(beHex(v, 8))

  /** 32-bit little-endian encoding. */
  def intLE(v: Column): Column = unhex(reverseHexBytes(beHex(v, 8), 8))

  /** 16-bit little-endian encoding. */
  def shortLE(v: Column): Column = unhex(reverseHexBytes(beHex(v, 4), 4))

  /** ASCII tag bytes (chunk types, RIFF fourccs). */
  def tagBytes(s: String): Column = lit(s.getBytes("US-ASCII"))
}
