package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE engine-independent hash primitive every oracle-checked
  * dedup/split/mix operator builds on: 15 hex digits of md5 parsed as a
  * 60-bit positive long. md5 is byte-identical in every engine and 60
  * bits stays inside a signed BIGINT in both Spark and DuckDB, which is
  * what lets the DuckDB twins recompute identical signatures
  * (`CAST(concat('0x', substr(md5(x), start, 15)) AS BIGINT)` on that
  * side). Centralized because FOUR operators share the construction
  * (minhash both halves, simhash, split/mix) — a drifted copy would
  * silently break cross-engine oracle parity. */
object EngineHash {

  /** 60-bit positive hash from md5 hex digits [start, start+14]. `start`
    * 1 and 17 give the two independent halves of one digest. */
  def md5Bits60(c: Column, start: Int = 1): Column =
    conv(substring(md5(c), start, 15), 16, 10).cast("long")

  /** 60-bit left rotation of a positive long held in a signed BIGINT:
    * the shifted ranges are disjoint, so `+` ≡ `|` and nothing touches
    * the sign bit (the property that keeps the arithmetic identical in
    * Spark and DuckDB). Column and oracle-SQL forms live TOGETHER for
    * the same reason as [[md5Bits60]]: the rotation is parity-critical
    * in three derived-hash families (minhash slots, simhash, substring
    * windows) and a drifted copy would silently break an oracle. */
  def rot60(c: Column, r: Int): Column =
    if (r == 0) c
    else shiftleft(c.bitwiseAND(lit((1L << (60 - r)) - 1)), r) +
      shiftrightunsigned(c, 60 - r)

  /** The DuckDB twin of [[rot60]], as a SQL fragment over `x`. */
  def rot60Sql(x: String, r: Int): String =
    if (r == 0) x
    else s"((($x & ${(1L << (60 - r)) - 1}) << $r) + ($x >> ${60 - r}))"
}
