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
}
