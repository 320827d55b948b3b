package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-portable md5-window hash family — the ONE definition of the
  * hash the DuckDB oracles replay bit-for-bit. Every oracle-checked
  * ranking/signature (dedup shingles, violation samplers, streaming
  * samples) must route through here so the portability contract cannot
  * silently fork.
  *
  * DuckDB twin: `('0x' || substr(md5('<seed>:' || s), 1+8*w, 8))::BIGINT`. */
object PortableHash {

  /** 32-bit seeded hash: hex window 0 of `md5("<seed>:" || s)`. */
  def md5Window32(s: Column, seed: Int): Column = md5Window32(s, seed, 0)

  /** One md5 yields FOUR independent 32-bit values (hex windows 0..3) —
    * k hashes cost ⌈k/4⌉ md5s; codegen subexpression elimination dedups
    * the digest. */
  def md5Window32(s: Column, group: Int, window: Int): Column =
    conv(substring(md5(concat(lit(s"$group:"), s).cast("binary")), 1 + 8 * window, 8), 16, 10)
      .cast("long")
}
