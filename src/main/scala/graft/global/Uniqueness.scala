package graft.global

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-global uniqueness — the scaled-up `uniqueItems` (reference
  * lib/JSON/Validator/Draft4.pm:101-113 checks a per-array checksum seen-set;
  * here the "array" is the whole 10^12-row table).
  *
  * Two-phase hash-partitioned plan (SURVEY.md §2.4):
  *   phase 1 — `groupBy(key).count()`: Catalyst emits partial (map-side)
  *   aggregation before the hash shuffle, so each executor ships one row per
  *   distinct key per partition, not one per input row;
  *   phase 2 — `count > 1` filter yields the (normally tiny) duplicate-key
  *   set; violation rows come from a join back against the facts, which AQE
  *   converts to a broadcast join when the dup set is small.
  *
  * No `Window.partitionBy` — a window would shuffle and sort the entire fact
  * table; the groupBy plan shuffles only aggregated counts.
  */
object Uniqueness {

  /** Duplicate keys with their multiplicities. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Hash-first duplicate detection — the 100 TB path. Phase 1 shuffles only
    * `xxhash64(key)` (8 bytes/row instead of the full key; partial agg
    * still applies), yielding candidate hashes; phase 2 exact-verifies just
    * the candidate rows (a broadcast semi-join, then the precise groupBy
    * over that tiny slice). Same output as [[duplicateKeys]]; hash
    * collisions cost only a false candidate, never a wrong result. */
  def duplicateKeysHashed(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val h = xxhash64(keyCols.map(col): _*)
    val dupHashes = df.select(h.as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1)
      .select("__h")
    val candidates = df.join(broadcast(dupHashes), h === col("__h"), "left_semi")
    candidates.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)
  }

  /** Violation rows `(keyCols…, rule_id, observed)` — one per duplicated
    * fact row. Equi-join back on the key; AQE broadcasts the dup side when
    * small. */
  def violations(df: DataFrame, keyCols: Seq[String], ruleId: String = "unique"): DataFrame = {
    val dups = duplicateKeys(df, keyCols)
    df.join(dups, keyCols, "inner")
      .select(keyCols.map(col) :+
        lit(ruleId).as("rule_id") :+
        concat(lit("duplicate key seen "), col("n_rows"), lit(" times")).as("observed"): _*)
  }

  /** Boolean verdict column form: per-key pass/fail counts for the verdict
    * table, single shuffle. */
  def verdict(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dupRows = duplicateKeys(df, keyCols).agg(
      count(lit(1)).as("n_dup_keys"),
      coalesce(sum(col("n_rows")), lit(0L)).as("n_dup_rows"))
    dupRows.select(
      lit("unique:" + keyCols.mkString(",")).as("rule_id"),
      col("n_dup_keys"), col("n_dup_rows"),
      when(col("n_dup_keys") === 0, "pass").otherwise("fail").as("verdict"))
  }
}
