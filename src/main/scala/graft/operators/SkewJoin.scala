package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to one reducer; at
  * 100 TB a single celebrity key can pin a stage on one task long after the
  * other 999 executors go idle. Salting splits each key's rows across
  * `salts` reducers: the large side appends a deterministic per-row salt to
  * the join key, the small side is replicated once per salt value, and the
  * join becomes (keys, salt) — same result set, `salts`-way parallel on the
  * hot keys. Complements AQE's skew-join (which only splits post-shuffle
  * partitions of sort-merge joins and cannot help when the skew is in a
  * single key).
  *
  * Cost model: replicates the SMALL side `salts`×, so pick
  * `salts ≈ hot-key rows / target-partition rows` and keep the small side
  * genuinely small (dimension-table sized).
  */
object SkewJoin {

  /** Join `large` (skewed) with `small` on `keys`, spreading each key's
    * rows over `salts` reducers. Supported joins: inner, left (each large
    * row carries exactly one salt, so multiplicities match the unsalted
    * join exactly).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, how: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(how == "inner" || how == "left" || how == "left_outer",
      s"salting preserves semantics for inner/left joins only, got: $how")
    // deterministic per-row salt: hash of the full row, not a RNG — reruns
    // and retried tasks produce identical placement
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    l.join(r, (keys :+ "__salt").toIndexedSeq, how).drop("__salt")
  }
}
