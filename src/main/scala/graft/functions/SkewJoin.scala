package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join via key salting — the manual fallback for when AQE's
  * skew-join split isn't available (e.g. the skewed side feeds a custom
  * operator). The big side's hot keys get a random-ish salt in [0, salts);
  * the small side is exploded ×salts so every salted key still matches.
  * Shuffle load for a hot key spreads across `salts` reducers.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic salt from row content keeps retries/stage replays stable
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
