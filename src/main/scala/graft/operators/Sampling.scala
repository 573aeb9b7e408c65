package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextHash

/** Deterministic sampling for reproducible pipelines.
  *
  * RNG-seeded `df.sample` draws differ per engine, per partitioning, and
  * per retry — useless when a 100 TB corpus snapshot must be re-derivable.
  * Hash sampling keeps a row iff `h(key) % m == bucket`: reproducible
  * everywhere the hash is, partition-local (a pushed-down filter — zero
  * shuffle), consistent across tables sharing the key (sampling `events`
  * and `users` on the same user key yields aligned samples), and
  * stratifiable by key choice.
  */
object Sampling {

  /** Keep rows whose key hashes into `bucket` of `m` — a deterministic
    * 1/m sample. `salt` decorrelates independent samples over the same key.
    */
  def hashSample(df: DataFrame, key: Column, m: Int, bucket: Int = 0,
      salt: String = ""): DataFrame = {
    require(m >= 1 && bucket >= 0 && bucket < m, "need 0 <= bucket < m")
    df.where(TextHash.h32(concat(lit(salt), key.cast("string"))) % m === bucket)
  }
}
