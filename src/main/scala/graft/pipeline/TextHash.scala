package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing: a 32-bit integer hash derived from
  * the md5 hex prefix. Chosen because BOTH Spark (`conv(substr(md5(x),1,8),
  * 16,10)`) and DuckDB (`('0x' || substr(md5(x),1,8))::BIGINT`) compute the
  * identical value, which lets every hash-based pipeline operator (minhash,
  * simhash, LSH banding, fingerprinting) be verified bit-for-bit against a
  * SQL oracle. Not a cryptographic or speed choice — md5 here is a portable
  * PRF; at production scale swap in xxhash64 (Spark builtin) with the same
  * structure.
  */
object TextHash {

  /** 32-bit hash of a string/binary column as a non-negative long. */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL rendering of h32 over expression `e`. */
  def h32Sql(e: String): String = s"(('0x' || substr(md5($e),1,8))::BIGINT)"

  /** 60-bit hash (15 md5 hex chars) as a non-negative long — for modulo
    * arithmetic against values that can exceed 2^32 (e.g. per-source token
    * totals at 100 TB: `h32 % total` degenerates to `h32` once total >
    * 2^32, silently breaking sampling rates; 2^60 ≈ 1.2e18 tokens of
    * headroom). Fits a signed long, same cross-engine construction as h32.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL rendering of h60 over expression `e`. */
  def h60Sql(e: String): String = s"(('0x' || substr(md5($e),1,15))::BIGINT)"

  /** Prime modulus > 2^32 for minhash permutations. */
  val P: Long = 4294967311L

  /** Deterministic permutation coefficients (a_i, b_i) for k minhashes. */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (1 to k).map(i => (2L * i + 1L, 7919L * i))

  /** One permuted hash: (a * h + b) mod P. */
  def permuted(h: Column, a: Long, b: Long): Column =
    (h * lit(a) + lit(b)) % lit(P)

  def permutedSql(hSql: String, a: Long, b: Long): String =
    s"((($hSql) * $a + $b) % $P)"

  /** Word tokens: lowercase, split on whitespace. Identical semantics in
    * DuckDB via string_split_regex(lower(x), '\s+').
    */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  val tokensSql: String = "string_split_regex(lower(text), '\\s+')"

  /** Word n-gram shingles (space-joined), empty array when too short.
    * DuckDB equivalent: CASE WHEN len(t) >= n THEN list_transform(
    *   range(1, len(t)-n+2), i -> array_to_string(list_slice(t,i,i+n-1),' '))
    * ELSE [] END.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toksSql: String, n: Int): String =
    s"""CASE WHEN len($toksSql) >= $n
       | THEN list_transform(range(1, len($toksSql) - ${n - 2}),
       |   i -> array_to_string(list_slice($toksSql, i, i + ${n - 1}), ' '))
       | ELSE [] END""".stripMargin.replace("\n", " ")
}
