package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash.h32

/** Embedding similarity search over an Array[Float] column.
  *
  * - bruteForceTopK: exact cosine against every row — the correctness
  *   baseline; at scale this is one broadcast of the (small) probe set and
  *   a map-side scan, no shuffle until the per-probe top-k.
  * - Random-hyperplane LSH: deterministic ±1 planes derived from the shared
  *   md5 hash, sign-bit bucket per vector; ANN search only compares within
  *   the probe's bucket — the 100 TB path (bucket join instead of
  *   cross join). Planes are pseudo-random but fixed, so results are
  *   reproducible and SQL-oracle-checkable.
  *
  * All arithmetic is done in double with left-to-right accumulation so the
  * DuckDB oracle (list_sum over list_transform) is bit-identical.
  */
object Similarity {

  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product (matches SQL list_sum order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each probe id. probes/corpus: (id, vec). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      probeIds: Seq[Long], k: Int): DataFrame = {
    val base = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val probes = base.filter(col("cid").isin(probeIds: _*))
      .select(col("cid").as("pid"), col("cvec").as("pvec"))
    val scored = base.join(broadcast(probes), col("cid") =!= col("pid"))
      .withColumn("sim", cosine(col("pvec"), col("cvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank"), col("cid"), col("sim"))
  }

  /** Deterministic ±1 hyperplane component for plane m, dimension j. */
  private def planeSign(m: Int, j: Column): Column =
    when(h32(concat(lit(s"plane${m}_"), j.cast("string"))) % 2 === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-bit LSH bucket of a vector under nPlanes hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { m =>
      // dot(vec, plane_m) where plane components are ±1 by hash parity
      val d = aggregate(
        zip_with(toD(vec), sequence(lit(0), size(vec) - 1),
          (x, j) => x * planeSign(m, j)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << m)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: exact cosine restricted to the probe's LSH bucket. */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      probeIds: Seq[Long], k: Int, nPlanes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), nPlanes))
    val probes = bucketed.filter(col("cid").isin(probeIds: _*))
      .select(col("cid").as("pid"), col("cvec").as("pvec"), col("bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("cid") =!= col("pid"))
      .withColumn("sim", cosine(col("pvec"), col("cvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank"), col("cid"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, a < b. Exact
    * all-pairs here; at scale, pre-bucket with lshBucket and join on bucket.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val base = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val other = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    base.join(other, col("a") < col("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
