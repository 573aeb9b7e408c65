package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextHash

/** Deterministic hash-guided random walks — the DeepWalk / node2vec
  * sampling primitive (walk corpora feeding skip-gram style embedding
  * training) without any RNG state: at step t, walk (s, w) moves to the
  * out-neighbor u minimizing h32("s|w|t|u"). Each (walk, step) draw is an
  * independent uniform-ish choice over the neighbor set, yet the whole
  * corpus is a pure function of the graph — re-running on another cluster
  * (or another engine: the same argmin is plain SQL over md5, so the gate
  * is oracle-checked bit-for-bit) reproduces it exactly. The reference has
  * no sampling surface at all; this is the Spark-native one.
  *
  * Scale shape: walk state is one (start_id, walk, id) row per live walk —
  * O(|starts| * walksPerStart), never per-path arrays. Each step is ONE
  * join of the immutable edge checkpoint against the walk frontier
  * (count-gated broadcast with a shuffle fallback — a node2vec-scale
  * frontier of |V|*r walks exceeds the gate and shuffles on the vertex
  * key) plus ONE partial-aggregated argmin shuffle keyed (start_id, walk).
  * Walks at a sink vertex simply stop (their frontier row emits no
  * candidate), matching the walk-truncation semantics of DeepWalk corpora
  * on DAG-shaped graphs.
  */
object RandomWalks {

  /** Walk id column type is INT (walksPerStart is a small per-source
    * fan-out constant; the scale axis is |starts|).
    * Returns (start_id, walk, step, id) for every visited position,
    * including step 0 at the start vertex.
    */
  def hashWalks(edges: DataFrame, starts: DataFrame, steps: Int,
      walksPerStart: Int = 1,
      maxBroadcastRows: Long = Traversals.BroadcastFrontierRows): DataFrame = {
    require(steps >= 0, "steps must be >= 0")
    require(walksPerStart >= 1, "walksPerStart must be >= 1")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(false)
    val walkIds = spark.range(1, walksPerStart + 1L)
      .select(col("id").cast("int").as("walk"))
    var frontier = starts.select(col("id").cast("long").as("start_id"))
      .distinct()
      .crossJoin(broadcast(walkIds)) // |walksPerStart| rows — a constant
      .select(col("start_id"), col("walk"), col("start_id").as("id"))
      .localCheckpoint(false)
    var out = frontier.withColumn("step", lit(0))
    var live = frontier.count()
    var step = 0
    while (step < steps && live > 0) {
      step += 1
      val f = if (live <= maxBroadcastRows) broadcast(frontier) else frontier
      // the per-(walk, step) draw: h32 over "start|walk|step|candidate" —
      // identical text rendering in DuckDB (BIGINT/INT || coerce to the
      // same decimal digits), so the oracle replays the exact choice
      val cand = e.join(f, f("id") === e("src"))
        .select(f("start_id"), f("walk"), e("dst"))
        .withColumn("h", TextHash.h32(concat_ws("|",
          col("start_id"), col("walk"), lit(step), col("dst"))))
      // argmin via min(struct): ties (hash collisions between two
      // neighbors of one walk) break to the smaller vertex id — total
      // order, mirrored by the oracle's ORDER BY h, dst
      val next = cand.groupBy(col("start_id"), col("walk"))
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("start_id"), col("walk"), col("m.dst").as("id"))
        .localCheckpoint(false)
      // ONE job per step: the count materializes the lazy checkpoint and
      // decides both termination and the next broadcast gate
      live = next.count()
      out = out.unionByName(next.withColumn("step", lit(step)))
      frontier = next
    }
    e.unpersist()
    out.select(col("start_id"), col("walk"), col("step"), col("id"))
  }
}
