package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an Array[Float] embedding column —
  * the corpus-clustering primitive a mixture designer runs before
  * weighting sources (and the centroid trainer behind IVF ANN, see
  * Similarity.ivfTopK). The reference ships no clustering at all; this
  * is a north-star pipeline operator built exact-by-construction:
  *
  * All arithmetic runs on an integer grid (the r10 quantization
  * pattern): inputs snap once to `floor(10^q·x + 0.5)` LONGs, squared
  * L2 distances are exact integer sums, and each centroid update is the
  * half-up-rounded integer mean `(2·S + n) div (2·n)` — identical
  * op-for-op in DuckDB SQL, so a full multi-iteration clustering is
  * hash-checkable, something float k-means can never be (FP sums
  * reorder under shuffle). A fixed +10^q·10 offset keeps every
  * quantized value positive so truncating and floor division agree on
  * both engines; the offset cancels in every distance and commutes
  * exactly through the rounded mean, so assignments and centroids are
  * those of the unshifted data.
  *
  * Scale shape (the 100 TB posture):
  * - centroids are k·d LONGs — collected to the driver and re-broadcast
  *   as a literal each iteration (the MLlib pattern; bounded state, NOT
  *   data-sized), so ASSIGNMENT IS SHUFFLE-FREE: one codegen'd
  *   higher-order-function pass (transform/zip_with/aggregate over the
  *   literal centroid array, array_min struct argmin with id
  *   tie-break) over the point relation.
  * - the update is the only shuffle: posexplode to (cluster, dim) and
  *   hash-aggregate — map-side partial aggregation folds each
  *   partition to ≤ k·d rows before the exchange, so shuffle volume is
  *   executors·k·d, independent of |points|.
  * - empty clusters drop out (standard Lloyd's); deterministic init =
  *   the k lowest-id vectors.
  */
object Clustering {

  /** One quantized squared-L2 distance: Σ (a_i - b_i)². */
  private def distQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  // ------------------------------------------------------------------
  // Grouped (per-subspace) exact-grid k-means — ONE copy of the codebook
  // arithmetic shared by pqTopK (e13) and ivfadcTopK's residual PQ (e15),
  // so the argmin struct ordering, the half-up integer mean and the
  // (sub, cl) sort can never silently desynchronize (r19 review).
  // ------------------------------------------------------------------

  /** Literal array of grouped codebook entries (sub, cq, cl). */
  private def groupedCentsLit(cents: Array[(Int, Long, Seq[Long])]): Column =
    array(cents.map { case (sub, cl, cq) =>
      struct(lit(sub).as("sub"), typedLit(cq).as("cq"), lit(cl).as("cl"))
    }: _*)

  /** Per-subspace argmin: appends `code` to pts' columns — only centroids
    * of the row's OWN subspace compete (the grouped form of
    * kmeansQuantized's global argmin). Extra pts columns ride through.
    */
  private def groupedAssign(pts: DataFrame,
      cents: Array[(Int, Long, Seq[Long])]): DataFrame =
    pts.withColumn("best",
        array_min(transform(
          filter(groupedCentsLit(cents), c => c.getField("sub") === col("sub")),
          c => struct(distQ(col("xq"), c.getField("cq")).as("dist"),
            c.getField("cl").as("cl")))))
      .select(pts.columns.map(col).toIndexedSeq :+
        col("best.cl").as("code"): _*)

  /** The grouped trainer over a (sub, id, xq[, …]) relation: init = the
    * rows of `lowIds` (each subspace seeds from the same ids), `iters`
    * assign/update rounds with the half-up integer mean, empty codes
    * drop (standard Lloyd's).
    */
  private def groupedGridKmeans(pts: DataFrame, iters: Int,
      lowIds: Seq[Long]): Array[(Int, Long, Seq[Long])] = {
    def collect(centDf: DataFrame): Array[(Int, Long, Seq[Long])] =
      centDf.collect().map { r: Row =>
        (r.getInt(0), r.getLong(1), r.getSeq[Long](2))
      }.sortBy(c => (c._1, c._2))
    var cents = collect(
      pts.where(col("id").isin(lowIds: _*))
        .select(col("sub"), col("id").as("cl"), col("xq").as("cq")))
    for (_ <- 1 to iters) {
      cents = collect(groupedAssign(pts, cents)
        .select(col("sub"), col("code"), posexplode(col("xq")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code"), col("pos"))
        // the kmeansQuantized half-up integer mean, verbatim
        .agg(expr("(2 * sum(v) + count(1)) div (2 * count(1))").as("cqd"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cqd")))),
          s => s.getField("cqd")).as("cq"))
        .select(col("sub"), col("code").as("cl"), col("cq")))
    }
    cents
  }

  /** k-means on the 10^-q grid; returns one row per input vector:
    * (id, cluster, dist_q, cluster_n) where dist_q is the exact
    * quantized squared distance to the final centroid and cluster_n the
    * final cluster size. `iters` full assign+update rounds run before
    * the reported final assignment.
    */
  def kmeansQuantized(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, q: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val scale = math.pow(10, q)
    val offset = (scale * 10).toLong // keeps quantized values positive
    val pts = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          v => floor(v.cast("double") * scale + lit(0.5)).cast("long") +
            lit(offset)).as("xq"))
      .localCheckpoint(false)
    // positivity + uniform-dimension guards in ONE pass: |x| beyond the
    // offset headroom would break the floor-vs-truncate agreement the
    // oracle depends on, and a ragged embedding column would silently
    // skew centroid means (a short row contributes to COUNT(*) on every
    // dimension while SUM skips its missing entries — r11 ADVICE)
    val g = pts.agg(min(array_min(col("xq"))),
      min(size(col("xq"))), max(size(col("xq")))).head()
    val (minQ, dMin, dMax) = (g.getLong(0), g.getInt(1), g.getInt(2))
    require(minQ > 0, s"kmeansQuantized: embedding magnitude exceeds " +
      s"the 10.0 guard (min quantized $minQ); raise the offset")
    require(dMin == dMax, s"kmeansQuantized: ragged embedding lengths " +
      s"($dMin..$dMax) — uniform dimensionality is required")

    def assign(cents: Array[(Long, Seq[Long])]): DataFrame = {
      val centLit = array(cents.map { case (cl, cq) =>
        struct(typedLit(cq).as("cq"), lit(cl).as("cl"))
      }: _*)
      // argmin = lexicographic min over (dist, cluster-id) structs
      pts.withColumn("best",
          array_min(transform(centLit, c => struct(
            distQ(col("xq"), c.getField("cq")).as("dist"),
            c.getField("cl").as("cl")))))
        .select(col("id"), col("xq"),
          col("best.cl").as("cluster"), col("best.dist").as("dist_q"))
    }
    def collectCents(centDf: DataFrame): Array[(Long, Seq[Long])] =
      centDf.collect().map { r: Row =>
        (r.getLong(0), r.getSeq[Long](1))
      }.sortBy(_._1)

    var cents = collectCents(
      pts.orderBy(col("id")).limit(k)
        .select(col("id").as("cl"), col("xq").as("cq")))
    for (_ <- 1 to iters) {
      val assigned = assign(cents)
      // (cluster, dim) partial sums — the one shuffle, k·d rows out
      val updated = assigned
        .select(col("cluster"), posexplode(col("xq")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        // integral `div`, not double `/`: a double quotient correctly
        // rounded to nearest can land one ulp ABOVE an integer the true
        // ratio sits just under, and the truncating cast would then
        // disagree with the oracle's integer floor division
        .agg(expr("(2 * sum(v) + count(1)) div (2 * count(1))").as("cqd"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cqd")))),
          s => s.getField("cqd")).as("cq"))
      cents = collectCents(updated)
    }
    // materialize the final assignment ONCE (eager — sizes and output
    // both read it; r10 ADVICE flagged the doubled full-corpus pass)
    val fin = assign(cents).localCheckpoint()
    val sizes = fin.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_n"))
    fin
      .join(broadcast(sizes), Seq("cluster"))
      .select(col("id"), col("cluster"), col("dist_q"), col("cluster_n"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-
    * scale through semantic deduplication", 2023, arXiv:2303.09540):
    * semantic near-duplicate pruning that clusters the embedding space
    * FIRST and verifies cosine similarity only WITHIN a cluster — the
    * paper's core scaling argument, and this engine's: k-means confines
    * the quadratic verify join to cluster-sized blocks (pick k so
    * clusters stay bounded), so the pair join costs Σ|cluster|² instead
    * of |corpus|²; a still-too-large cluster composes with
    * Similarity.nearDupPairsBucketed inside the block unchanged. The
    * boundedness assumption is ENFORCED loudly (r16 VERDICT): the largest
    * cluster must hold ≤ maxClusterSize vectors or the call fails with a
    * message pointing at the bucketed composition — never a silent
    * corpus-quadratic join.
    *
    * Drop rule (deterministic, SQL-replayable): a vector is dropped iff
    * some SMALLER id in its cluster sits within cosine >= tau — the
    * min-id survivor convention shared with Dedup.exact/nearDupClusters.
    * Returns one row per DROPPED vector: (cluster, vec id, keeper = the
    * smallest matching smaller id, n_dups = matching smaller ids,
    * max_sim). Exactness: assignments ride [[kmeansQuantized]]'s integer
    * grid; sim is the e1-class double (one fixed-fold dot + one divide),
    * and min/count/max aggregates are order-independent — the whole
    * multi-stage pipeline hash-matches the oracle's replay.
    *
    * EAGER-EXECUTION NOTE (r17 ADVICE): the cluster-size guard must run
    * before the hazard it guards, so CONSTRUCTING this DataFrame executes
    * the full k-means job — an EXPLAIN or dry-run registration is not
    * free. The assignment checkpoint kmeansQuantized pins stays until the
    * harness sweep (Verify/Bench sweep getPersistentRDDs per query); a
    * resident caller should wrap consumption in Checkpoints.sweepingDelta.
    */
  def semDedupDropped(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double, q: Int = 6,
      maxClusterSize: Long = 8192L): DataFrame = {
    import graft.functions.VectorFunctions
    val asgFull = kmeansQuantized(df, idCol, vecCol, k, iters, q)
    // LOUD guard on the quadratic hazard (r16 VERDICT): the within-cluster
    // pair join is |cluster|² by design — a degenerate k-means (near-
    // identical embeddings, or k far too small) would silently turn it
    // quadratic in the corpus. One cheap one-row digest over the already-
    // checkpointed assignment (cluster_n is computed by kmeansQuantized)
    // fails loudly instead, the mmrTopK/pivotStress discipline.
    val maxRow = asgFull.agg(max(col("cluster_n"))).head
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    require(maxN <= maxClusterSize,
      s"semDedupDropped: largest cluster holds $maxN vectors " +
        s"(> maxClusterSize = $maxClusterSize) — the within-cluster verify " +
        "join is |cluster|^2. Raise k/iters so clusters stay bounded, raise " +
        "maxClusterSize deliberately, or route oversized clusters through " +
        "Similarity.nearDupPairsBucketed (banded candidates, never all-pairs)")
    val asg = asgFull.select(col("id"), col("cluster"))
    val vecs = df.select(col(idCol).cast("long").as("id"),
        VectorFunctions.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val cv = asg.join(vecs, "id")
    cv.as("x").join(cv.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.id") < col("y.id"))
      .withColumn("sim",
        VectorFunctions.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm")))
      .where(col("sim") >= tau)
      .groupBy(col("x.cluster").as("cluster"), col("y.id").as("vec_id"))
      .agg(min(col("x.id")).as("keeper"),
        count(lit(1)).as("n_dups"), max(col("sim")).as("max_sim"))
  }

  /** Product-quantization ANN top-k (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011) — the missing
    * member of the compression family (int8 recall → PQ): vectors split
    * into `m` subspaces, an EXACT-GRID k-means ([[kmeansQuantized]]'s
    * integer arithmetic, run GROUPED — all m codebooks train in the same
    * jobs, keyed by subspace, so training cost is iteration count, not
    * m × iterations) learns a kCodes-entry codebook per subspace, the
    * corpus encodes as m small codes per vector, and probe distances are
    * ADC — asymmetric distance computation: the probe's exact quantized
    * subvector against each centroid gives an m × kCodes integer LUT, and
    * a candidate's distance is the SUM of its m LUT entries. Everything
    * rides the 10^-q grid: codes, LUT entries and ADC sums are exact
    * integers, so the whole trained-encode-search pipeline hash-matches a
    * SQL replay (something float PQ cannot).
    *
    * Returns (pid, rank, cid, adc) — rank by (adc ASC, cid) per probe,
    * rank ≤ k. Recall against brute force is measured like e3
    * (deterministic both sides).
    *
    * Scale shape: codebooks are m·kCodes·(d/m) = kCodes·d LONGs —
    * driver-bounded like kmeansQuantized's centroids; encoding is the
    * same shuffle-free broadcast-literal argmin pass; the ADC join keys
    * on (subspace, code) against the m·kCodes-row LUT (broadcast) and
    * partial-aggregates the per-(probe, candidate) sum map-side. At
    * 100 TB the codes relation is m small ints per vector — the point of
    * PQ — and search never touches the raw vectors.
    *
    * EAGER-EXECUTION NOTE: training runs at construction time (the
    * kmeansQuantized/semDedup class); the codes checkpoint stays pinned
    * until the harness sweep.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      probeIds: Seq[Long], k: Int, m: Int = 4, kCodes: Int = 8,
      iters: Int = 2, q: Int = 6): DataFrame = {
    require(k >= 1 && m >= 1 && kCodes >= 1 && iters >= 1,
      s"pqTopK: k, m, kCodes, iters must be >= 1, got ($k, $m, $kCodes, $iters)")
    val scale = math.pow(10, q)
    val offset = (scale * 10).toLong
    // one row per (subspace, vector): xq = the quantized subvector. The
    // slice length is size div m — guarded uniform and divisible below,
    // so it is the same constant on every row.
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    val pts = base
      .select(col("id"), col("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("sub"), col("id"),
        transform(
          slice(col("__v"),
            (col("sub") * expr(s"size(__v) div $m") + 1).cast("int"),
            expr(s"size(__v) div $m").cast("int")),
          v => floor(v.cast("double") * scale + lit(0.5)).cast("long") +
            lit(offset)).as("xq"))
      .localCheckpoint(false)
    // positivity + uniform-dimension + divisibility in ONE pass over the
    // base relation (the kmeansQuantized guard plus the PQ split
    // constraint; r18 review — a second guard job would pay the AQE job
    // floor twice per call). Positivity is checked on the FULL quantized
    // vector: once divisibility holds the subspace slices cover exactly
    // these elements, so the minima agree; when it does not, the
    // divisibility require fires first.
    val g = base.agg(min(size(col("__v"))), max(size(col("__v"))),
      min(array_min(transform(col("__v"),
        v => floor(v.cast("double") * scale + lit(0.5)).cast("long") +
          lit(offset))))).head()
    val (dMin, dMax, minQ) = (g.getInt(0), g.getInt(1), g.getLong(2))
    require(dMin == dMax, s"pqTopK: ragged embedding lengths " +
      s"($dMin..$dMax) — uniform dimensionality is required")
    require(dMin % m == 0,
      s"pqTopK: dimension $dMin is not divisible by m = $m subspaces")
    require(minQ > 0, s"pqTopK: embedding magnitude exceeds the 10.0 " +
      s"guard (min quantized $minQ); raise the offset")

    // init: each subspace's codebook seeds from the k lowest ids (the
    // kmeansQuantized deterministic init, identical across subspaces)
    val lowIds = base.select(col("id")).orderBy(col("id")).limit(kCodes)
      .collect().map(_.getLong(0)).toSeq
    val cents = groupedGridKmeans(pts, iters, lowIds)
    val codes = groupedAssign(pts, cents)
      .select(col("sub"), col("id"), col("code"))
      .localCheckpoint()
    // the ADC LUT: each probe's exact quantized subvector against every
    // centroid of that subspace — m·kCodes rows per probe, broadcast
    val centLit = groupedCentsLit(cents)
    val lut = pts.where(col("id").isin(probeIds: _*))
      .select(col("id").as("pid"), col("sub"), col("xq"),
        explode(filter(centLit, c => c.getField("sub") === col("sub")))
          .as("c"))
      .select(col("pid"), col("sub"), col("c.cl").as("code"),
        distQ(col("xq"), col("c.cq")).as("dist"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("id") =!= col("pid"))
      .groupBy(col("pid"), col("id").as("cid"))
      .agg(sum(col("dist")).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("adc"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("pid"), col("rank"), col("cid"), col("adc"))
  }

  /** IVFADC ANN top-k (Jégou, Douze & Schmid, "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011, §IV — the paper's actual
    * search system, composing the two halves this engine already ships):
    * an IVF coarse quantizer (exact-grid k-means, [[kmeansQuantized]]'s
    * arithmetic with k = nLists) routes every vector to its nearest
    * coarse list; a product quantizer ([[pqTopK]]'s grouped exact-grid
    * k-means) encodes each vector's RESIDUAL (x − coarse centroid) as m
    * small codes; a probe scans only its nProbe nearest lists and ranks
    * candidates by the integer ADC sum of its own residual-vs-codebook
    * LUT. Residual encoding is why IVFADC beats unrouted PQ (e13/e14) at
    * the same code budget: residuals concentrate near zero, so the same
    * kCodes-entry codebooks quantize them far more finely.
    *
    * Metric (r19): with `unitNorm` (the default) vectors are UNIT-
    * NORMALIZED before the grid snap — on the unit sphere squared L2 is
    * 2 − 2·cos, so the L2-native IVFADC machinery ranks by COSINE, the
    * metric the e-family's brute-force exact side uses (without this,
    * routing confines L2 neighbours while recall is judged on cosine —
    * measured at e14-class recall; normalized, the routing and the ADC
    * agree with the judge). The norm is the e1-class ONE fixed-fold
    * double + one division per element, mirrored op-for-op in the
    * oracle; `unitNorm = false` keeps the raw-grid L2 form (the spec's
    * hand-exact case).
    *
    * Exactness: everything rides the 10^-q grid. Residuals are integer
    * differences re-offset by 2·10^(q+1) (strictly positive given the
    * ±10.0 magnitude guard, so the half-up integer mean's `div` agrees
    * with DuckDB `//`); the offset cancels in every squared distance, so
    * codes and ADC sums are those of the unshifted residuals. The whole
    * route-train-encode-search pipeline hash-matches a SQL replay.
    *
    * Returns (pid, rank, cid, adc): rank by (adc ASC, cid) per probe over
    * candidates in the probe's nProbe lists only, rank ≤ k.
    *
    * `rerank` > 0 is the paper's IVFADC+R refinement (Jégou et al. §V —
    * what every production PQ system ships): the ADC ranking keeps its
    * top-`rerank` shortlist per probe, the shortlist alone is re-scored
    * with the EXACT cosine (R bounded point lookups of raw vectors — the
    * only step that touches them), and rank ≤ k is by (sim DESC, cid).
    * ADC compresses the scan; the exact pass fixes the quantization
    * noise (measured: e16 recall@5 at the routing ceiling vs e14's
    * unrouted 0.2–0.4). The adc integer rides along in the output.
    *
    * Scale shape: coarse centroids are nLists·d longs and PQ codebooks
    * m·kCodes·(d/m) longs — both driver-bounded broadcast literals;
    * routing and encoding are shuffle-free codegen'd argmin passes; the
    * stored index is (list, m codes) per vector — PQ compression WITH
    * list confinement, so a probe touches ~nProbe/nLists of the code
    * relation and never a raw vector. The ADC join keys on (list, sub,
    * code) against the broadcast probe LUT (|probes|·nProbe·m·kCodes
    * rows) and partial-aggregates map-side — the e13 plan shape plus the
    * list equi-key.
    *
    * EAGER-EXECUTION NOTE: both quantizers train at construction (the
    * kmeansQuantized/pqTopK class); the routed-codes checkpoint stays
    * pinned until the harness sweep.
    */
  def ivfadcTopK(df: DataFrame, idCol: String, vecCol: String,
      probeIds: Seq[Long], k: Int, nLists: Int = 8, nProbe: Int = 2,
      m: Int = 4, kCodes: Int = 8, iters: Int = 2, q: Int = 6,
      unitNorm: Boolean = true, rerank: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions
    require(k >= 1 && nLists >= 1 && m >= 1 && kCodes >= 1 && iters >= 1,
      s"ivfadcTopK: k, nLists, m, kCodes, iters must be >= 1, " +
        s"got ($k, $nLists, $m, $kCodes, $iters)")
    require(nProbe >= 1 && nProbe <= nLists,
      s"ivfadcTopK: nProbe $nProbe must be in 1..$nLists")
    val scale = math.pow(10, q)
    val offset = (scale * 10).toLong
    val offR = 2L * offset // residual re-offset: xq − cq ∈ (−offR, offR)
    val ptsPlan = if (unitNorm) {
      // the e4 zero-vector floor keeps 0/0 off the grid; op order
      // ((v / n) * scale + 0.5) is mirrored exactly in the oracle
      df.select(col(idCol).cast("long").as("id"),
          VectorFunctions.toDoubleArray(col(vecCol)).as("__v"))
        .withColumn("__n",
          greatest(VectorFunctions.norm(col("__v")), lit(1e-30)))
        .select(col("id"), transform(col("__v"),
          v => floor((v / col("__n")) * scale + lit(0.5)).cast("long") +
            lit(offset)).as("xq"))
    } else {
      df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          v => floor(v.cast("double") * scale + lit(0.5)).cast("long") +
            lit(offset)).as("xq"))
    }
    // all guards in ONE pass over the UN-checkpointed plan (the pqTopK
    // discipline — a rejected call must pin no blocks, the knnTopK
    // rule), plus the UPPER magnitude bound residual positivity needs:
    // xq must stay below 2·offset so xq − cq + 2·offset > 0 everywhere
    val g = ptsPlan.agg(min(size(col("xq"))), max(size(col("xq"))),
      min(array_min(col("xq"))), max(array_max(col("xq")))).head()
    val (dMin, dMax, minQ, maxQ) =
      (g.getInt(0), g.getInt(1), g.getLong(2), g.getLong(3))
    require(dMin == dMax, s"ivfadcTopK: ragged embedding lengths " +
      s"($dMin..$dMax) — uniform dimensionality is required")
    require(dMin % m == 0,
      s"ivfadcTopK: dimension $dMin is not divisible by m = $m subspaces")
    require(minQ > 0 && maxQ < offR,
      s"ivfadcTopK: embedding magnitude exceeds the ±10.0 guard " +
        s"(quantized range $minQ..$maxQ outside (0, $offR)); raise the offset")
    val sd = dMin / m
    val pts = ptsPlan.localCheckpoint(false)

    // ---- coarse quantizer: exact-grid k-means, k = nLists ----
    def coarseLit(cents: Array[(Long, Seq[Long])]): Column =
      array(cents.map { case (cl, cq) =>
        struct(typedLit(cq).as("cq"), lit(cl).as("cl"))
      }: _*)
    def coarseAssign(cents: Array[(Long, Seq[Long])]): DataFrame =
      pts.withColumn("best",
          array_min(transform(coarseLit(cents), c => struct(
            distQ(col("xq"), c.getField("cq")).as("dist"),
            c.getField("cl").as("cl")))))
        .select(col("id"), col("xq"), col("best.cl").as("list"))
    def collectCoarse(centDf: DataFrame): Array[(Long, Seq[Long])] =
      centDf.collect().map { r: Row =>
        (r.getLong(0), r.getSeq[Long](1))
      }.sortBy(_._1)
    var cCents = collectCoarse(
      pts.orderBy(col("id")).limit(nLists)
        .select(col("id").as("cl"), col("xq").as("cq")))
    for (_ <- 1 to iters) {
      val assigned = coarseAssign(cCents)
      cCents = collectCoarse(assigned
        .select(col("list"), posexplode(col("xq")).as(Seq("pos", "v")))
        .groupBy(col("list"), col("pos"))
        .agg(expr("(2 * sum(v) + count(1)) div (2 * count(1))").as("cqd"))
        .groupBy(col("list"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cqd")))),
          s => s.getField("cqd")).as("cq")))
    }
    val cLit = coarseLit(cCents)

    // ---- residual points: one row per (subspace, vector), confined to
    // the vector's OWN list centroid; staged columns so the coarse
    // lookup evaluates once per row (the HOF-blowup rule) ----
    val rpts = coarseAssign(cCents)
      .withColumn("__cq", element_at(
        filter(cLit, c => c.getField("cl") === col("list")), 1)
        .getField("cq"))
      .select(col("id"), col("list"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("xq"), col("__cq"))
      .select(col("sub"), col("id"), col("list"),
        zip_with(
          slice(col("xq"), (col("sub") * sd + 1).cast("int"), lit(sd)),
          slice(col("__cq"), (col("sub") * sd + 1).cast("int"), lit(sd)),
          (x, c) => x - c + lit(offR)).as("xq"))
      .localCheckpoint(false)

    // ---- product quantizer on residuals: the SHARED grouped exact-grid
    // k-means (one copy of the codebook arithmetic with pqTopK) ----
    val lowIds = pts.select(col("id")).orderBy(col("id")).limit(kCodes)
      .collect().map(_.getLong(0)).toSeq
    val pqCents = groupedGridKmeans(rpts, iters, lowIds)
    val pqLit = groupedCentsLit(pqCents)
    // the stored index: (list, sub, code) per vector — m small codes
    val codes = groupedAssign(rpts, pqCents)
      .select(col("sub"), col("id"), col("list"), col("code"))
      .localCheckpoint()

    // ---- probe routing + residual LUT: top-nProbe coarse lists per
    // probe, then the probe's residual vs every same-subspace codebook
    // entry — |probes|·nProbe·m·kCodes integer rows, broadcast ----
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("dist"), col("list"))
    val pRoutes = pts.where(col("id").isin(probeIds: _*))
      .select(col("id").as("pid"), col("xq").as("pxq"),
        explode(cLit).as("c"))
      .select(col("pid"), col("pxq"), col("c.cl").as("list"),
        col("c.cq").as("lcq"),
        distQ(col("pxq"), col("c.cq")).as("dist"))
      .withColumn("rk", row_number().over(w0))
      .where(col("rk") <= nProbe)
    val lut = pRoutes
      .select(col("pid"), col("list"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("pxq"), col("lcq"))
      .withColumn("prq", zip_with(
        slice(col("pxq"), (col("sub") * sd + 1).cast("int"), lit(sd)),
        slice(col("lcq"), (col("sub") * sd + 1).cast("int"), lit(sd)),
        (x, c) => x - c + lit(offR)))
      .select(col("pid"), col("list"), col("sub"),
        explode(filter(pqLit, c => c.getField("sub") === col("sub")))
          .as("c2"), col("prq"))
      .select(col("pid"), col("list"), col("sub"),
        col("c2.cl").as("code"), distQ(col("prq"), col("c2.cq")).as("dist"))

    // ---- ADC over probed lists only: the e13 broadcast-LUT equi-join
    // plus the list confinement key ----
    val scored = codes.join(broadcast(lut), Seq("list", "sub", "code"))
      .where(col("id") =!= col("pid"))
      .groupBy(col("pid"), col("id").as("cid"))
      .agg(sum(col("dist")).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("adc"), col("cid"))
    val adcRanked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0)
      adcRanked.where(col("rank") <= k)
        .select(col("pid"), col("rank"), col("cid"), col("adc"))
    else {
      // IVFADC+R: exact cosine over the ADC top-`rerank` shortlist only
      val vecs = df.select(col(idCol).cast("long").as("vid"),
          VectorFunctions.toDoubleArray(col(vecCol)).as("vv"))
        .withColumn("vn", VectorFunctions.norm(col("vv")))
      val short = adcRanked.where(col("rank") <= rerank)
        .select(col("pid"), col("cid"), col("adc"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(col("sim").desc, col("cid"))
      short
        .join(vecs.select(col("vid").as("pid"), col("vv").as("pv"),
          col("vn").as("pn")), Seq("pid"))
        .join(vecs.select(col("vid").as("cid"), col("vv").as("cv"),
          col("vn").as("cn")), Seq("cid"))
        .withColumn("sim", VectorFunctions.dot(col("pv"), col("cv")) /
          (col("pn") * col("cn")))
        .withColumn("rank", row_number().over(wr))
        .where(col("rank") <= k)
        .select(col("pid"), col("rank"), col("cid"), col("adc"))
    }
  }

  /** Cluster-label purity: for each cluster in `assign` (id, cluster),
    * the dominant external label's share — the quality readout a curation
    * pipeline uses to judge whether embedding clusters track a known
    * taxonomy (source, language, topic). Exact integers (dominant_n,
    * cluster_n) carry the result; purity is ONE final division of those
    * exact integers, the t16 pattern. Dominant ties break to the
    * smallest label. Scale: the per-(cluster, label) count relation is
    * ≤ k·|labels| rows after map-side combine — the window runs on that
    * tiny relation, never on the corpus.
    */
  def clusterPurity(assign: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = assign.join(labels, "id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n").desc, col("label"))
    val tot = counts.groupBy(col("cluster"))
      .agg(sum(col("n")).cast("long").as("cluster_n"))
    counts.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .join(broadcast(tot), Seq("cluster"))
      .select(col("cluster"), col("cluster_n"),
        col("label").cast("long").as("dominant_label"),
        col("n").as("dominant_n"),
        (col("n").cast("double") / col("cluster_n").cast("double"))
          .as("purity"))
  }
}
