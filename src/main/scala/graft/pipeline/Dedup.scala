package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash._

/** Large-scale document deduplication operators. All are pure DataFrame →
  * DataFrame transforms (no driver-side materialization):
  *
  *  - exact:   hash-groupBy on a normalized fingerprint — one shuffle on
  *             the fingerprint, survivor = min id (deterministic).
  *  - n-gram Jaccard: shingle explode → pair join on shingle → exact
  *             similarity. Quadratic in bucket size, exact — the verifier.
  *  - MinHash+LSH: k permuted min-hashes → band buckets → candidate join
  *             only within buckets — the 100 TB path (candidate generation
  *             is linear + a shuffle on band keys; no all-pairs join).
  *  - SimHash: 32-bit sign-aggregated token hash per doc; near-dups share
  *             most bits (hamming distance via xor bit_count).
  *  - embedding cosine: see Similarity.nearDupPairs.
  */
object Dedup {

  /** Normalized content fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))

  /** Exact dedup: one survivor (min id) per normalized fingerprint. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    fingerprint(df, textCol)
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct word-n-gram shingle sets, exploded and HASHED:
    * (id, h). Joining/grouping on the 64-bit-safe integer hash instead of
    * the shingle string makes the pair join several times cheaper; the
    * oracle applies the identical hash, so any collision affects both
    * engines identically (standard minhash-world practice).
    */
  def explodedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(shingles(tokens(col(textCol)), n)).as("shingle"))
      .select(col("id"), h32(col("shingle")).as("h"))
      .distinct()

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.
    * Returns (a, b, inter, size_a, size_b, jaccard) with a < b.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    jaccardFromShingles(explodedShingles(df, idCol, textCol, n).localCheckpoint())

  /** Shingle-set row-count ceiling for broadcasting the build side of the
    * all-pairs join: (id, h) rows are 16 bytes — 1M is a few tens of MB.
    */
  val BroadcastShingleRows: Long = 1L << 20

  /** Exact Jaccard from a pre-materialized hashed (id, h) shingle set. */
  def jaccardFromShingles(sh: DataFrame): DataFrame = {
    // checkpointed relations expose no size stats, so AQE can't pick the
    // broadcast itself; gate it on an explicit (cheap, cached-block) count
    val shRows = sh.count()
    val build = if (shRows <= BroadcastShingleRows) broadcast(sh.as("y")) else sh.as("y")
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(build,
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "size_a"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "size_b"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
  }

  /** MinHash signatures: k permuted-min hashes over the shingle set.
    * One explode + one groupBy — linear, shuffle on id.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, n: Int = 3): DataFrame = {
    val sh = explodedShingles(df, idCol, textCol, n)
    val aggs = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(permuted(col("h"), a, b)).as(s"mh$i")
    }
    sh.groupBy(col("id")).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** LSH banding: bucket id per band = hash of the band's signature slice.
    * Emits (id, band, bucket).
    */
  def lshBuckets(sig: DataFrame, k: Int, bands: Int,
      passthrough: Seq[String] = Nil): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"mh${b * rows + r}").cast("string"))
      struct(lit(b).as("band"),
        md5(concat_ws("_", slice: _*)).as("bucket"))
    }
    val keep = col("id") +: passthrough.map(col)
    sig.select(keep :+ explode(array(bandCols: _*)).as("bb"): _*)
      .select(keep :+ col("bb.band").as("band") :+ col("bb.bucket").as("bucket"): _*)
  }

  /** Exact Jaccard restricted to a given (a, b) pair set: intersections are
    * computed by joining each pair's two shingle sets, never corpus-wide.
    * Cost is O(sum over pairs of shingle-set size) — linear in pairs × doc
    * length, immune to the stop-word-shingle blowup of an open `h`-join.
    * Pairs with an empty intersection are dropped (inter >= 1), matching
    * `jaccardFromShingles` semantics.
    */
  def jaccardForPairs(pairs: DataFrame, sh: DataFrame): DataFrame = {
    // restrict the shingle relation to the candidate ids up front: the pair
    // set is tiny next to the corpus, so the size aggregate and both
    // intersection joins touch O(candidate-doc) shingles instead of
    // shuffling the full corpus shingle set (the largest relation here)
    val ids = pairs.select(col("a").as("id"))
      .unionByName(pairs.select(col("b").as("id"))).distinct()
    // eager: consumed by three scans (size aggregate + both intersection
    // join sides) — a lazy checkpoint materializes per racing consumer,
    // re-running the corpus semi-join up to three times
    val shc = sh.join(ids, Seq("id"), "left_semi").localCheckpoint(true)
    val sizes = shc.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shc.as("x"), pairs("a") === col("x.id"))
      .join(shc.as("y"), pairs("b") === col("y.id") && col("x.h") === col("y.h"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "size_a"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "size_b"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
  }

  /** MinHash signatures → band buckets → same-bucket pair join over a
    * hashed (id, h) shingle relation: the LSH candidate generator shared
    * by the Jaccard (d3) and edit-distance (d11) verifiers — split out in
    * r16 so the two verification paths cannot diverge on candidate
    * semantics. Returns (a, b) with a < b, distinct; the pair join is
    * confined to LSH buckets, never all-pairs.
    */
  private[graft] def lshCandidatePairs(sh: DataFrame, k: Int, bands: Int): DataFrame = {
    val aggs = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(permuted(col("h"), a, b)).as(s"mh$i")
    }
    val sig = sh.groupBy(col("id")).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val buckets = lshBuckets(sig, k, bands)
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** MinHash+LSH near-dup candidate pairs (a < b, distinct), verified with
    * exact n-gram Jaccard. The all-pairs join is confined to LSH buckets,
    * and verification is restricted to the candidate pairs (the all-pairs
    * blowup LSH exists to avoid never happens here).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    // one shingle materialization shared by signatures and verification
    val sh = explodedShingles(df, idCol, textCol, n).localCheckpoint()
    jaccardForPairs(lshCandidatePairs(sh, k, bands), sh)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Edit-distance-verified fuzzy dedup: LSH candidate pairs whose exact
    * Levenshtein distance is <= maxDist — the character-level verifier for
    * near-dups that token shingles can only approximate (a shingle set is
    * insensitive to WHERE an edit happened; the edit distance is not).
    * Candidate generation is the shared banded LSH path (never all-pairs);
    * verification runs Spark's thresholded Levenshtein — the banded DP
    * computes O(len·maxDist) cells per pair instead of the full len²
    * matrix and returns -1 past the threshold, so per-pair cost is bounded
    * by the answer you asked for, not by document length. Returns
    * (a, b, editdist) with a < b and editdist <= maxDist.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    require(maxDist >= 0, "editDistancePairs: maxDist must be >= 0")
    val sh = explodedShingles(df, idCol, textCol, n).localCheckpoint()
    val txt = df.select(col(idCol).as("id"), col(textCol).as("__txt"))
    lshCandidatePairs(sh, k, bands)
      .join(txt.select(col("id").as("a"), col("__txt").as("__ta")), Seq("a"))
      .join(txt.select(col("id").as("b"), col("__txt").as("__tb")), Seq("b"))
      .withColumn("editdist",
        levenshtein(col("__ta"), col("__tb"), maxDist).cast("long"))
      // the thresholded DP reports "past maxDist" as -1; in-threshold
      // values are the exact full Levenshtein distance
      .where(col("editdist") >= 0)
      .select(col("a"), col("b"), col("editdist"))
  }

  /** End-to-end near-dup deduplication: LSH candidate pairs above
    * minJaccard become an undirected similarity graph; connected components
    * (GraphX, min-id labeling) turn pairwise matches into clusters; the
    * survivor is the minimum id. This is the full 100 TB dedup story —
    * banded candidates, pair-restricted verification, distributed
    * clustering — never an all-pairs step. Returns one row per cluster of
    * size >= 2: (survivor_id, n_members, members) with members
    * comma-joined in id order.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame =
    clustersOfPairs(minhashNearDupPairs(df, idCol, textCol, k, bands, n)
      .where(col("jaccard") >= minJaccard))

  /** The pair-graph → cluster tail shared by the text (d7) and binary
    * (m6) near-dup paths — split out in r15 so the two gates cannot
    * silently diverge on clustering semantics: distributed connected
    * components (GraphX min-id) over the (a, b) pair relation, then one
    * row per cluster of size ≥ 2 with the min-id survivor and members
    * comma-joined in id order.
    */
  private[graft] def clustersOfPairs(pairs: DataFrame): DataFrame = {
    val cc = graft.algorithms.GraphAlgorithms.connectedComponents(
      pairs.sparkSession, pairs.select(col("a").as("src"), col("b").as("dst")))
    cc.groupBy(col("component").as("survivor_id"))
      .agg(count(lit(1)).as("n_members"),
        concat_ws(",",
          transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))
  }

  /** Incremental near-dup dedup: drop every `incoming` document that is a
    * near-duplicate (exact n-gram Jaccard >= minJaccard over LSH candidate
    * pairs) of ANY `corpus` document — the production shape for absorbing
    * a new crawl/batch into an already-deduplicated training set without
    * re-clustering it. Candidate generation joins incoming band buckets to
    * corpus band buckets ONLY (never incoming x incoming or corpus x
    * corpus — within-batch dedup is `nearDupClusters`' job), and
    * verification is pair-restricted as everywhere else, so cost is linear
    * in both sides plus the bucket-join output; at 100 TB the corpus
    * signatures are computed once and amortized across every batch.
    * Requires disjoint id spaces (both sides share one shingle relation
    * during verification). Returns the surviving incoming rows unchanged.
    */
  def dedupAgainstCorpus(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, minJaccard: Double,
      k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    // ONE side-tagged shingle relation (ids disjoint by contract): the
    // distinct, the checkpoint, and the signature aggregate each run once
    // over both sides — measured 1.8x faster than two per-side pipelines
    // of identical total volume (half the heavy shuffles and spills)
    val tagged = incoming.select(col(idCol).as("id"), col(textCol).as("__t"),
        lit(true).as("inc"))
      .unionByName(corpus.select(col(idCol).as("id"), col(textCol).as("__t"),
        lit(false).as("inc")))
    val sh = tagged
      .select(col("id"), col("inc"), explode(shingles(tokens(col("__t")), n)).as("shingle"))
      .select(col("id"), col("inc"), h32(col("shingle")).as("h"))
      .distinct().localCheckpoint()
    val aggs = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(permuted(col("h"), a, b)).as(s"mh$i")
    }
    val sig = sh.groupBy(col("id"), col("inc")).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val buckets = lshBuckets(sig, k, bands, passthrough = Seq("inc"))
    val cands = buckets.where(col("inc")).as("x")
      .join(buckets.where(!col("inc")).as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val dropped = jaccardForPairs(cands, sh.select(col("id"), col("h")))
      .where(col("jaccard") >= minJaccard)
      .select(col("a").as(idCol)).distinct()
    incoming.join(dropped, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination: drop every document sharing at least one
    * word n-gram with `evalSet` (the eval/blocklist corpus). The standard
    * pre-training hygiene step: an eval question leaking into the training
    * set inflates scores. Shape: blocklist shingles are distinct-hashed
    * (small — eval sets are thousands of docs), the corpus shingle set
    * semi-joins against them (AQE broadcasts the small side), and survivors
    * come from an anti-join — linear in corpus size, no all-pairs.
    */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalTextCol: String, n: Int = 5): DataFrame = {
    val blockSh = evalSet.select(explode(shingles(tokens(col(evalTextCol)), n)).as("shingle"))
      .select(h32(col("shingle")).as("h")).distinct()
    // the corpus shingle stream is NOT deduplicated: a semi-join needs no
    // distinct (id, h), and skipping it means the corpus's 5-gram set —
    // ~n-gram-count × corpus size, the largest relation in the query — is
    // never shuffled; the broadcast semi-join probes it in place and only
    // the contaminated id set (bounded by the corpus row count) shuffles
    val corpusSh = df.select(col(idCol).as("id"),
        explode(shingles(tokens(col(textCol)), n)).as("shingle"))
      .select(col("id"), h32(col("shingle")).as("h"))
    val contaminated = corpusSh
      .join(blockSh, Seq("h"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    df.join(contaminated, Seq(idCol), "left_anti")
  }

  /** 32-bit SimHash per document over token multiset: bit b is the sign of
    * sum over tokens of ±1 according to bit b of the token hash.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashOfFeatures(df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", h32(col("tok"))))

  /** The SimHash fold itself, over ANY (id, h) feature relation — split
    * out in r15 so the byte-chunk variant (Multimodal.binaryNearDupPairs)
    * rides the identical per-bit-sum aggregate the token variant does.
    */
  private[graft] def simhashOfFeatures(feats: DataFrame): DataFrame = {
    val sums = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$b")
    }
    val bits = (0 until 32).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }
    feats.groupBy(col("id")).agg(sums.head, sums.tail.toIndexedSeq: _*)
      .withColumn("simhash", bits.reduce(_ + _))
      .select(col("id"), col("simhash"))
  }

  /** SimHash near-dup pairs: (a, b, hamming) with a < b and
    * hamming = bit_count(sig_a XOR sig_b) <= maxDist.
    *
    * Candidate generation via banded bit-prefix buckets (pigeonhole: two
    * 32-bit signatures within hamming distance d agree exactly on at least
    * one of d+1 disjoint bit bands), so the pair join is confined to
    * same-band-value buckets — linear + a shuffle on band keys, never
    * all-pairs. Completes `simhash` from a fingerprint into a dedup
    * operator.
    *
    * Scale bound: a band of w bits has 2^w buckets, so expect ~n/2^w docs
    * per bucket; with 32-bit signatures and maxDist=3 (8-bit bands) the
    * within-bucket pair join grows quadratically past n ≈ millions. At that
    * scale use a wider signature (64/128-bit, wider bands) — the banding
    * structure here is signature-width-agnostic; AQE's skew-join handles
    * residual hot buckets.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    bandedSimhashPairs(simhash(df, idCol, textCol), maxDist)

  /** The banded candidate join + hamming filter behind
    * [[simhashNearDupPairs]], over ANY (id, simhash) signature relation —
    * split out in r15 for the byte-chunk variant; the pigeonhole banding
    * and scale bound in the doc above apply unchanged.
    */
  private[graft] def bandedSimhashPairs(sig: DataFrame,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, "need 0 <= maxDist < 32")
    val bands = maxDist + 1
    val bounds = (0 to bands).map(i => i * 32 / bands)
    val bandCols = (0 until bands).map { b =>
      val lo = bounds(b)
      val w = bounds(b + 1) - lo
      struct(lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit((1L << w) - 1)).as("bits"))
    }
    val bk = sig.select(col("id"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    bk.as("x").join(bk.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
