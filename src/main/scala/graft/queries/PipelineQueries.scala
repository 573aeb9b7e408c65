package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Clustering, Dedup, Multimodal, Similarity, TextAnalysis, TextHash}
import graft.store.Tables

/** Training-data pipeline operators proven against the DuckDB oracle:
  * dedup (exact / n-gram Jaccard / MinHash+LSH / SimHash / embedding),
  * similarity search (brute-force + LSH ANN), text analysis (langid,
  * quality, token stats, fingerprints), multimodal binary plumbing.
  * The oracle SQL re-implements every hash (TextHash.h32 == md5-prefix
  * parse) and every accumulation in the same order, so results hash-match
  * bit-for-bit.
  */
object PipelineQueries {
  import TextHash._

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Little-endian hex rendering of an integer column at a fixed byte
    * width — the m8 craft-side mirror of Multimodal.leUInt (byte pairs of
    * the zero-padded big-endian hex, reversed). */
  private def leHex(v: Column, bytes: Int): Column = {
    val h = lpad(hex(v), bytes * 2, "0")
    concat((bytes - 1 to 0 by -1).map(i => substring(h, i * 2 + 1, 2)): _*)
  }

  private val K = 16
  private val BANDS = 4
  private val NGRAM = 3

  /** Shared m4/m6 oracle prefix — the byte-chunk SimHash signature
    * replay (16-byte chunks of the hex rendering, h32 features, 32
    * per-bit sums, sign fold). One string so the two gates can never
    * disagree on the signature construction.
    */
  private lazy val byteSimhashSigCtes: String =
    s"""f AS (
       |  SELECT doc_id AS id, hex(text) AS hx,
       |    unnest(range(0, CAST(ceil(strlen(text)/16.0) AS BIGINT))) AS i
       |  FROM documents
       |),
       |toks AS (
       |  SELECT id, ${h32Sql("substring(hx, i*32+1, 32)")} AS h FROM f
       |),
       |sums AS (
       |  SELECT id, ${(0 until 32).map(b =>
            s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n    ")}
       |  FROM toks GROUP BY id
       |),
       |sig AS (
       |  SELECT id, ${(0 until 32).map(b =>
            s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")} AS simhash
       |  FROM sums
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .orderBy(col("keep_id"))),

    "d2_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", NGRAM)
        .select(col("a"), col("b"), col("inter"), col("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(20)),

    "d3_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(docs(s, dir), "doc_id", "text", K, BANDS, NGRAM)
        .orderBy(col("a"), col("b"))),

    "d4_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text")
        .orderBy(col("id"))),

    "d7_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(docs(s, dir), "doc_id", "text", 0.5, K, BANDS, NGRAM)
        .orderBy(col("survivor_id"))),

    "d6_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(docs(s, dir), "doc_id", "text", 3)
        .orderBy(col("a"), col("b"))),

    // incremental dedup: absorb a "new batch" (doc_id % 10 = 3) into the
    // existing corpus (the rest) — survivors are incoming docs with no
    // >= 0.5-Jaccard LSH match in the corpus.
    "d10_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.dedupAgainstCorpus(
          d.where(col("doc_id") % 10 === 3),
          d.where(col("doc_id") % 10 =!= 3),
          "doc_id", "text", 0.5, K, BANDS, NGRAM)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Edit-distance-verified fuzzy dedup (r16): the d3 LSH candidates with
    // the Jaccard verifier swapped for Spark's thresholded Levenshtein —
    // character-exact near-dup confirmation (both engines compute standard
    // Levenshtein; the threshold prunes bucket-collision candidates to -1
    // map-side). Gate-budget rule: the NEW operator is the verify pass, so
    // the gate rides a half corpus (doc_id % 2 = 1) — the LSH family's
    // full-corpus price is already on the board as d3.
    // ORACLE-PARITY DOMAIN (r16 ADVICE): Spark counts Levenshtein edits in
    // Unicode CODE POINTS (spec-pinned in PipelineSpec); a byte-oriented
    // oracle implementation could disagree on multi-byte text. The
    // generated corpus is ASCII-only, and the guard below makes that
    // assumption LOUD — if the corpus ever gains multi-byte characters the
    // gate raises instead of silently hash-mismatching. The guard is an
    // identity on ASCII, so the green gate's values are untouched.
    "d11_editdist_verify" -> ((s, dir) =>
      Dedup.editDistancePairs(
          docs(s, dir).where(col("doc_id") % 2 === 1)
            .withColumn("text",
              // NULL text passes through (a NULL comparison would fall to
              // the otherwise branch and blame "non-ASCII" for a missing
              // value — r17 review); only genuinely multi-byte text trips
              when(col("text").isNull ||
                  length(col("text")) === octet_length(col("text")),
                  col("text"))
                .otherwise(raise_error(lit("d11_editdist_verify: non-ASCII " +
                  "text — Spark (code points) and a byte-oriented oracle " +
                  "Levenshtein may disagree; re-pin the parity domain")))),
          "doc_id", "text", 16, K, BANDS, NGRAM)
        .orderBy(col("a"), col("b"))),

    "d5_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(embs(s, dir), "vec_id", "embedding", -1.0)
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)),

    "e1_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 10)
        .orderBy(col("pid"), col("rank"))),

    "e2_ann_lsh" -> ((s, dir) =>
      Similarity.annTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 5, 8)
        .orderBy(col("pid"), col("rank"))),

    // kNN-graph construction (r17): the standard embeddings -> graph
    // bridge — every vector keeps its 5 nearest bucket-mates (the e2 LSH
    // confinement, corpus-to-corpus), symmetrized to an undirected edge
    // relation with the e1-class cosine snapped to the exact w_ppm
    // integer grid. Output feeds louvainLevels(weightCol) directly (the
    // d7 -> g51 bridge as ONE operator; AlgorithmsSpec runs that
    // composition). Hashed columns are ids + the grid snap — the
    // sanctioned integer class; the FP sim itself stays un-hashed.
    "e12_knn_graph" -> ((s, dir) =>
      Similarity.knnGraphEdges(embs(s, dir), "vec_id", "embedding", 5, 8)
        .orderBy(col("src"), col("dst"))),

    // Radius (range) similarity search (r12): every corpus vector within
    // cosine >= 0.25 of probes 0/1/2 — e1's scan shape with the ranking
    // window replaced by a map-side threshold filter. The hashed `sim`
    // doubles reuse e1's driver-proven sequential-fold cosine, and the
    // threshold compares the SAME doubles on both engines, so the row
    // sets cannot diverge.
    "e9_radius_search" -> ((s, dir) =>
      Similarity.radiusSearch(embs(s, dir), "vec_id", "embedding",
          Seq(0L, 1L, 2L), 0.25)
        .orderBy(col("pid"), col("cid"))),

    // MMR diversity re-rank (r12): greedy maximal-marginal-relevance over
    // each probe's top-20 cosine pool, k=5, lambda = 1/2 (a power of two,
    // so the score arithmetic is bit-identical across engines). The pool
    // and its pairwise cosines run distributed; the greedy runs over the
    // bounded collected pool.
    "e10_mmr" -> ((s, dir) =>
      Similarity.mmrTopK(embs(s, dir), "vec_id", "embedding",
          Seq(0L, 1L, 2L), 5)
        .orderBy(col("pid"), col("rank"))),

    "t1_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir), "text")
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted_lang"))),

    "t2_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"), col("alpha_ratio"), col("quality_score"))
        .orderBy(col("quality_score").desc, col("doc_id"))
        .limit(20)),

    "t3_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(docs(s, dir), "text", "source")
        .orderBy(col("source"))),

    "t4_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir), "doc_id", "text", 5)
        .orderBy(col("id"))),

    // Per-source vocabulary report (r8): corpus-wide type/token totals,
    // TTR, top-5 terms - the curation dashboard a mixture designer reads
    // before weighting sources (exact ints + ONE final division; the
    // top-k window partitions per source, never globally).
    "t16_vocabulary" -> ((s, dir) =>
      TextAnalysis.vocabularyReport(docs(s, dir), "text", "source", 5)
        .orderBy(col("source"), col("rank"))),

    // Count-Min heavy hitters (r12): 4x256 integer counters over the
    // corpus token stream, point-estimating the exact top-10 tokens with
    // the true count in-row — the sketch family for per-key counting at
    // stream scale, all COUNT/MIN integer arithmetic.
    "t18_countmin" -> ((s, dir) =>
      TextAnalysis.countMinTopTokens(docs(s, dir), "text", 10)
        .orderBy(col("rank"))),

    // Corpus-unigram rarity score (r10; integer-pure r12): the
    // LM-perplexity filter shape with the corpus as its own unigram
    // model, hashed through its exact LONG twin — n_tokens plus
    // rarity = Σ k·(10^12 div cnt) — after two rounds proved ln-derived
    // hashed integers diverge on the driver's DuckDB. The FP NLL path
    // (unigramNll) keeps its PipelineSpec hand-computed pin and the
    // PlanAudit shuffle contract.
    "t17_unigram_nll" -> ((s, dir) =>
      TextAnalysis.unigramRarity(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Bigram interpolated rarity (r19, the r18 verdict's #3 ask): the
    // LM-quality signal one step past t17's unigram — per-doc Σ k·w with
    // w the exact integer inverse of the per-mille-interpolated bigram
    // probability (λ = 700‰ against the unigram floor). Pure integers,
    // fully hash-checked; the overflow guards are loud (pivotStress).
    "t23_bigram_nll" -> ((s, dir) =>
      TextAnalysis.bigramRarity(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "m1_multimodal" -> ((s, dir) =>
      Multimodal.featureStats(docs(s, dir))
        .orderBy(col("source"))),

    "t5_bpe_tokens" -> ((s, dir) =>
      TextAnalysis.bpeTokenStats(docs(s, dir), "text", "source")
        .orderBy(col("source"))),

    // Real BPE tokenization (r13; t5 stays as the cheap estimator): the
    // frozen 24-merge table — learned from this corpus by
    // learnBpeMerges, multi-level merges included — applied per piece
    // through the spaced-symbol replace chain; token counts are exact
    // under the table, not a length heuristic.
    "t19_bpe_real" -> ((s, dir) =>
      TextAnalysis.bpeRealTokenStats(docs(s, dir), "text", "source")
        .orderBy(col("source"))),

    // decontamination: docs 0..4 act as the leaked eval set; count the
    // corpus that survives removing every doc sharing a 5-gram with them.
    "d8_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d, "doc_id", "text",
          d.where(col("doc_id") < 5), "text", 5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
        .orderBy(col("source"))
    }),

    // the full curation pipeline in one gate: language filter -> quality
    // threshold -> exact dedup -> per-source stats. Every stage is one of
    // the proven operators; the composition is what a real pre-training
    // data run executes.
    "d9_curation" -> ((s, dir) => {
      val scored = TextAnalysis.quality(
        TextAnalysis.langId(docs(s, dir), "text"), "text")
      val filtered = scored.where(
        col("predicted_lang") === "en" && col("quality_score") >= 0.5)
      val keep = Dedup.exact(filtered, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      filtered.join(keep, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("source"))
    }),

    "t6_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", 5)
        .where(col("id") < 20)
        .orderBy(col("id"), col("rank"))),

    "m2_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "payload", 16, 4)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("frame_bytes")).as("frame_bytes_total"))
        .orderBy(col("source"))),

    // Binary metadata extraction (r15): payloads carry REAL PNG/JPEG
    // headers crafted deterministically from doc_id (width/height are
    // doc_id arithmetic, text bytes as the body), so the gate checks the
    // full encode -> sniff -> header-parse round trip: the engine must
    // recover exactly the dimensions the arithmetic put in. The oracle
    // replays the arithmetic identity — any misread offset, endianness
    // slip, or marker-walk bug breaks the hash. unknown (raw text)
    // payloads keep NULL dims.
    "m3_binary_meta" -> ((s, dir) => {
      val w = (col("doc_id") % 800 + 16).cast("long")
      val h = (col("doc_id") * 7 % 600 + 16).cast("long")
      val text = col("text").cast("binary")
      val png = concat(
        unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
        unhex(lpad(hex(w), 8, "0")), unhex(lpad(hex(h), 8, "0")),
        unhex(lit("0806000000" + "1F15C489")), text)
      val jpeg = concat(
        unhex(lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00"
          + "0001" + "0001" + "00" + "00" + "FFC0" + "000B" + "08")),
        unhex(lpad(hex(h), 4, "0")), unhex(lpad(hex(w), 4, "0")),
        unhex(lit("01" + "011100")), text)
      val payload = when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, jpeg)
        .otherwise(text)
      Multimodal.binaryMeta(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // Audio metadata extraction (r15): the m3 pattern for WAV — payloads
    // carry REAL canonical RIFF/WAVE headers (44 bytes, little-endian
    // fmt chunk) crafted from doc_id arithmetic; the engine must read
    // channels/rate/bits back out of the LE bytes, the oracle replays
    // the arithmetic identity. Odd doc_ids stay raw text -> NULL fields.
    "m5_audio_meta" -> ((s, dir) => {
      def le16(v: Column): Column = {
        val h = lpad(hex(v), 4, "0")
        concat(substring(h, 3, 2), substring(h, 1, 2))
      }
      def le32(v: Column): Column = {
        val h = lpad(hex(v), 8, "0")
        concat(substring(h, 7, 2), substring(h, 5, 2),
          substring(h, 3, 2), substring(h, 1, 2))
      }
      val ch = (col("doc_id") % 4 + 1).cast("long")
      val rate = ((col("doc_id") % 5 + 1) * 8000).cast("long")
      val bps = (col("doc_id") % 3 + 1).cast("long") // bytes/sample
      val text = col("text").cast("binary")
      val wav = concat(
        lit("RIFF").cast("binary"), unhex(le32(lit(36L) + length(text))),
        lit("WAVEfmt ").cast("binary"), unhex(lit("10000000" + "0100")),
        unhex(le16(ch)), unhex(le32(rate)),
        unhex(le32(rate * ch * bps)), unhex(le16(ch * bps)),
        unhex(le16(bps * 8)),
        lit("data").cast("binary"), unhex(le32(length(text))), text)
      val payload = when(col("doc_id") % 2 === 0, wav).otherwise(text)
      Multimodal.audioMeta(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // Binary near-duplicate pairs (r15): the d6 SimHash banding applied
    // to byte chunks — 16-byte payload frames hashed via their hex
    // rendering, folded to a 32-bit signature, band-bucketed candidates,
    // hamming <= 3. Same payloads as m1/m2 (text bytes), so near-dup
    // DOCUMENTS surface as near-dup BINARIES.
    "m4_binary_neardup" -> ((s, dir) =>
      Multimodal.binaryNearDupPairs(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", 16, 3)
        .orderBy(col("a"), col("b"))),

    // Perceptual image near-dup (r19, the r18 verdict's #5 ask — m4/m6's
    // byte simhash misses re-encoded images): RAWG raw-bitmap payloads
    // crafted from doc_id arithmetic — group g = doc_id div 50 fixes the
    // grid (w, h) and gradient pattern; CLEAN docs (doc_id % 10 < 2)
    // carry only the group pattern plus a per-doc BRIGHTNESS base, which
    // dHash's neighbor comparisons cancel, so clean same-group docs
    // collide at hamming 0 while dirty docs mix doc_id into the pattern;
    // doc_id % 7 == 3 stays raw text (NULL dhash, never pairs). The
    // oracle replays the sample-position arithmetic identity (the m3
    // convention) — any misread offset or sampling slip breaks the hash.
    "m11_image_neardup" -> ((s, dir) => {
      val g = expr("doc_id div 50")
      val w = (g % 7 + 18).cast("long")
      val h = (g % 5 + 16).cast("long")
      val m1 = (g % 5 + 2) +
        when(expr("doc_id % 10") < 2, lit(0L)).otherwise(expr("doc_id % 13 + 1"))
      val m2 = g % 3 + 1
      val bb = expr("doc_id % 40")
      val body = unhex(array_join(transform(sequence(lit(0L), w * h - 1),
        i => lpad(hex((((i % w) * m1 + (i / w).cast("long") * m2) % 23) * 8
          + bb), 2, "0")), ""))
      val rawg = concat(lit("RAWG").cast("binary"),
        unhex(lpad(hex(w), 4, "0")), unhex(lpad(hex(h), 4, "0")), body)
      val payload = when(col("doc_id") % 7 === 3, col("text").cast("binary"))
        .otherwise(rawg)
      // domain bounded to the first 1000 doc_ids (20 groups): payload
      // CRAFTING (a per-pixel HOF the oracle never pays — it replays the
      // arithmetic) dominates the gate's cost, and 20 groups already
      // exercise every pattern/brightness/raw-text class (the gate-budget
      // rule; sf0.1 documents carry 5000 rows)
      Multimodal.dHashNearDupPairs(
          docs(s, dir).where(col("doc_id") < 1000)
            .select(col("doc_id"), payload.as("payload")),
          "doc_id", "payload", 3)
        .orderBy(col("a"), col("b"))
    }),

    // Binary near-dup clusters (r15): m4's pairs through distributed
    // connected components with a min-id survivor — the d7 clustering
    // shape on bytes; oracle = the m4 sig replay + the d7 transitive-
    // closure tail.
    "m6_binary_clusters" -> ((s, dir) =>
      Multimodal.binaryNearDupClusters(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", 16, 3)
        .orderBy(col("survivor_id"))),

    // Video metadata extraction (r16, completing the image/audio/video
    // triad): the m3/m5 encode -> parse identity for MP4/ISO-BMFF —
    // payloads carry REAL box trees (ftyp, a top-level free box, then
    // moov{free, mvhd}) with timescale/duration from doc_id arithmetic,
    // in BOTH mvhd versions: v0 (BE32 times, doc_id % 4 == 0) and v1
    // (64-bit times push timescale/duration 8 bytes deeper,
    // doc_id % 4 == 2). The free boxes force REAL walks at both levels;
    // odd doc_ids stay raw text -> NULL fields. The oracle replays the
    // arithmetic; the v0/v1 header-size split (68 vs 80 bytes) in
    // payload_bytes proves both version paths parsed.
    "m7_video_meta" -> ((s, dir) => {
      val tsv = ((col("doc_id") % 7 + 1) * 600).cast("long")
      val durv = (col("doc_id") % 90000 + 600).cast("long")
      val text = col("text").cast("binary")
      val ftypFree = unhex(lit("00000010" + "66747970" + "69736F6D"
        + "00000200" + "00000008" + "66726565"))
      val mp4v0 = concat(ftypFree,
        unhex(lit("0000002C" + "6D6F6F76" + "00000008" + "66726565"
          + "0000001C" + "6D766864" + "00000000" + "00000000" + "00000000")),
        unhex(lpad(hex(tsv), 8, "0")), unhex(lpad(hex(durv), 8, "0")), text)
      val mp4v1 = concat(ftypFree,
        unhex(lit("00000038" + "6D6F6F76" + "00000008" + "66726565"
          + "00000028" + "6D766864" + "01000000"
          + "0000000000000000" + "0000000000000000")),
        unhex(lpad(hex(tsv), 8, "0")), unhex(lpad(hex(durv), 16, "0")), text)
      val payload = when(col("doc_id") % 4 === 0, mp4v0)
        .when(col("doc_id") % 4 === 2, mp4v1)
        .otherwise(text)
      Multimodal.videoMeta(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // WAV duration read-off (r16): m5's fixed-offset fmt parse extended
    // with a REAL RIFF chunk walk — a 5-byte LIST chunk (odd size, so
    // the word-alignment pad rule is on the hashed path) sits between
    // fmt and data, forcing the walk to step by size instead of
    // assuming the canonical offset 37. duration_ms finishes as the
    // exact integer (data_bytes * 1000) div byte_rate; odd doc_ids stay
    // raw text -> NULL fields.
    "m8_audio_duration" -> ((s, dir) => {
      val ch = (col("doc_id") % 4 + 1).cast("long")
      val rate = ((col("doc_id") % 5 + 1) * 8000).cast("long")
      val bps = (col("doc_id") % 3 + 1).cast("long") // bytes/sample
      val text = col("text").cast("binary")
      val wav = concat(
        lit("RIFF").cast("binary"), unhex(leHex(lit(50L) + length(text), 4)),
        lit("WAVEfmt ").cast("binary"), unhex(lit("10000000" + "0100")),
        unhex(leHex(ch, 2)), unhex(leHex(rate, 4)),
        unhex(leHex(rate * ch * bps, 4)), unhex(leHex(ch * bps, 2)),
        unhex(leHex(bps * 8, 2)),
        lit("LIST").cast("binary"), unhex(leHex(lit(5L), 4)),
        lit("INFOx").cast("binary"), unhex(lit("00")), // 5 bytes + 1 pad
        lit("data").cast("binary"), unhex(leHex(length(text), 4)), text)
      val payload = when(col("doc_id") % 2 === 0, wav).otherwise(text)
      Multimodal.audioDuration(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // JPEG EXIF metadata (r17): the curation fields multimodal ingest
    // actually needs (orientation, capture timestamp) — the m3/m5/m7
    // encode -> parse identity for the APP1/Exif TIFF IFD walk, in BOTH
    // byte orders: "II" little-endian (doc_id % 4 == 0) and "MM"
    // big-endian (doc_id % 4 == 2). A JFIF APP0 before the APP1 forces a
    // real marker walk; a Make entry before orientation/DateTime forces a
    // real entry scan; DateTime is an out-of-line ASCII value reached
    // through the offset field. Odd doc_ids stay raw text -> NULL fields.
    "m9_exif_meta" -> ((s, dir) => {
      val orient = (col("doc_id") % 8 + 1).cast("long")
      val dt = concat(
        (col("doc_id") % 26 + 2000).cast("string"), lit(":"),
        lpad((col("doc_id") % 12 + 1).cast("string"), 2, "0"), lit(":"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"), lit(" "),
        lpad((col("doc_id") % 24).cast("string"), 2, "0"), lit(":"),
        lpad((col("doc_id") * 7 % 60).cast("string"), 2, "0"), lit(":"),
        lpad((col("doc_id") * 13 % 60).cast("string"), 2, "0"))
      val text = col("text").cast("binary")
      // SOI + a 16-byte JFIF APP0 (the walk distractor)
      val soiApp0 = unhex(lit("FFD8" + "FFE0" + "0010" + "4A46494600"
        + "0101" + "00" + "00480048" + "0000"))
      // APP1(LL=0x4E): Exif\0\0 + TIFF header + 3-entry IFD0
      // (Make inline "GFT\0" distractor, Orientation SHORT, DateTime
      // ASCII via offset 50) + next-IFD 0 + 20-byte datetime string
      val jpegII = concat(soiApp0,
        unhex(lit("FFE1" + "004E" + "457869660000"
          + "49492A00" + "08000000" + "0300"
          + "0F010200" + "04000000" + "47465400"
          + "12010300" + "01000000")),
        unhex(leHex(orient, 2)), unhex(lit("0000")),
        unhex(lit("32010200" + "14000000" + "32000000" + "00000000")),
        dt.cast("binary"), unhex(lit("00")), text)
      val jpegMM = concat(soiApp0,
        unhex(lit("FFE1" + "004E" + "457869660000"
          + "4D4D002A" + "00000008" + "0003"
          + "010F0002" + "00000004" + "47465400"
          + "01120003" + "00000001")),
        unhex(lpad(hex(orient), 4, "0")), unhex(lit("0000")),
        unhex(lit("01320002" + "00000014" + "00000032" + "00000000")),
        dt.cast("binary"), unhex(lit("00")), text)
      val payload = when(col("doc_id") % 4 === 0, jpegII)
        .when(col("doc_id") % 4 === 2, jpegMM)
        .otherwise(text)
      Multimodal.exifMeta(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // MP4 track dimensions (r18, the r17 verdict's m10 ask): the m7
    // encode -> parse identity one walk level deeper — moov{free,
    // trak{free, tkhd}} in BOTH tkhd versions (v0: 16.16 width/height at
    // +84/+88, doc_id % 4 == 0; v1's widened times push them to +96/+100,
    // doc_id % 4 == 2), dimensions from doc_id arithmetic encoded as
    // value << 16. The free boxes force REAL walks at both levels; odd
    // doc_ids stay raw text -> NULL fields. The oracle replays the
    // arithmetic; the v0/v1 header-size split (148 vs 160 bytes) in
    // payload_bytes pins that both version paths parsed.
    "m10_track_dims" -> ((s, dir) => {
      val wv = (col("doc_id") % 640 + 16).cast("long")
      val hv = (col("doc_id") % 480 + 9).cast("long")
      val text = col("text").cast("binary")
      val ftypFree = unhex(lit("00000010" + "66747970" + "69736F6D"
        + "00000200" + "00000008" + "66726565"))
      val mp4v0 = concat(ftypFree,
        unhex(lit("0000007C" + "6D6F6F76" + "00000008" + "66726565"
          + "0000006C" + "7472616B" + "00000008" + "66726565"
          + "0000005C" + "746B6864" + "00000000" + "00" * 72)),
        unhex(lpad(hex(wv * 65536), 8, "0")),
        unhex(lpad(hex(hv * 65536), 8, "0")), text)
      val mp4v1 = concat(ftypFree,
        unhex(lit("00000088" + "6D6F6F76" + "00000008" + "66726565"
          + "00000078" + "7472616B" + "00000008" + "66726565"
          + "00000068" + "746B6864" + "01000000" + "00" * 84)),
        unhex(lpad(hex(wv * 65536), 8, "0")),
        unhex(lpad(hex(hv * 65536), 8, "0")), text)
      val payload = when(col("doc_id") % 4 === 0, mp4v0)
        .when(col("doc_id") % 4 === 2, mp4v1)
        .otherwise(text)
      Multimodal.trackMeta(
          docs(s, dir).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy(col("doc_id"))
    }),

    // FineWeb-style composite quality filter (r18, the r17 verdict's t22
    // ask): the operator a curation pipeline actually ends with — the
    // priced signals (t2 length/alpha, t7 repetition, t17 rarity, t20
    // PII, t21 urls) conjoined under exact integer thresholds into a
    // keep/drop verdict + fail bitmask. PII and URL spans are injected
    // (the t11/t20/t21 convention — the corpus carries none naturally):
    // doc_id % 9 == 4 gains an email+phone (n_pii 2 > 1 → bit 16),
    // doc_id % 9 == 7 gains two URLs (n_urls 2 > 1 → bit 32); thresholds
    // were picked against the measured sf0.01 distributions so the len /
    // alpha / repetition / rarity rules each fire on real docs too. The
    // digest is the per-source keep-rate dashboard: every column an
    // integer count.
    "t22_quality_filter" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text2",
        when(col("doc_id") % 9 === 4,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or call +1 555-0100.")))
          .when(col("doc_id") % 9 === 7,
            concat(col("text"), lit(" via https://spam"),
              (col("doc_id") % 5).cast("string"),
              lit(".example.com/x and http://track"),
              (col("doc_id") % 3).cast("string"),
              lit(".example.net/y")))
          .otherwise(col("text")))
      TextAnalysis.qualityFilter(d, "doc_id", "text2",
          minTokens = 16L, maxTokens = 96L, alphaPermille = 810L,
          dupTriPermille = 40L, rarityPerTokenCap = 1300000000L,
          maxPii = 1L, maxUrls = 1L)
        .join(docs(s, dir).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(when(col("keep"), col("n_tokens"))).as("tokens_kept"),
          sum(when(col("fail_mask").bitwiseAND(1L) > 0, 1L).otherwise(0L))
            .as("n_fail_len"),
          sum(when(col("fail_mask").bitwiseAND(2L) > 0, 1L).otherwise(0L))
            .as("n_fail_alpha"),
          sum(when(col("fail_mask").bitwiseAND(4L) > 0, 1L).otherwise(0L))
            .as("n_fail_rep"),
          sum(when(col("fail_mask").bitwiseAND(8L) > 0, 1L).otherwise(0L))
            .as("n_fail_rare"),
          sum(when(col("fail_mask").bitwiseAND(16L) > 0, 1L).otherwise(0L))
            .as("n_fail_pii"),
          sum(when(col("fail_mask").bitwiseAND(32L) > 0, 1L).otherwise(0L))
            .as("n_fail_url"))
        .orderBy(col("source"))
    }),

    "t7_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
        .orderBy(col("id")).limit(25)),

    "t8_mixture" -> ((s, dir) =>
      TextAnalysis.mixtureWeights(docs(s, dir), "source", "text", 1000000L)
        .orderBy(col("source"))),

    // Product-quantization ANN (r18, the r17 verdict's e13 ask): 4
    // subspaces of the 64-dim embeddings, 8-entry codebooks trained by
    // the GROUPED exact-grid k-means (2 iterations — all four codebooks
    // in the same jobs), ADC distances as exact integer LUT sums. Codes,
    // LUT entries and ADC ranks are all integers — the whole
    // train->encode->search pipeline is hash-checked.
    "e13_pq_topk" -> ((s, dir) =>
      Clustering.pqTopK(embs(s, dir), "vec_id", "embedding",
          Seq(0L, 1L, 2L), 10)
        .orderBy(col("pid"), col("rank"))),

    // measured PQ quality (the e3 pattern): recall@5 of the ADC ranking
    // vs brute-force cosine — deterministic on both sides, so the
    // compression family's accuracy number is itself oracle-checked
    "e14_pq_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Clustering.pqTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5),
          5)
        .orderBy(col("pid"))),

    // IVFADC (r19, the r18 verdict's #2 ask): the IVF coarse quantizer
    // routes vectors to 8 lists, PQ encodes RESIDUALS (4 subspaces ×
    // 8 codes), probes scan their 2 nearest lists and rank by integer
    // ADC — the Jégou et al. composition lifting e14's unrouted-PQ
    // recall at bounded probe cost. All integers; fully hash-checked.
    "e15_ivfadc_topk" -> ((s, dir) =>
      Clustering.ivfadcTopK(embs(s, dir), "vec_id", "embedding",
          Seq(0L, 1L, 2L), 10, nLists = 8, nProbe = 2, m = 4, kCodes = 8)
        .orderBy(col("pid"), col("rank"))),

    // measured IVFADC quality (the e14 pattern): recall@5 of the FULL
    // search — ADC shortlist (top-64) + exact re-rank, the paper's
    // IVFADC+R — vs brute-force cosine. Sits at the 2-of-8-list routing
    // ceiling (1.0/1.0/0.6 at sf0.01), strictly above e14's unrouted
    // 0.2–0.4 while touching raw vectors for only 64 of ~125 scanned
    // candidates per probe; deterministic both sides, oracle-checked
    "e16_ivfadc_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Clustering.ivfadcTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5, nLists = 8, nProbe = 2, m = 4, kCodes = 8,
            rerank = 64),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5),
          5)
        .orderBy(col("pid"))),

    // measured ANN quality: recall@5 of the LSH search vs brute force —
    // deterministic on both sides, so the number itself is oracle-checked
    "e3_ann_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Similarity.annTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 5, 8),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 5),
          5)
        .orderBy(col("pid"))),

    // measured ANN quality for the multi-probe scale path (r5 verdict ask
    // #3): recall@5 vs brute force, deterministic on both sides — the
    // recall constant itself is oracle-checked, closing x9's rows-only gap
    "e5_multiprobe_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Similarity.annTopKMultiProbe(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5, 8),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5),
          5)
        .orderBy(col("pid"))),

    // measured ANN quality for the IVF scale path — closes x11's
    // rows-only gap the same way
    "e6_ivf_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Similarity.ivfTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5, 16, 4),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
            Seq(0L, 1L, 2L), 5),
          5)
        .orderBy(col("pid"))),

    // Exact-grid distributed k-means (r10): 3 Lloyd's rounds, k = 10,
    // deterministic init = the 10 lowest vec_ids. Every assignment,
    // centroid, and distance is integer arithmetic on the 10^-6 grid
    // (quantize once, integer argmin with cluster-id tie-break, half-up
    // integer-mean centroids), so the whole multi-iteration clustering
    // hash-matches the oracle's unrolled mirror — unreachable for float
    // k-means, whose sums reorder under shuffle.
    "e7_kmeans" -> ((s, dir) =>
      Clustering.kmeansQuantized(embs(s, dir), "vec_id", "embedding", 10, 3)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))),

    // Cluster-label purity over the e7 assignment (r12): does the exact-
    // grid clustering recover the embeddings' planted label structure?
    // Exact integer dominant/total counts per cluster + ONE final
    // division (the t16 pattern) keep the hash driver-safe.
    "e8_cluster_purity" -> ((s, dir) => {
      val asg = Clustering
        .kmeansQuantized(embs(s, dir), "vec_id", "embedding", 10, 3)
        .select(col("id"), col("cluster"))
      val lbl = embs(s, dir)
        .select(col("vec_id").cast("long").as("id"),
          col("label").cast("long").as("label"))
      Clustering.clusterPurity(asg, lbl).orderBy(col("cluster"))
    }),

    // SemDeDup (r16): semantic near-dup pruning — the e7 exact-grid
    // clustering confines the cosine verify join to within-cluster pairs
    // (the paper's Σ|cluster|² vs |corpus|² argument); dropped = any
    // vector with a smaller same-cluster id at cosine >= 0.35. Gate-budget
    // rule: rides the already-priced e7 assignment — the NEW cost is one
    // cluster-keyed pair join over 500 vectors.
    "e11_semdedup" -> ((s, dir) =>
      Clustering.semDedupDropped(embs(s, dir), "vec_id", "embedding", 10, 3, 0.35)
        .orderBy(col("cluster"), col("vec_id"))),

    // the mixture plan executed: deterministic hash sampling at the
    // allocated per-source rate, then the realized per-source footprint
    "t9_mixture_sample" -> ((s, dir) =>
      TextAnalysis.sampleByMixture(docs(s, dir), "doc_id", "source", "text", 1000000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text")))).as("tokens_kept"))
        .orderBy(col("source"))),

    // sequence packing: docs -> fixed-128-token training sequences inside
    // (source, shard) partitions; the packing arithmetic is exact
    "t10_packing" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), "doc_id", "source", "text", 128L, 4)
        .orderBy(col("source"), col("shard"), col("id"))
        .limit(30)),

    // Training-corpus emit manifest (r19, the r18 verdict's #6 ask — the
    // pipeline's last step, previously unpriced end-to-end): t9's mixture
    // sample -> t10's packing -> the per-(source, shard) receipt a
    // trainer consumes (n_docs, n_seqs, n_tokens, bit_xor h60 digest —
    // order-independent, so NO global sort exists anywhere; PlanAudit
    // pins the single (source, shard) exchange). Lives here (not
    // ExtraQueries) to share the t9/t10 oracle builders.
    "x39_emit_manifest" -> ((s, dir) =>
      TextAnalysis.emitManifest(docs(s, dir), "doc_id", "source", "text",
          1000000L, 128L, 4)
        .orderBy(col("source"), col("shard"))),

    // PII scrubbing: every 5th doc gets a deterministic injected email +
    // phone; the per-source checksum over the redacted text proves the
    // replacement output byte-for-byte, not just the match counts
    "t11_redaction" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text2",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or call +1 555-0100.")))
          .otherwise(col("text")))
      TextAnalysis.redactPii(d, "text2")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_emails")).as("emails_found"),
          sum(col("n_phones")).as("phones_found"),
          sum(h32(col("redacted"))).as("redacted_checksum"))
        .orderBy(col("source"))
    }),

    // Extended PII scrubbing (r16): IPv4 and Luhn-checked card spans on
    // top of t11's email/phone pass. Injected spans are doc_id-derived —
    // the 16 card digits come from a hash-mix, so Luhn validity VARIES
    // across rows and both engines must compute the mod-10 arithmetic
    // over the bytes (engine: one integer HOF fold; oracle: the 16
    // unrolled terms); invalid cards fall through to the phone pass.
    // The per-source checksum proves the redaction byte-for-byte.
    "t20_redaction_extended" -> ((s, dir) => {
      val ccs = lpad(((col("doc_id") * 2654435761L) % 10000000000000000L)
        .cast("string"), 16, "0")
      val ccFmt = concat(substring(ccs, 1, 4), lit(" "),
        substring(ccs, 5, 4), lit(" "), substring(ccs, 9, 4), lit(" "),
        substring(ccs, 13, 4))
      val d = docs(s, dir).withColumn("text2",
        when(col("doc_id") % 5 <= 1,
          concat(col("text"), lit(" card "), ccFmt, lit(" on file.")))
          .when(col("doc_id") % 5 === 2,
            concat(col("text"), lit(" from 203.0."),
              (col("doc_id") % 256).cast("string"), lit("."),
              (col("doc_id") % 97 + 1).cast("string"), lit(" node")))
          .when(col("doc_id") % 5 === 3,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"),
              lit("@example.com or call +1 555-0100.")))
          .otherwise(col("text")))
      // the DuckDB oracle replays only the FIRST card candidate
      // (regexp_extract — list folds are a driver-DuckDB version
      // hazard), so the gate's data contract is ≤ 1 candidate per doc:
      // the r16 corpus scan found zero natural card-shaped spans and
      // the injection appends at most one. Enforce that LOUDLY here so
      // a future corpus change fails with a message, never a hash diff.
      val multi = d.where(size(regexp_extract_all(
        regexp_replace(col("text2"), TextAnalysis.emailPattern, "<EMAIL>"),
        lit(TextAnalysis.ccPattern), lit(0))) > 1).count()
      require(multi == 0,
        s"t20: $multi doc(s) carry 2+ card-shaped candidates — the " +
          "single-candidate oracle replay no longer covers this corpus")
      TextAnalysis.redactPiiExtended(d, "text2")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_emails")).as("emails_found"),
          sum(col("n_ccs")).as("ccs_found"),
          sum(col("n_ips")).as("ips_found"),
          sum(col("n_phones")).as("phones_found"),
          sum(h32(col("redacted"))).as("redacted_checksum"))
        .orderBy(col("source"))
    }),

    // Registrable-domain stats (r17): the group-by a curation dashboard
    // runs first. The corpus carries no natural URLs (r17 scan: zero
    // https?:// spans), so the gate injects doc_id-derived ones — a
    // multi-label host (www.mirrorJ.exampleK.com, proving the last-two-
    // label reduction), a mixed-case second host in the same doc
    // (cdn.SiteJ.net, proving lower() and the per-doc mention count),
    // and a single-host family (hostK.org); 1/3 of docs stay URL-free.
    // 23 distinct domains against the top-20 cut exercises the ranking.
    // All-integer outputs; order (n_docs DESC, domain ASC) is total.
    "t21_domain_stats" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text2",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" via https://www.mirror"),
            (col("doc_id") % 7).cast("string"), lit(".example"),
            (col("doc_id") % 5).cast("string"),
            lit(".com/path?q=1 and http://cdn.Site"),
            (col("doc_id") % 7).cast("string"), lit(".net/x")))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" at http://host"),
              (col("doc_id") % 11).cast("string"), lit(".org page")))
          .otherwise(col("text")))
      TextAnalysis.domainStats(d, "doc_id", "text2")
        .orderBy(col("n_docs").desc, col("domain"))
        .limit(20)
    }),

    // sliding-window chunking (32-token windows, stride 16) — exact detail
    // rows including the chunk text itself
    "t12_chunks" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(
          docs(s, dir).where(col("doc_id") < 10), "doc_id", "text", 32, 16)
        .orderBy(col("id"), col("chunk_idx"))),

    // duplicated-substring spans (r8) — the distributed shape of
    // suffix-array exact-substring dedup (Lee et al. 2022): corpus-wide
    // duplicated 4-grams, merged per doc into maximal spans
    // (gaps-and-islands), reported as per-doc (span count, duplicated
    // tokens, first span start) over EVERY document
    "t13_dupspans" -> ((s, dir) =>
      TextAnalysis.duplicatedSpans(docs(s, dir), "doc_id", "text", 4)
        .orderBy(col("doc_id"))),

    // duplicated-span REMOVAL (r8) — ExactSubstr dedup's output side: the
    // per-source checksum over the CLEANED text proves the surgery
    // byte-for-byte (the t11 redaction pattern), alongside the token
    // delta; docs can come back empty (fully duplicated)
    "t15_despan" -> ((s, dir) =>
      TextAnalysis.removeDuplicatedSpans(docs(s, dir), "doc_id", "text", 4)
        .join(docs(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens_before") - col("n_tokens_after"))
            .as("tokens_removed"),
          sum(when(col("n_tokens_after") < col("n_tokens_before"), 1L)
            .otherwise(0L)).as("n_docs_changed"),
          sum(h32(col("clean_text"))).as("clean_checksum"))
        .orderBy(col("source"))),

    // per-source corpus profile (r8) — the pipeline-report composite a
    // curation run keys on: doc/token/char totals, alpha ratio (ONE
    // int-to-double division — everything else exact integers), short-doc
    // count, dominant language (mode of per-doc lang-ID, ties to the
    // smaller language code via min(struct(-c, lang)) — no window),
    // exact-dup membership count (corpus-wide normalized-text fingerprint
    // seen >= 2), and duplicated-span token total (the t13 operator)
    // hoisted to TextAnalysis.corpusProfile in r14 (byte-identical
    // expressions) so the CALL surface reaches the same engine code
    "t14_corpus_profile" -> ((s, dir) =>
      TextAnalysis.corpusProfile(docs(s, dir))),

    // int8 quantization quality: recall@10 of the quantized index vs the
    // full-precision exact search — all arithmetic exact, oracle-checked
    "e4_quantized_recall" -> ((s, dir) =>
      Similarity.recallAtK(
          Similarity.quantizedTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 10),
          Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L), 10),
          10)
        .orderBy(col("pid"))))

  // ---------------- oracle SQL ----------------

  private val toksSql = "string_split_regex(lower(text), '\\s+')"

  private def shSql(n: Int): String = shinglesSql(toksSql, n)

  /** Distinct hashed (id, h) shingles + per-doc sizes + intersection pairs
    * (hash join mirrors Dedup.explodedShingles exactly).
    */
  private def jaccardCtes(n: Int, rel: String = "documents"): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id AS id, ${h32Sql(s"unnest(${shSql(n)})")} AS h FROM $rel
       |),
       |sz AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
       |inter AS (
       |  SELECT x.id AS a, y.id AS b, COUNT(*) AS inter
       |  FROM sh x JOIN sh y ON x.h = y.h AND x.id < y.id
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT a, b, inter,
       |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |  FROM inter JOIN sz sa ON sa.id = a JOIN sz sb ON sb.id = b
       |)""".stripMargin

  /** The d11 edit-distance-verify oracle parameterized by threshold and
    * corpus relation (r17, the fastestDurationSql rule: the d11 call
    * reproduces the committed driver-green string BYTE FOR BYTE; the
    * cy52 CALL twin varies the budget).
    */
  private[queries] def editDistOracleSql(maxDist: Int,
      rel: String = "documents"): String =
    s"""WITH ${jaccardCtes(NGRAM, rel)},
       |$minhashSql
       |SELECT c.a, c.b,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS editdist
       |FROM cands c JOIN documents da ON da.doc_id = c.a
       |JOIN documents db ON db.doc_id = c.b
       |WHERE levenshtein(da.text, db.text) <= $maxDist
       |ORDER BY a, b""".stripMargin

  private def minhashSql: String = {
    val mins = minhashCoeffs(K).zipWithIndex.map { case ((a, b), i) =>
      s"MIN(${permutedSql("h", a, b)}) AS mh$i"
    }.mkString(",\n    ")
    val rows = K / BANDS
    val bandCols = (0 until BANDS).map { bd =>
      val parts = (0 until rows).map(r => s"CAST(mh${bd * rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $bd AS band, md5($parts) AS bucket FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sig AS (
       |  SELECT id, $mins
       |  FROM sh GROUP BY id
       |),
       |buckets AS (
       |  $bandCols
       |),
       |cands AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM buckets x JOIN buckets y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
       |)""".stripMargin
  }

  private def simhashSql: String = {
    val sums = (0 until 32).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n    ")
    val bits = (0 until 32).map(b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id AS id, ${h32Sql("unnest($TOKS)")} AS h FROM documents
       |),
       |sums AS (
       |  SELECT id, $sums FROM toks GROUP BY id
       |)
       |SELECT id, $bits AS simhash FROM sums ORDER BY id"""
      .stripMargin.replace("$TOKS", toksSql)
  }

  /** cosine(a,b) in the same double left-fold order as Similarity.cosine. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) /
       | (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $a[i]::DOUBLE))) *
       |  sqrt(list_sum(list_transform(range(1, 65), i -> $b[i]::DOUBLE * $b[i]::DOUBLE)))))"""
      .stripMargin.replace("\n", " ")

  /** Exact brute-force top-5 CTE for probes 0/1/2 (the recallAtK "exact"
    * side) and the recall tail that scores an `ap` CTE against it — shared
    * by the e3/e5/e6 ANN-quality oracles.
    */
  private def exactTop5Cte: String =
    s"""ex AS (
       |  SELECT pid, cid FROM (
       |    SELECT p.vec_id AS pid, c.vec_id AS cid,
       |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC, c.vec_id) AS rank
       |    FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
       |    WHERE p.vec_id IN (0, 1, 2))
       |  WHERE rank <= 5
       |)""".stripMargin

  private def recallTailSql: String =
    s"""hits AS (
       |  SELECT ex.pid, COUNT(*) AS hits
       |  FROM ex JOIN ap ON ap.pid = ex.pid AND ap.cid = ex.cid
       |  GROUP BY ex.pid
       |)
       |SELECT p.pid, COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / 5 AS recall
       |FROM (SELECT DISTINCT pid FROM ex) p LEFT JOIN hits h USING (pid)
       |ORDER BY p.pid""".stripMargin

  /** The product-quantization CTE chain (r18): per-subspace quantized
    * points (the kmeansUnrollCtes grid, sliced by subspace), the grouped
    * per-(sub, cluster) k-means unroll — assign/update keyed by sub, the
    * identical half-up integer mean — the final encode, the probes' ADC
    * LUT (probe subvector vs every same-subspace centroid), and the
    * per-(probe, candidate) ADC sum. Leaves `pq_adc(pid, cid, adc)` in
    * scope for the caller's ranking tail.
    */
  private def pqCtes(m: Int, kCodes: Int, iters: Int,
      probes: String): String = {
    def dst(p: String, c: String): String =
      s"CAST(list_sum(list_transform(range(1, len($p.xq) + 1), i -> " +
        s"($p.xq[i] - $c.cq[i]) * ($p.xq[i] - $c.cq[i]))) AS BIGINT)"
    def assignCte(a: String, cPrev: String): String =
      s"""$a AS MATERIALIZED (
         |  SELECT sub, id, cl, dist FROM (
         |    SELECT sub, id, cl, dist,
         |      ROW_NUMBER() OVER (PARTITION BY sub, id ORDER BY dist, cl) AS rk
         |    FROM (SELECT p.sub, p.id, c.cl, ${dst("p", "c")} AS dist
         |          FROM pq_pts p JOIN $cPrev c ON c.sub = p.sub))
         |  WHERE rk = 1)""".stripMargin
    def updateCte(c: String, a: String): String =
      s"""$c AS MATERIALIZED (
         |  SELECT sub, cl, list(cqd ORDER BY i) AS cq FROM (
         |    SELECT a.sub, a.cl, t.i,
         |      CAST((2 * CAST(SUM(p.xq[t.i]) AS BIGINT) + COUNT(*))
         |           // (2 * COUNT(*)) AS BIGINT) AS cqd
         |    FROM $a a JOIN pq_pts p ON p.sub = a.sub AND p.id = a.id
         |    CROSS JOIN (SELECT unnest(range(1, sd + 1)) AS i FROM pq_dims) t
         |    GROUP BY a.sub, a.cl, t.i)
         |  GROUP BY sub, cl)""".stripMargin
    val rounds = (1 to iters).map(r =>
      assignCte(s"pq_a$r", s"pq_c${r - 1}") + ",\n" +
        updateCte(s"pq_c$r", s"pq_a$r")).mkString(",\n")
    s"""pq_dims AS (SELECT CAST(MAX(len(embedding)) AS BIGINT) // $m AS sd
       |            FROM embeddings),
       |pq_pts AS MATERIALIZED (
       |  SELECT s.sub, vec_id AS id,
       |    list_transform(range(1, len(embedding) // $m + 1), i ->
       |      CAST(floor(embedding[s.sub * (len(embedding) // $m) + i]::DOUBLE
       |             * 1000000.0 + 0.5) AS BIGINT) + 10000000) AS xq
       |  FROM embeddings CROSS JOIN (SELECT UNNEST(range(0, $m)) AS sub) s),
       |pq_c0 AS (SELECT sub, id AS cl, xq AS cq FROM (
       |  SELECT sub, id, xq,
       |    ROW_NUMBER() OVER (PARTITION BY sub ORDER BY id) AS rn
       |  FROM pq_pts) z WHERE rn <= $kCodes),
       |$rounds,
       |${assignCte("pq_af", s"pq_c$iters")},
       |pq_lut AS (
       |  SELECT p.id AS pid, p.sub, c.cl AS code, ${dst("p", "c")} AS dist
       |  FROM pq_pts p JOIN pq_c$iters c ON c.sub = p.sub
       |  WHERE p.id IN ($probes)),
       |pq_adc AS (
       |  SELECT l.pid, f.id AS cid, CAST(SUM(l.dist) AS BIGINT) AS adc
       |  FROM pq_af f JOIN pq_lut l ON l.sub = f.sub AND l.code = f.cl
       |  WHERE f.id <> l.pid
       |  GROUP BY l.pid, f.id)""".stripMargin
  }

  /** The IVFADC CTE chain (r19): a coarse exact-grid k-means (k = nLists,
    * the kmeansUnrollCtes machinery) routes vectors to lists; residuals
    * vs the OWN list centroid (re-offset +2·10^7 so every value stays
    * positive and // ≡ div) feed the grouped per-subspace PQ unroll (the
    * pqCtes machinery on residuals); probes route to their nProbe
    * nearest lists, build a per-(list, sub, code) residual LUT, and the
    * ADC sum joins on (list, sub, code) — candidates OUTSIDE the probed
    * lists never appear, the IVF confinement. Leaves
    * `iva_adc(pid, cid, adc)` in scope for the caller's ranking tail.
    */
  private def ivfadcCtes(nLists: Int, nProbe: Int, m: Int, kCodes: Int,
      iters: Int, probes: String): String = {
    // squared distance over a row's xq vs a codebook's cq — the length
    // adapts, so the SAME helper serves the coarse (full-vector) and
    // residual (subvector) halves (r19 review: one copy, two call sites)
    def cdst(p: String, c: String): String =
      s"CAST(list_sum(list_transform(range(1, len($p.xq) + 1), i -> " +
        s"($p.xq[i] - $c.cq[i]) * ($p.xq[i] - $c.cq[i]))) AS BIGINT)"
    def cAssign(a: String, cPrev: String): String =
      s"""$a AS MATERIALIZED (
         |  SELECT id, cl, dist FROM (
         |    SELECT id, cl, dist,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cl) AS rk
         |    FROM (SELECT p.id, c.cl, ${cdst("p", "c")} AS dist
         |          FROM iva_pts p CROSS JOIN $cPrev c))
         |  WHERE rk = 1)""".stripMargin
    def cUpdate(c: String, a: String): String =
      s"""$c AS MATERIALIZED (
         |  SELECT cl, list(cqd ORDER BY i) AS cq FROM (
         |    SELECT a.cl, t.i,
         |      CAST((2 * CAST(SUM(p.xq[t.i]) AS BIGINT) + COUNT(*))
         |           // (2 * COUNT(*)) AS BIGINT) AS cqd
         |    FROM $a a JOIN iva_pts p USING (id)
         |    CROSS JOIN (SELECT unnest(range(1, nd + 1)) AS i FROM iva_dims) t
         |    GROUP BY a.cl, t.i)
         |  GROUP BY cl)""".stripMargin
    val cRounds = (1 to iters).map(r =>
      cAssign(s"iva_a$r", s"iva_c${r - 1}") + ",\n" +
        cUpdate(s"iva_c$r", s"iva_a$r")).mkString(",\n")
    def rAssign(a: String, cPrev: String): String =
      s"""$a AS MATERIALIZED (
         |  SELECT sub, id, list, cl, dist FROM (
         |    SELECT sub, id, list, cl, dist,
         |      ROW_NUMBER() OVER (PARTITION BY sub, id ORDER BY dist, cl) AS rk
         |    FROM (SELECT p.sub, p.id, p.list, c.cl, ${cdst("p", "c")} AS dist
         |          FROM iva_rpts p JOIN $cPrev c ON c.sub = p.sub))
         |  WHERE rk = 1)""".stripMargin
    def rUpdate(c: String, a: String): String =
      s"""$c AS MATERIALIZED (
         |  SELECT sub, cl, list(cqd ORDER BY i) AS cq FROM (
         |    SELECT a.sub, a.cl, t.i,
         |      CAST((2 * CAST(SUM(p.xq[t.i]) AS BIGINT) + COUNT(*))
         |           // (2 * COUNT(*)) AS BIGINT) AS cqd
         |    FROM $a a JOIN iva_rpts p ON p.sub = a.sub AND p.id = a.id
         |    CROSS JOIN (SELECT unnest(range(1, sd + 1)) AS i FROM iva_dims) t
         |    GROUP BY a.sub, a.cl, t.i)
         |  GROUP BY sub, cl)""".stripMargin
    val rRounds = (1 to iters).map(r =>
      rAssign(s"iva_ra$r", s"iva_rc${r - 1}") + ",\n" +
        rUpdate(s"iva_rc$r", s"iva_ra$r")).mkString(",\n")
    // probe residual element i inside subspace s.sub of list cc: the
    // LUT distance term (probe re-offset minus codebook entry)
    val sd = s"(len(p.xq) // $m)"
    val lutTerm =
      s"(p.xq[s.sub * $sd + i] - cc.cq[s.sub * $sd + i] + 20000000 - c2.cq[i])"
    s"""iva_dims AS (SELECT CAST(MAX(len(embedding)) AS BIGINT) AS nd,
       |  CAST(MAX(len(embedding)) AS BIGINT) // $m AS sd FROM embeddings),
       |iva_nrm AS (
       |  SELECT vec_id, embedding,
       |    greatest(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |      j -> embedding[j]::DOUBLE * embedding[j]::DOUBLE))), 1e-30) AS nrm
       |  FROM embeddings),
       |iva_pts AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    list_transform(range(1, len(embedding) + 1), i ->
       |      CAST(floor((embedding[i]::DOUBLE / nrm) * 1000000.0 + 0.5)
       |        AS BIGINT) + 10000000) AS xq
       |  FROM iva_nrm),
       |iva_c0 AS (SELECT id AS cl, xq AS cq FROM iva_pts ORDER BY id LIMIT $nLists),
       |$cRounds,
       |${cAssign("iva_af", s"iva_c$iters")},
       |iva_rpts AS MATERIALIZED (
       |  SELECT s.sub, a.id, a.cl AS list,
       |    list_transform(range(1, $sd + 1), i ->
       |      p.xq[s.sub * $sd + i] - c.cq[s.sub * $sd + i] + 20000000) AS xq
       |  FROM iva_af a JOIN iva_pts p USING (id)
       |  JOIN iva_c$iters c ON c.cl = a.cl
       |  CROSS JOIN (SELECT UNNEST(range(0, $m)) AS sub) s),
       |iva_rc0 AS (SELECT sub, id AS cl, xq AS cq FROM (
       |  SELECT sub, id, xq,
       |    ROW_NUMBER() OVER (PARTITION BY sub ORDER BY id) AS rn
       |  FROM iva_rpts) z WHERE rn <= $kCodes),
       |$rRounds,
       |${rAssign("iva_raf", s"iva_rc$iters")},
       |iva_pr AS (
       |  SELECT pid, list FROM (
       |    SELECT pid, list, dist,
       |      ROW_NUMBER() OVER (PARTITION BY pid ORDER BY dist, list) AS rk
       |    FROM (SELECT p.id AS pid, c.cl AS list, ${cdst("p", "c")} AS dist
       |          FROM iva_pts p CROSS JOIN iva_c$iters c
       |          WHERE p.id IN ($probes)))
       |  WHERE rk <= $nProbe),
       |iva_lut AS (
       |  SELECT r.pid, r.list, s.sub, c2.cl AS code,
       |    CAST(list_sum(list_transform(range(1, $sd + 1), i ->
       |      $lutTerm * $lutTerm)) AS BIGINT) AS dist
       |  FROM iva_pr r
       |  JOIN iva_pts p ON p.id = r.pid
       |  JOIN iva_c$iters cc ON cc.cl = r.list
       |  CROSS JOIN (SELECT UNNEST(range(0, $m)) AS sub) s
       |  JOIN iva_rc$iters c2 ON c2.sub = s.sub),
       |iva_adc AS (
       |  SELECT l.pid, f.id AS cid, CAST(SUM(l.dist) AS BIGINT) AS adc
       |  FROM iva_raf f
       |  JOIN iva_lut l ON l.list = f.list AND l.sub = f.sub AND l.code = f.cl
       |  WHERE f.id <> l.pid
       |  GROUP BY l.pid, f.id)""".stripMargin
  }

  /** The m11 dHash fingerprint unrolled (r19): 64 neighbor comparisons at
    * the sample positions x_k = (k·w) // 9, y_r = (r·h) // 8, each pixel
    * the crafted-pattern arithmetic identity, bits OR-folded (bit 63 via
    * the two-term min-long literal — DuckDB rejects 1 << 63). Expects
    * w, h, m1, m2, bb in scope.
    */
  private def dhashFpSql: String = {
    def px(r: Int, k: Int): String =
      s"((((($k * w) // 9) * m1 + (($r * h) // 8) * m2) % 23) * 8 + bb)"
    (for (r <- 0 until 8; k <- 0 until 8) yield {
      val bit =
        if (r * 8 + k == 63) "(-9223372036854775807 - 1)"
        else s"CAST(${1L << (r * 8 + k)} AS BIGINT)"
      s"(CASE WHEN ${px(r, k)} < ${px(r, k + 1)} THEN $bit ELSE 0::BIGINT END)"
    }).mkString(" | ")
  }

  /** The engine's Luhn HOF fold unrolled at the candidate's fixed 16
    * digits (hoisted r18 — shared by the t20 and t22 oracles): position i
    * from the LEFT doubles when 16 - i is odd, i.e. odd i (minus 9 past
    * 9); NULLIF keeps the no-candidate row NULL instead of erroring on
    * CAST('') under any evaluation order.
    */
  private def luhnTermsSql: String = (1 to 16).map { i =>
    val d = s"CAST(NULLIF(substr(ccd, $i, 1), '') AS BIGINT)"
    if (i % 2 == 1) s"($d * 2 - CASE WHEN $d >= 5 THEN 9 ELSE 0 END)"
    else d
  }.mkString(" + ")

  /** LSH bucket in SQL: sign bits of dot(vec, ±1-plane m), m = 0..7. */
  private def bucketSql(v: String): String =
    (0 until 8).map { m =>
      val sign = s"CASE WHEN ${h32Sql(s"('plane${m}_' || CAST(i - 1 AS VARCHAR))")} % 2 = 0 THEN 1.0 ELSE -1.0 END"
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> $v[i]::DOUBLE * ($sign))) > 0 THEN ${1L << m} ELSE 0 END)"
    }.mkString(" + ")

  private def langIdSql: String = {
    val votes = TextAnalysis.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($toksSql, $list)) AS v_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwords.map(_._1)
    val best = s"greatest(${langs.map(l => s"v_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN v_$l = best AND best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH v AS (
       |  SELECT lang, $votes FROM documents
       |),
       |w AS (SELECT lang, $best AS best, * FROM v)
       |SELECT lang, $pred AS predicted_lang, COUNT(*) AS n
       |FROM w GROUP BY 1, 2 ORDER BY lang, predicted_lang""".stripMargin
  }

  /** Duplicated-span CTE chain (t13's oracle, reused by t14): positions
    * via lateral unnest (the shinglesSql slice construction), corpus-wide
    * >=2 filter, LAG-based islands with gap tolerance n. NULL lag (first
    * marked position) falls to ELSE 1 exactly like Spark's
    * when(...).otherwise(1). Ends at `spans(doc_id, span, start, len)`.
    */
  private def dupSpanCtes(n: Int): String =
    s"""t13t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(list_slice(toks, i, i + ${n - 1}), ' ') AS gram
       |  FROM t13t, UNNEST(range(1, len(toks) - ${n - 2})) AS r(i)
       |  WHERE len(toks) >= $n),
       |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
       |marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup d USING (gram)),
       |brks AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $n
       |         THEN 0 ELSE 1 END AS brk
       |  FROM marked),
       |isl AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span
       |  FROM brks),
       |spans AS (
       |  SELECT doc_id, span, MIN(pos) AS start,
       |    MAX(pos) - MIN(pos) + $n AS len
       |  FROM isl GROUP BY 1, 2)""".stripMargin

  /** Per-doc language prediction CTEs (t1's vote/CASE construction with
    * doc_id + source carried): ends at `lp(doc_id, source,
    * predicted_lang)`.
    */
  private def langPredCtes: String = {
    val votes = TextAnalysis.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($toksSql, $list)) AS v_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwords.map(_._1)
    val best = s"greatest(${langs.map(l => s"v_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN v_$l = best AND best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""lv AS (SELECT doc_id, source, $votes FROM documents),
       |lw AS (SELECT doc_id, source, $best AS best, * FROM lv),
       |lp AS (SELECT doc_id, source, $pred AS predicted_lang FROM lw)"""
      .stripMargin
  }

  /** The k-means mirror, unrolled (shared by e7/e8): quantize once onto
    * the 10^-6 grid (+10^7 offset keeps everything positive so // ==
    * Spark's div), then 3 assign+update rounds and a final assignment
    * CTE `a4` — integer argmin with cluster-id tie-break, centroid =
    * (2S + n) // (2n) per dimension (half-up integer mean), op-for-op
    * the gate's math. Every aggregate/arithmetic result is pinned to
    * BIGINT: DuckDB's SUM(BIGINT)/list_sum widen to HUGEINT
    * (version-dependently), and the r10 driver gate proved an unpinned
    * oracle type breaks the hash while every VALUE matches. The
    * dimension is derived from len(embedding), not hardcoded (r10
    * ADVICE); the loud-failure guarantee for a schema change lives on
    * the Spark side — kmeansQuantized REQUIRES uniform embedding
    * lengths, so a ragged column aborts the gate before either engine
    * can silently skew a centroid (r11 ADVICE).
    */
  private def kmeansUnrollCtes: String = {
    def dst(p: String, c: String): String =
      s"CAST(list_sum(list_transform(range(1, len($p.xq) + 1), i -> " +
        s"($p.xq[i] - $c.cq[i]) * ($p.xq[i] - $c.cq[i]))) AS BIGINT)"
    def assignCte(a: String, cPrev: String): String =
      s"""$a AS MATERIALIZED (
         |  SELECT id, cl, dist FROM (
         |    SELECT id, cl, dist,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cl) AS rk
         |    FROM (SELECT p.id, c.cl, ${dst("p", "c")} AS dist
         |          FROM pts p CROSS JOIN $cPrev c))
         |  WHERE rk = 1)""".stripMargin
    def updateCte(c: String, a: String): String =
      s"""$c AS MATERIALIZED (
         |  SELECT cl, list(cqd ORDER BY i) AS cq FROM (
         |    SELECT a.cl, t.i,
         |      CAST((2 * CAST(SUM(p.xq[t.i]) AS BIGINT) + COUNT(*))
         |           // (2 * COUNT(*)) AS BIGINT) AS cqd
         |    FROM $a a JOIN pts p USING (id)
         |    CROSS JOIN (SELECT unnest(range(1, nd + 1)) AS i FROM dims) t
         |    GROUP BY a.cl, t.i)
         |  GROUP BY cl)""".stripMargin
    val rounds = (1 to 3).map(r =>
      assignCte(s"a$r", s"c${r - 1}") + ",\n" + updateCte(s"c$r", s"a$r"))
      .mkString(",\n")
    s"""WITH dims AS (SELECT CAST(MAX(len(embedding)) AS BIGINT) AS nd
       |              FROM embeddings),
       |pts AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    list_transform(range(1, len(embedding) + 1), i ->
       |      CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT)
       |        + 10000000) AS xq
       |  FROM embeddings),
       |c0 AS (SELECT id AS cl, xq AS cq FROM pts ORDER BY id LIMIT 10),
       |$rounds,
       |${assignCte("a4", "c3")}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH ${jaccardCtes(NGRAM)}
         |SELECT a, b, inter, jaccard FROM jac
         |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin,
    "d3_minhash_lsh" ->
      s"""WITH ${jaccardCtes(NGRAM)},
         |$minhashSql
         |SELECT c.a, c.b, j.jaccard
         |FROM cands c JOIN jac j ON j.a = c.a AND j.b = c.b
         |ORDER BY c.a, c.b""".stripMargin,
    "d10_incremental_dedup" ->
      // sided LSH candidates (incoming % 10 = 3 vs corpus) + pair-restricted
      // exact Jaccard; survivors = incoming with no >= 0.5 match
      s"""WITH ${jaccardCtes(NGRAM)},
         |$minhashSql,
         |xcands AS (
         |  SELECT DISTINCT x.id AS a, y.id AS b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.id % 10 = 3 AND y.id % 10 <> 3
         |),
         |xinter AS (
         |  SELECT c.a, c.b, COUNT(*) AS inter FROM xcands c
         |  JOIN sh x ON x.id = c.a
         |  JOIN sh y ON y.id = c.b AND y.h = x.h
         |  GROUP BY 1, 2
         |),
         |dropped AS (
         |  SELECT DISTINCT i.a FROM xinter i
         |  JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5
         |)
         |SELECT doc_id, source, n_chars FROM documents
         |WHERE doc_id % 10 = 3 AND doc_id NOT IN (SELECT a FROM dropped)
         |ORDER BY doc_id""".stripMargin,
    // the same sh→sig→buckets→cands CTEs over the half corpus, then the
    // full Levenshtein with the engine's threshold mirrored as a WHERE
    // (in-threshold values are the exact distance on both sides)
    "d11_editdist_verify" ->
      editDistOracleSql(16, "(SELECT * FROM documents WHERE doc_id % 2 = 1)"),
    "d4_simhash" -> simhashSql,
    "d7_dedup_clusters" ->
      // transitive closure over the >= 0.5 candidate pairs; component label
      // = min reachable id, mirroring GraphX's min-id convention
      s"""WITH RECURSIVE ${jaccardCtes(NGRAM)},
         |$minhashSql,
         |nd AS (
         |  SELECT c.a, c.b FROM cands c JOIN jac j ON j.a = c.a AND j.b = c.b
         |  WHERE j.jaccard >= 0.5
         |),
         |und AS (SELECT a AS x, b AS y FROM nd UNION SELECT b, a FROM nd),
         |reach(x, y) AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM reach r JOIN und u ON u.x = r.y
         |),
         |comp AS (
         |  SELECT x AS id, LEAST(x, MIN(y)) AS component FROM reach GROUP BY x
         |)
         |SELECT component AS survivor_id, COUNT(*) AS n_members,
         |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
         |FROM comp GROUP BY component ORDER BY survivor_id""".stripMargin,
    "d6_simhash_pairs" ->
      // oracle may go all-pairs (correctness only); the Spark side is banded
      s"""WITH toks AS (
         |  SELECT doc_id AS id, ${h32Sql("unnest($TOKS)")} AS h FROM documents
         |),
         |sums AS (
         |  SELECT id, ${(0 until 32).map(b =>
              s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n    ")}
         |  FROM toks GROUP BY id
         |),
         |sig AS (
         |  SELECT id, ${(0 until 32).map(b =>
              s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")} AS simhash
         |  FROM sums
         |)
         |SELECT x.id AS a, y.id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM sig x JOIN sig y ON x.id < y.id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a, b""".stripMargin.replace("$TOKS", toksSql),
    "d5_embed_neardup" ->
      s"""SELECT x.vec_id AS a, y.vec_id AS b,
         |  ${cosSql("x.embedding", "y.embedding")} AS sim
         |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
         |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,
    "e1_cosine_topk" ->
      s"""WITH scored AS (
         |  SELECT p.vec_id AS pid, c.vec_id AS cid,
         |    ${cosSql("p.embedding", "c.embedding")} AS sim
         |  FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |  WHERE p.vec_id IN (0, 1, 2)
         |),
         |ranked AS (
         |  SELECT pid, cid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, cid) AS rank
         |  FROM scored
         |)
         |SELECT pid, rank, cid, sim FROM ranked WHERE rank <= 10
         |ORDER BY pid, rank""".stripMargin,
    // the greedy unrolled: step 1 is the pool's rank-1; each later step
    // anti-joins the selected set, scores 0.5*sim - 0.5*max(sim to
    // selected), and picks the per-probe argmax with ties to the smaller
    // id — the same comparisons the engine's greedy makes on the same
    // doubles
    "e10_mmr" -> {
      val steps = (2 to 5).map { i =>
        s"""step$i AS (
           |  SELECT pid, cid, score FROM (
           |    SELECT r.pid, r.cid, r.score,
           |      ROW_NUMBER() OVER (PARTITION BY r.pid
           |        ORDER BY r.score DESC, r.cid) AS rn
           |    FROM (
           |      SELECT p.pid, p.cid, 0.5 * p.sim - 0.5 * MAX(cc.s) AS score
           |      FROM pool p
           |      JOIN sel${i - 1} s ON s.pid = p.pid
           |      JOIN cc ON cc.pid = p.pid AND cc.a = p.cid AND cc.b = s.cid
           |      WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} e
           |                        WHERE e.pid = p.pid AND e.cid = p.cid)
           |      GROUP BY p.pid, p.cid, p.sim) r)
           |  WHERE rn = 1),
           |sel$i AS (SELECT pid, cid FROM sel${i - 1}
           |          UNION ALL SELECT pid, cid FROM step$i)""".stripMargin
      }.mkString(",\n")
      val ranked = (1 to 5).map(i =>
        s"SELECT pid, CAST($i AS BIGINT) AS rank, cid, score FROM step$i")
        .mkString("\nUNION ALL\n")
      s"""WITH pool AS (
         |  SELECT pid, cid, sim, prank FROM (
         |    SELECT p.vec_id AS pid, c.vec_id AS cid,
         |      ${cosSql("p.embedding", "c.embedding")} AS sim,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC,
         |                 c.vec_id) AS prank
         |    FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |    WHERE p.vec_id IN (0, 1, 2))
         |  WHERE prank <= 20),
         |cc AS (
         |  SELECT x.pid, x.cid AS a, y.cid AS b,
         |    ${cosSql("ea.embedding", "eb.embedding")} AS s
         |  FROM pool x JOIN pool y ON y.pid = x.pid AND y.cid <> x.cid
         |  JOIN embeddings ea ON ea.vec_id = x.cid
         |  JOIN embeddings eb ON eb.vec_id = y.cid),
         |step1 AS (SELECT pid, cid, sim AS score FROM pool WHERE prank = 1),
         |sel1 AS (SELECT pid, cid FROM step1),
         |$steps
         |SELECT pid, rank, cid, score FROM (
         |$ranked)
         |ORDER BY pid, rank""".stripMargin
    },
    "e9_radius_search" ->
      s"""SELECT p.vec_id AS pid, c.vec_id AS cid,
         |  ${cosSql("p.embedding", "c.embedding")} AS sim
         |FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |WHERE p.vec_id IN (0, 1, 2)
         |  AND ${cosSql("p.embedding", "c.embedding")} >= 0.25
         |ORDER BY pid, cid""".stripMargin,
    "e2_ann_lsh" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id AS cid, embedding AS cvec,
         |    ${bucketSql("embedding")} AS bucket
         |  FROM embeddings
         |),
         |scored AS (
         |  SELECT p.cid AS pid, c.cid AS cid,
         |    ${cosSql("p.cvec", "c.cvec")} AS sim
         |  FROM bucketed p JOIN bucketed c ON c.bucket = p.bucket AND c.cid <> p.cid
         |  WHERE p.cid IN (0, 1, 2)
         |),
         |ranked AS (
         |  SELECT pid, cid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, cid) AS rank
         |  FROM scored
         |)
         |SELECT pid, rank, cid, sim FROM ranked WHERE rank <= 5
         |ORDER BY pid, rank""".stripMargin,
    // the e2 bucket/cosine replay with the WHOLE corpus as the probe set,
    // then the symmetrize + w_ppm grid snap (cosine is symmetric and the
    // fixed-fold dot is term-order-identical both ways, so the two
    // directions collapse under DISTINCT on the same double)
    "e12_knn_graph" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id AS id, embedding AS v,
         |    ${bucketSql("embedding")} AS bucket
         |  FROM embeddings
         |),
         |ranked AS (
         |  SELECT a.id AS pid, b.id AS cid,
         |    ${cosSql("a.v", "b.v")} AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY a.id
         |      ORDER BY ${cosSql("a.v", "b.v")} DESC, b.id) AS rank
         |  FROM bucketed a JOIN bucketed b
         |    ON b.bucket = a.bucket AND b.id <> a.id
         |),
         |und AS (
         |  SELECT DISTINCT least(pid, cid) AS src, greatest(pid, cid) AS dst,
         |    sim
         |  FROM ranked WHERE rank <= 5
         |)
         |SELECT src, dst,
         |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS w_ppm
         |FROM und WHERE floor(sim * 1000000 + 0.5) > 0
         |ORDER BY src, dst""".stripMargin,
    "t1_langid" -> langIdSql,
    "t2_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    len($toksSql) AS n_tokens,
         |    CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |      / len(text) AS alpha_ratio
         |  FROM documents
         |)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, alpha_ratio,
         |  least(1.0, n_tokens / 64.0) * alpha_ratio AS quality_score
         |FROM q ORDER BY quality_score DESC, doc_id LIMIT 20""".stripMargin,
    "t3_token_stats" ->
      s"""WITH t AS (
         |  SELECT source, len($toksSql) AS n,
         |    len(list_distinct($toksSql)) AS nd
         |  FROM documents
         |)
         |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
         |  CAST(SUM(nd) AS BIGINT) AS total_distinct_tokens, CAST(MAX(n) AS BIGINT) AS max_tokens
         |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // the unigramRarity plan replayed: per-(doc, tok) multiplicities,
    // corpus frequencies, the exact integer weight 10^12 // cnt (DuckDB
    // `//` == Spark `div` for positive BIGINTs), plain integer k·w sums
    // — every aggregate pinned to BIGINT (the driver's DuckDB widens
    // unpinned integer SUMs to HUGEINT), no FP op anywhere.
    "t17_unigram_nll" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS k
         |       FROM toks GROUP BY doc_id, tok),
         |freq AS (SELECT tok, CAST(SUM(k) AS BIGINT) AS cnt
         |         FROM dt GROUP BY tok),
         |w AS (SELECT tok,
         |        CAST(CAST(1000000000000 AS BIGINT) // cnt AS BIGINT) AS w
         |      FROM freq)
         |SELECT dt.doc_id, CAST(SUM(dt.k) AS BIGINT) AS n_tokens,
         |  CAST(SUM(w.w * dt.k) AS BIGINT) AS rarity
         |FROM dt JOIN w USING (tok) GROUP BY dt.doc_id
         |ORDER BY doc_id""".stripMargin,
    // the bigramRarity plan replayed: doc bigram multiplicities via
    // adjacent-pair unnest, corpus bigram/prefix/unigram counts, the
    // common-denominator integer weight (1000·S·c(u·)·T) //
    // (λ·c(uv)·T + (1000−λ)·c(v)·c(u·)) with λ = 700, S = 1000 — every
    // aggregate pinned BIGINT, `//` ≡ Spark `div` on positive operands,
    // docs under 2 tokens carried at (0, 0) by the left join
    "t23_bigram_nll" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |bg AS (
         |  SELECT doc_id, ts[i] AS u, ts[i + 1] AS v
         |  FROM tk, UNNEST(range(1, len(ts))) AS r(i)
         |  WHERE len(ts) >= 2),
         |db AS (SELECT doc_id, u, v, CAST(COUNT(*) AS BIGINT) AS k
         |       FROM bg GROUP BY doc_id, u, v),
         |cb AS (SELECT u, v, CAST(SUM(k) AS BIGINT) AS cuv
         |       FROM db GROUP BY u, v),
         |cu AS (SELECT u, CAST(SUM(cuv) AS BIGINT) AS cu
         |       FROM cb GROUP BY u),
         |cv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |         SELECT unnest(ts) AS tok FROM tk) GROUP BY tok),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cv),
         |w AS (
         |  SELECT cb.u, cb.v,
         |    CAST((CAST(1000000 AS BIGINT) * cu.cu * t.total) //
         |      (CAST(700 AS BIGINT) * cb.cuv * t.total +
         |       CAST(300 AS BIGINT) * cv.cnt * cu.cu) AS BIGINT) AS w
         |  FROM cb JOIN cu USING (u) JOIN cv ON cv.tok = cb.v
         |  CROSS JOIN tot t),
         |sc AS (
         |  SELECT db.doc_id, CAST(SUM(db.k) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(db.k * w.w) AS BIGINT) AS bigram_rarity
         |  FROM db JOIN w ON w.u = db.u AND w.v = db.v
         |  GROUP BY db.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(sc.bigram_rarity, 0) AS BIGINT) AS bigram_rarity
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // same 4x256 counter construction: bucket = h32(r || '|' || tok) mod
    // 256, estimate = MIN over the 4 rows' counters; casts pin BIGINT
    "t18_countmin" -> {
      val b = graft.pipeline.TextHash.h32Sql("CAST(r AS VARCHAR) || '|' || tok")
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |sketch AS (
         |  SELECT r, ($b) % 256 AS bkt, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM toks, rows_ GROUP BY 1, 2),
         |exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
         |          FROM toks GROUP BY tok),
         |top AS (
         |  SELECT rank, tok, exact_n FROM (
         |    SELECT tok, exact_n,
         |      ROW_NUMBER() OVER (ORDER BY exact_n DESC, tok) AS rank
         |    FROM exact)
         |  WHERE rank <= 10),
         |look AS (
         |  SELECT t.rank, t.tok, t.exact_n, rows_.r, ($b) % 256 AS bkt
         |  FROM top t, rows_)
         |SELECT CAST(rank AS BIGINT) AS rank, tok, exact_n,
         |       CAST(MIN(c) AS BIGINT) AS cm_est
         |FROM look JOIN sketch USING (r, bkt)
         |GROUP BY rank, tok, exact_n
         |ORDER BY rank""".stripMargin
    },
    "t16_vocabulary" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($toksSql) AS term FROM documents),
         |counts AS (
         |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok GROUP BY 1, 2),
         |totals AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
         |         CAST(SUM(cnt) AS BIGINT) AS n_tokens
         |  FROM counts GROUP BY 1),
         |ranked AS (
         |  SELECT source, term, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rank
         |  FROM counts)
         |SELECT r.source, CAST(r.rank AS INT) AS rank, r.term, r.cnt,
         |  t.n_types, t.n_tokens,
         |  CAST(t.n_types AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS type_token_ratio
         |FROM ranked r JOIN totals t USING (source) WHERE r.rank <= 5
         |ORDER BY source, rank""".stripMargin,
    "t4_fingerprints" ->
      s"""SELECT doc_id AS id,
         |  ${h32Sql("regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')")} AS content_fp,
         |  CASE WHEN len(${shSql(5)}) > 0
         |    THEN list_min(list_transform(${shSql(5)}, s -> ${h32Sql("s")}))
         |    ELSE NULL END AS min_shingle_fp
         |FROM documents ORDER BY id""".stripMargin,
    "t5_bpe_tokens" ->
      // identical RE2-compatible regex; length() is char-based in both
      // engines; list_sum([]) is NULL in DuckDB → coalesce
      """WITH p AS (
        |  SELECT source,
        |    regexp_extract_all(text,
        |      '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+') AS pieces
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(pieces)) AS BIGINT) AS total_pieces,
        |  CAST(SUM(COALESCE(list_sum(list_transform(pieces,
        |    x -> CAST(floor((length(x)+3)/4) AS BIGINT))), 0)) AS BIGINT) AS total_subwords
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "t19_bpe_real" -> {
      // the merge table mirrored op for op: the same Seq generates both
      // the Spark replace chain and this one, so they cannot diverge;
      // replace() is literal (non-regex) in both engines and every
      // symbol is letter-only (enforced in TextAnalysis)
      val chain = graft.pipeline.TextAnalysis.bpeMerges.foldLeft(
        "regexp_replace(ltrim(x), '(.)', ' \\1 ', 'g')") {
        case (s, (a, b)) => s"replace($s, ' $a  $b ', ' $a$b ')"
      }
      s"""WITH p AS (
         |  SELECT source,
         |    regexp_extract_all(text,
         |      '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+') AS pieces
         |  FROM documents
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(pieces)) AS BIGINT) AS total_pieces,
         |  CAST(SUM(COALESCE(list_sum(list_transform(pieces,
         |    x -> CAST(len(string_split(trim($chain), '  ')) AS BIGINT))), 0))
         |    AS BIGINT) AS total_tokens
         |FROM p GROUP BY source ORDER BY source""".stripMargin
    },
    "m2_frame_sample" ->
      // 16-byte frames, every 4th sampled; strlen counts UTF-8 bytes = the
      // binary payload length; the last frame is the byte remainder
      """WITH f AS (
        |  SELECT source, strlen(text) AS L,
        |    unnest(range(0, CAST(ceil(strlen(text)/16.0) AS BIGINT), 4)) AS i
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_frames,
        |  CAST(SUM(LEAST(16, L - i*16)) AS BIGINT) AS frame_bytes_total
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "m3_binary_meta" ->
      // the arithmetic identity the crafted headers encode: the engine
      // parsed width/height/format OUT OF THE BYTES; the oracle replays
      // what the gate put in (33 header bytes for both containers)
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 3 IN (0, 1)
        |       THEN doc_id % 800 + 16 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 IN (0, 1)
        |       THEN doc_id * 7 % 600 + 16 END AS BIGINT) AS height,
        |  CAST(strlen(text) + CASE WHEN doc_id % 3 IN (0, 1)
        |       THEN 33 ELSE 0 END AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m5_audio_meta" ->
      // the LE-header arithmetic identity (44-byte canonical WAV header)
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'riff' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 4 + 1 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN (doc_id % 5 + 1) * 8000 END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN (doc_id % 3 + 1) * 8 END AS BIGINT) AS bits_per_sample,
        |  CAST(strlen(text) + CASE WHEN doc_id % 2 = 0
        |       THEN 44 ELSE 0 END AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m7_video_meta" ->
      // the BMFF arithmetic identity: both mvhd versions carry the same
      // doc_id-derived timescale/duration; the header-size split in
      // payload_bytes (68 v0 / 80 v1) pins that BOTH version paths
      // actually parsed; duration_ms is the exact integer ratio
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN (doc_id % 7 + 1) * 600 END AS BIGINT) AS timescale,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 90000 + 600 END AS BIGINT) AS duration,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN ((doc_id % 90000 + 600) * 1000)
        |            // ((doc_id % 7 + 1) * 600) END AS BIGINT) AS duration_ms,
        |  CAST(strlen(text) + CASE WHEN doc_id % 4 = 0 THEN 68
        |       WHEN doc_id % 4 = 2 THEN 80 ELSE 0 END AS BIGINT)
        |    AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m8_audio_duration" ->
      // the walked-data-chunk identity: data_bytes = the text length the
      // craft wrote into the LE32 size field, byte_rate = the fmt-chunk
      // product, duration_ms their exact integer ratio; header = 36
      // (RIFF/fmt) + 14 (LIST 5 + pad) + 8 (data hdr) = 58 bytes
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'riff' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN strlen(text) END AS BIGINT) AS data_bytes,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN ((doc_id % 5 + 1) * 8000) * (doc_id % 4 + 1)
        |            * (doc_id % 3 + 1) END AS BIGINT) AS byte_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN (strlen(text) * 1000)
        |            // (((doc_id % 5 + 1) * 8000) * (doc_id % 4 + 1)
        |               * (doc_id % 3 + 1)) END AS BIGINT) AS duration_ms,
        |  CAST(strlen(text) + CASE WHEN doc_id % 2 = 0
        |       THEN 58 ELSE 0 END AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m9_exif_meta" ->
      // the EXIF arithmetic identity: both byte orders carry the same
      // doc_id-derived orientation and datetime; the shared 100-byte
      // header (SOI 2 + APP0 18 + APP1 80) pins the walk; format pins
      // the sniff split
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 8 + 1 END AS BIGINT) AS exif_orientation,
        |  CASE WHEN doc_id % 2 = 0 THEN
        |    CAST(2000 + doc_id % 26 AS VARCHAR) || ':' ||
        |    lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || ' ' ||
        |    lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(doc_id * 7 % 60 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(doc_id * 13 % 60 AS VARCHAR), 2, '0')
        |  END AS exif_datetime,
        |  CAST(strlen(text) + CASE WHEN doc_id % 2 = 0
        |       THEN 100 ELSE 0 END AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m10_track_dims" ->
      // the tkhd arithmetic identity: both versions carry the same
      // doc_id-derived 16.16 dimensions; the header-size split (148 v0 /
      // 160 v1) pins that both version paths actually parsed
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 640 + 16 END AS BIGINT) AS track_width,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 480 + 9 END AS BIGINT) AS track_height,
        |  CAST(strlen(text) + CASE WHEN doc_id % 4 = 0 THEN 148
        |       WHEN doc_id % 4 = 2 THEN 160 ELSE 0 END AS BIGINT)
        |    AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m6_binary_clusters" ->
      // the m4 signature replay + d7's transitive-closure tail (min
      // reachable id = GraphX's min-id component convention)
      s"""WITH RECURSIVE $byteSimhashSigCtes,
         |nd AS (
         |  SELECT x.id AS a, y.id AS b FROM sig x JOIN sig y ON x.id < y.id
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |),
         |und AS (SELECT a AS x, b AS y FROM nd UNION SELECT b, a FROM nd),
         |reach(x, y) AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM reach r JOIN und u ON u.x = r.y
         |),
         |comp AS (
         |  SELECT x AS id, LEAST(x, MIN(y)) AS component FROM reach GROUP BY x
         |)
         |SELECT component AS survivor_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
         |FROM comp GROUP BY component ORDER BY survivor_id""".stripMargin,
    "m4_binary_neardup" ->
      // d6's per-bit-sum replay over 16-byte chunk features: DuckDB
      // hex(VARCHAR) renders the same uppercase bytes Spark hex(BINARY)
      // does, so chunk hashes agree; oracle goes all-pairs (correctness
      // only), the Spark side is banded
      s"""WITH $byteSimhashSigCtes
         |SELECT x.id AS a, y.id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM sig x JOIN sig y ON x.id < y.id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a, b""".stripMargin,
    "m11_image_neardup" ->
      // the dHash sample-position arithmetic identity (the m3 replay
      // convention): pixels never materialize — the oracle computes each
      // sampled pixel from the crafting formula, OR-folds the 64
      // comparison bits, and goes all-pairs (4-band pigeonhole makes the
      // engine's banded recall complete at hamming <= 3, the m4 argument)
      s"""WITH p2 AS (
         |  SELECT doc_id, doc_id // 50 AS g FROM documents
         |  WHERE doc_id % 7 <> 3 AND doc_id < 1000),
         |pr AS (
         |  SELECT doc_id,
         |    18 + g % 7 AS w, 16 + g % 5 AS h,
         |    (g % 5 + 2) + (CASE WHEN doc_id % 10 < 2 THEN 0
         |                        ELSE doc_id % 13 + 1 END) AS m1,
         |    g % 3 + 1 AS m2, doc_id % 40 AS bb
         |  FROM p2),
         |fp AS (SELECT doc_id AS id, $dhashFpSql AS dhash FROM pr)
         |SELECT x.id AS a, y.id AS b,
         |  CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
         |FROM fp x JOIN fp y ON x.id < y.id
         |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
         |ORDER BY a, b""".stripMargin,
    "d9_curation" -> {
      val votes = TextAnalysis.stopwords.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_intersect($toksSql, $list)) AS v_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.stopwords.map(_._1)
      val best = s"greatest(${langs.map(l => s"v_$l").mkString(", ")})"
      val pred = langs.map(l => s"WHEN v_$l = best AND best > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH v AS (SELECT doc_id, source, text, $votes FROM documents),
         |w AS (SELECT *, $best AS best FROM v),
         |p AS (SELECT doc_id, source, text, $pred AS predicted_lang FROM w),
         |q AS (
         |  SELECT doc_id, source, text, predicted_lang,
         |    len($toksSql) AS n_tokens,
         |    (CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |      / len(text)) AS alpha_ratio
         |  FROM p
         |),
         |f AS (
         |  SELECT *, least(1.0, n_tokens / 64.0) * alpha_ratio AS quality_score
         |  FROM q
         |  WHERE predicted_lang = 'en'
         |),
         |g AS (SELECT * FROM f WHERE quality_score >= 0.5),
         |k AS (
         |  SELECT MIN(doc_id) AS doc_id
         |  FROM g
         |  GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |)
         |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM g JOIN k USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin
    },
    "d8_decontaminate" ->
      s"""WITH bl AS (
         |  SELECT DISTINCT ${h32Sql(s"unnest(${shSql(5)})")} AS h
         |  FROM documents WHERE doc_id < 5
         |),
         |sh5 AS (
         |  SELECT DISTINCT doc_id AS id, ${h32Sql(s"unnest(${shSql(5)})")} AS h
         |  FROM documents
         |),
         |bad AS (SELECT DISTINCT id FROM sh5 JOIN bl USING (h))
         |SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
         |FROM documents WHERE doc_id NOT IN (SELECT id FROM bad)
         |GROUP BY source ORDER BY source""".stripMargin,
    "t6_tfidf" ->
      // ratio-idf (N/df, no log): same per-doc ranking as log-idf, exact
      // small-integer ratios in doubles → bit-identical across engines
      s"""WITH toks AS (
         |  SELECT doc_id AS id, unnest($toksSql) AS term FROM documents
         |),
         |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |ranked AS (
         |  SELECT id, term, tf, df,
         |    CAST(tf AS DOUBLE) * n_docs / df AS tfidf,
         |    ROW_NUMBER() OVER (PARTITION BY id
         |      ORDER BY CAST(tf AS DOUBLE) * n_docs / df DESC, term) AS rank
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
         |)
         |SELECT id, rank, term, tf, df, tfidf FROM ranked
         |WHERE rank <= 5 AND id < 20 ORDER BY id, rank""".stripMargin,
    "m1_multimodal" ->
      // DuckDB md5(VARCHAR) hashes UTF-8 bytes = Spark md5(cast(text AS
      // binary)); strlen counts bytes, matching the decoded payload length.
      s"""SELECT source, COUNT(*) AS n_media,
         |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
         |  CAST(SUM(${h32Sql("text")} % 251) AS BIGINT) AS feature_sum
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "t7_repetition" ->
      // ratios are single divisions of exact integers → bit-identical;
      // top-1 tie-break (count DESC, unit ASC) is binary collation in both
      s"""WITH tc AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |),
         |tcc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tc GROUP BY 1, 2),
         |topt AS (
         |  SELECT doc_id, tok, c FROM (
         |    SELECT doc_id, tok, c,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
         |    FROM tcc) WHERE rn = 1
         |),
         |bg AS (SELECT doc_id, unnest(${shSql(2)}) AS g FROM documents),
         |bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |topb AS (
         |  SELECT doc_id, g, c FROM (
         |    SELECT doc_id, g, c,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
         |    FROM bgc) WHERE rn = 1
         |),
         |base AS (
         |  SELECT doc_id, len($toksSql) AS n_tokens, len(${shSql(2)}) AS n_bigrams,
         |    len(${shSql(3)}) AS n_trigrams,
         |    len(list_distinct(${shSql(3)})) AS nd_trigrams
         |  FROM documents
         |)
         |SELECT b.doc_id AS id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  t.tok AS top_token,
         |  CAST(t.c AS DOUBLE) / b.n_tokens AS top_token_ratio,
         |  p.g AS top_bigram,
         |  CAST(p.c AS DOUBLE) / b.n_bigrams AS top_bigram_ratio,
         |  CASE WHEN b.n_trigrams > 0
         |    THEN 1.0 - CAST(b.nd_trigrams AS DOUBLE) / b.n_trigrams
         |    ELSE 0.0 END AS dup_trigram_ratio
         |FROM base b
         |LEFT JOIN topt t ON t.doc_id = b.doc_id
         |LEFT JOIN topb p ON p.doc_id = b.doc_id
         |ORDER BY id LIMIT 25""".stripMargin,
    "t8_mixture" ->
      // floor(sqrt(bigint)) is exact in both engines; allocation is pure
      // integer arithmetic; weight/epochs are single double divisions
      s"""WITH t AS (SELECT source, len($toksSql) AS n FROM documents),
         |ps AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total_tokens
         |       FROM t GROUP BY source),
         |f AS (SELECT source, total_tokens,
         |        CAST(floor(sqrt(total_tokens)) AS BIGINT) AS fs FROM ps),
         |s AS (SELECT CAST(SUM(fs) AS BIGINT) AS sum_fs FROM f)
         |SELECT source, total_tokens,
         |  CAST(fs AS DOUBLE) / sum_fs AS weight,
         |  (1000000 * fs) // sum_fs AS alloc_tokens,
         |  CAST((1000000 * fs) // sum_fs AS DOUBLE) / total_tokens AS epochs,
         |  least(1.0, CAST((1000000 * fs) // sum_fs AS DOUBLE) / total_tokens)
         |    AS sample_rate
         |FROM f, s ORDER BY source""".stripMargin,
    // the grouped per-subspace k-means unroll + encode + integer ADC,
    // ranked (adc ASC, cid) per probe — every hashed column an integer
    "e13_pq_topk" ->
      s"""WITH ${pqCtes(4, 8, 2, "0, 1, 2")},
         |ranked AS (
         |  SELECT pid, cid, adc,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY adc, cid) AS rank
         |  FROM pq_adc)
         |SELECT pid, rank, cid, adc FROM ranked WHERE rank <= 10
         |ORDER BY pid, rank""".stripMargin,
    // the e3 recall tail over the PQ ranking's top-5
    "e14_pq_recall" ->
      s"""WITH ${pqCtes(4, 8, 2, "0, 1, 2")},
         |$exactTop5Cte,
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT pid, cid,
         |      ROW_NUMBER() OVER (PARTITION BY pid ORDER BY adc, cid) AS rank
         |    FROM pq_adc) z
         |  WHERE rank <= 5),
         |$recallTailSql""".stripMargin,
    // the IVFADC chain: coarse route -> residual PQ -> list-confined ADC,
    // ranked (adc ASC, cid) per probe — every hashed column an integer
    "e15_ivfadc_topk" ->
      s"""WITH ${ivfadcCtes(8, 2, 4, 8, 2, "0, 1, 2")},
         |ranked AS (
         |  SELECT pid, cid, adc,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY adc, cid) AS rank
         |  FROM iva_adc)
         |SELECT pid, rank, cid, adc FROM ranked WHERE rank <= 10
         |ORDER BY pid, rank""".stripMargin,
    // the e3 recall tail over the FULL IVFADC+R search: ADC top-64
    // shortlist, exact-cosine re-rank, top-5
    "e16_ivfadc_recall" ->
      s"""WITH ${ivfadcCtes(8, 2, 4, 8, 2, "0, 1, 2")},
         |$exactTop5Cte,
         |shortl AS (
         |  SELECT pid, cid FROM (
         |    SELECT pid, cid,
         |      ROW_NUMBER() OVER (PARTITION BY pid ORDER BY adc, cid) AS ar
         |    FROM iva_adc) z
         |  WHERE ar <= 64),
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT sl.pid, sl.cid,
         |      ROW_NUMBER() OVER (PARTITION BY sl.pid
         |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC,
         |          sl.cid) AS rank
         |    FROM shortl sl
         |    JOIN embeddings p ON p.vec_id = sl.pid
         |    JOIN embeddings c ON c.vec_id = sl.cid) z
         |  WHERE rank <= 5),
         |$recallTailSql""".stripMargin,
    "e3_ann_recall" ->
      s"""WITH ex AS (
         |  SELECT pid, cid FROM (
         |    SELECT p.vec_id AS pid, c.vec_id AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |    FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |    WHERE p.vec_id IN (0, 1, 2))
         |  WHERE rank <= 5
         |),
         |bucketed AS (
         |  SELECT vec_id AS cid, embedding AS cvec, ${bucketSql("embedding")} AS bucket
         |  FROM embeddings
         |),
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT p.cid AS pid, c.cid AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.cid
         |        ORDER BY ${cosSql("p.cvec", "c.cvec")} DESC, c.cid) AS rank
         |    FROM bucketed p JOIN bucketed c ON c.bucket = p.bucket AND c.cid <> p.cid
         |    WHERE p.cid IN (0, 1, 2))
         |  WHERE rank <= 5
         |),
         |hits AS (
         |  SELECT ex.pid, COUNT(*) AS hits
         |  FROM ex JOIN ap ON ap.pid = ex.pid AND ap.cid = ex.cid
         |  GROUP BY ex.pid
         |)
         |SELECT p.pid, COALESCE(h.hits, 0) AS hits,
         |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / 5 AS recall
         |FROM (SELECT DISTINCT pid FROM ex) p LEFT JOIN hits h USING (pid)
         |ORDER BY pid""".stripMargin,
    "e5_multiprobe_recall" ->
      // multi-probe = own bucket + every 1-bit-flip bucket: the join
      // condition is hamming(bucket_p, bucket_c) <= 1 over the 8 plane bits
      s"""WITH $exactTop5Cte,
         |bucketed AS (
         |  SELECT vec_id AS cid, embedding AS cvec, ${bucketSql("embedding")} AS bucket
         |  FROM embeddings
         |),
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT p.cid AS pid, c.cid AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.cid
         |        ORDER BY ${cosSql("p.cvec", "c.cvec")} DESC, c.cid) AS rank
         |    FROM bucketed p JOIN bucketed c
         |      ON bit_count(xor(c.bucket, p.bucket)) <= 1 AND c.cid <> p.cid
         |    WHERE p.cid IN (0, 1, 2))
         |  WHERE rank <= 5
         |),
         |$recallTailSql""".stripMargin,
    "e6_ivf_recall" ->
      // IVF: 16 centroids = the vec_ids with the smallest h32, corpus
      // assigned to its nearest centroid, probes search their 4 nearest
      // lists — the exact computation ivfTopK runs, in SQL
      s"""WITH $exactTop5Cte,
         |cent AS (
         |  SELECT vec_id AS centid, embedding AS centvec
         |  FROM embeddings
         |  ORDER BY ${h32Sql("CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT 16
         |),
         |assigned AS (
         |  SELECT cid, cvec, list_id FROM (
         |    SELECT e.vec_id AS cid, e.embedding AS cvec, c.centid AS list_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.centvec")} DESC, c.centid) AS rk
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rk = 1
         |),
         |probes AS (
         |  SELECT pid, pvec, list_id FROM (
         |    SELECT e.vec_id AS pid, e.embedding AS pvec, c.centid AS list_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.centvec")} DESC, c.centid) AS rk
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.vec_id IN (0, 1, 2))
         |  WHERE rk <= 4
         |),
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT p.pid AS pid, a.cid AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.pid
         |        ORDER BY ${cosSql("p.pvec", "a.cvec")} DESC, a.cid) AS rank
         |    FROM probes p JOIN assigned a
         |      ON a.list_id = p.list_id AND a.cid <> p.pid)
         |  WHERE rank <= 5
         |),
         |$recallTailSql""".stripMargin,
    // The k-means mirror, unrolled: quantize once onto the 10^-6 grid
    // (+10^7 offset keeps everything positive so // == Spark's div),
    // then 3 assign+update rounds and a final assignment — integer
    // argmin with cluster-id tie-break, centroid = (2S + n) // (2n)
    // per dimension (half-up integer mean), op-for-op the gate's math.
    "e7_kmeans" ->
      s"""$kmeansUnrollCtes,
         |n AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS cluster_n
         |      FROM a4 GROUP BY cl)
         |SELECT CAST(a.id AS BIGINT) AS vec_id, CAST(a.cl AS BIGINT) AS cluster,
         |  CAST(a.dist AS BIGINT) AS dist_q, n.cluster_n
         |FROM a4 a JOIN n USING (cl)
         |ORDER BY vec_id""".stripMargin,
    // purity over the SAME unrolled assignment: exact integer counts per
    // (cluster, label), dominant by (n DESC, label) row_number — both
    // mirrored — and purity as ONE division of the exact integers (the
    // t16 pattern; a single correctly-rounded FP op is identical on both
    // engines).
    "e8_cluster_purity" ->
      s"""$kmeansUnrollCtes,
         |lab AS (SELECT a.cl, CAST(e.label AS BIGINT) AS label
         |        FROM a4 a JOIN embeddings e ON e.vec_id = a.id),
         |counts AS (SELECT cl, label, CAST(COUNT(*) AS BIGINT) AS n
         |           FROM lab GROUP BY cl, label),
         |tot AS (SELECT cl, CAST(SUM(n) AS BIGINT) AS cluster_n
         |        FROM counts GROUP BY cl),
         |dom AS (SELECT cl, label, n FROM (
         |          SELECT cl, label, n,
         |            ROW_NUMBER() OVER (PARTITION BY cl
         |              ORDER BY n DESC, label) AS rk
         |          FROM counts)
         |        WHERE rk = 1)
         |SELECT CAST(d.cl AS BIGINT) AS cluster, t.cluster_n,
         |  d.label AS dominant_label, d.n AS dominant_n,
         |  CAST(d.n AS DOUBLE) / CAST(t.cluster_n AS DOUBLE) AS purity
         |FROM dom d JOIN tot t USING (cl)
         |ORDER BY cluster""".stripMargin,
    // SemDeDup over the SAME unrolled k-means assignment as e7: within-
    // cluster pairs (a4 self-join on cl), the e1-class cosine, min-id
    // keeper / count / max aggregates — all order-independent.
    "e11_semdedup" ->
      s"""$kmeansUnrollCtes,
         |cv AS (SELECT a.cl, a.id, e.embedding
         |       FROM a4 a JOIN embeddings e ON e.vec_id = a.id),
         |p AS (
         |  SELECT y.cl AS cluster, y.id AS vec_id, x.id AS xid,
         |    ${cosSql("x.embedding", "y.embedding")} AS sim
         |  FROM cv x JOIN cv y ON x.cl = y.cl AND x.id < y.id
         |  WHERE ${cosSql("x.embedding", "y.embedding")} >= 0.35
         |)
         |SELECT CAST(cluster AS BIGINT) AS cluster,
         |  CAST(vec_id AS BIGINT) AS vec_id,
         |  CAST(MIN(xid) AS BIGINT) AS keeper,
         |  CAST(COUNT(*) AS BIGINT) AS n_dups, MAX(sim) AS max_sim
         |FROM p GROUP BY 1, 2 ORDER BY cluster, vec_id""".stripMargin,
    "t9_mixture_sample" ->
      s"""WITH t AS (SELECT source, len($toksSql) AS n FROM documents),
         |ps AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total_tokens
         |       FROM t GROUP BY source),
         |f AS (SELECT source, total_tokens,
         |        CAST(floor(sqrt(total_tokens)) AS BIGINT) AS fs FROM ps),
         |s AS (SELECT CAST(SUM(fs) AS BIGINT) AS sum_fs FROM f),
         |a AS (SELECT source, total_tokens,
         |        (1000000 * fs) // sum_fs AS alloc FROM f, s),
         |kept AS (
         |  SELECT d.source, len(string_split_regex(lower(d.text), '\\s+')) AS n
         |  FROM documents d JOIN a USING (source)
         |  WHERE (${h60Sql("CAST(doc_id AS VARCHAR)")} % total_tokens) < alloc
         |)
         |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tokens_kept
         |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "t10_packing" ->
      s"""WITH d AS (
         |  SELECT source,
         |    ${h32Sql("CAST(doc_id AS VARCHAR)")} % 4 AS shard,
         |    doc_id AS id,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents
         |),
         |c AS (
         |  SELECT source, shard, id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d
         |)
         |SELECT source, shard, id, n_tokens,
         |  CAST((cum - n_tokens) // 128 AS BIGINT) AS seq_id,
         |  CAST((cum - n_tokens) % 128 AS BIGINT) AS seq_offset
         |FROM c ORDER BY source, shard, id LIMIT 30""".stripMargin,
    // the t9 sample chain feeding the t10 packing chain, reduced to the
    // per-shard manifest — COUNT/MAX/SUM plus the commutative bit_xor
    // h60 digest, every aggregate BIGINT-pinned
    "x39_emit_manifest" ->
      s"""WITH t AS (SELECT source, len($toksSql) AS n FROM documents),
         |ps AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total_tokens
         |       FROM t GROUP BY source),
         |f AS (SELECT source, total_tokens,
         |        CAST(floor(sqrt(total_tokens)) AS BIGINT) AS fs FROM ps),
         |s AS (SELECT CAST(SUM(fs) AS BIGINT) AS sum_fs FROM f),
         |a AS (SELECT source, total_tokens,
         |        (1000000 * fs) // sum_fs AS alloc FROM f, s),
         |kept AS (
         |  SELECT d.source, d.doc_id, d.text
         |  FROM documents d JOIN a USING (source)
         |  WHERE (${h60Sql("CAST(doc_id AS VARCHAR)")} % total_tokens) < alloc),
         |pk AS (
         |  SELECT source,
         |    ${h32Sql("CAST(doc_id AS VARCHAR)")} % 4 AS shard,
         |    doc_id AS id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM kept),
         |c AS (
         |  SELECT source, shard, id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM pk),
         |pc AS (
         |  SELECT source, shard, id, n_tokens,
         |    CAST((cum - n_tokens) // 128 AS BIGINT) AS seq_id,
         |    CAST((cum - n_tokens) % 128 AS BIGINT) AS seq_offset
         |  FROM c)
         |SELECT source, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MAX(seq_id) + 1 AS BIGINT) AS n_seqs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(bit_xor(${h60Sql("CAST(id AS VARCHAR) || '|' || " +
              "CAST(seq_id AS VARCHAR) || '|' || CAST(seq_offset AS VARCHAR)")})
         |    AS BIGINT) AS digest
         |FROM pc GROUP BY source, shard ORDER BY source, shard""".stripMargin,
    "t11_redaction" -> {
      val email = TextAnalysis.emailPattern
      val phone = TextAnalysis.phonePattern
      s"""WITH d AS (
         |  SELECT source,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |           || '@example.com or call +1 555-0100.'
         |      ELSE text END AS t2
         |  FROM documents
         |),
         |r AS (
         |  SELECT source,
         |    len(regexp_extract_all(t2, '$email')) AS n_emails,
         |    len(regexp_extract_all(
         |      regexp_replace(t2, '$email', '<EMAIL>', 'g'), '$phone')) AS n_phones,
         |    regexp_replace(regexp_replace(t2, '$email', '<EMAIL>', 'g'),
         |      '$phone', '<PHONE>', 'g') AS red
         |  FROM d
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_emails) AS BIGINT) AS emails_found,
         |  CAST(SUM(n_phones) AS BIGINT) AS phones_found,
         |  CAST(SUM(${h32Sql("red")}) AS BIGINT) AS redacted_checksum
         |FROM r GROUP BY source ORDER BY source""".stripMargin
    },
    // the t22 conjunction replayed end-to-end on the injected text: the
    // t17 rarity chain, the t20 sequenced PII chain (shared luhnTermsSql),
    // the t21 host extraction, the t7 trigram share and the t2 counts,
    // folded into the same integer bitmask and per-source digests
    "t22_quality_filter" -> {
      val email = TextAnalysis.emailPattern
      val phone = TextAnalysis.phonePattern
      val ip = TextAnalysis.ipv4Pattern
      val cc = TextAnalysis.ccPattern
      val url = TextAnalysis.urlHostPattern
      val luhnTerms = luhnTermsSql
      s"""WITH t AS (
         |  SELECT doc_id, source, CASE
         |    WHEN doc_id % 9 = 4 THEN text || ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com or call +1 555-0100.'
         |    WHEN doc_id % 9 = 7 THEN text || ' via https://spam' ||
         |      CAST(doc_id % 5 AS VARCHAR) || '.example.com/x and http://track' ||
         |      CAST(doc_id % 3 AS VARCHAR) || '.example.net/y'
         |    ELSE text END AS t2
         |  FROM documents),
         |toks AS (SELECT doc_id, string_split_regex(lower(t2), '\\s+') AS tk
         |         FROM t),
         |tri AS (SELECT doc_id, CASE WHEN len(tk) >= 3
         |          THEN list_transform(range(1, len(tk) - 1),
         |            i -> array_to_string(list_slice(tk, i, i + 2), ' '))
         |          ELSE [] END AS tg
         |        FROM toks),
         |base AS (
         |  SELECT t.doc_id, strlen(t2) AS total_chars,
         |    strlen(regexp_replace(lower(t2), '[^a-z]', '', 'g')) AS alpha_chars,
         |    len(tg) AS n_tri, len(list_distinct(tg)) AS nd_tri,
         |    len(regexp_extract_all(t2, '$url', 1)) AS n_urls
         |  FROM t JOIN tri ON tri.doc_id = t.doc_id),
         |dt AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
         |kk AS (SELECT doc_id, tok, COUNT(*) AS k FROM dt GROUP BY 1, 2),
         |ff AS (SELECT tok, CAST(SUM(k) AS BIGINT) AS cnt FROM kk GROUP BY tok),
         |ww AS (SELECT tok, CAST(1000000000000 AS BIGINT) // cnt AS w FROM ff),
         |rr AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
         |         CAST(SUM(w * k) AS BIGINT) AS rarity
         |       FROM kk JOIN ww USING (tok) GROUP BY doc_id),
         |e AS (SELECT doc_id,
         |        len(regexp_extract_all(t2, '$email')) AS n_emails,
         |        regexp_replace(t2, '$email', '<EMAIL>', 'g') AS t1x FROM t),
         |c1 AS (SELECT *, regexp_replace(regexp_extract(t1x, '$cc', 0),
         |         '[^0-9]', '', 'g') AS ccd,
         |         regexp_extract(t1x, '$cc', 0) AS cand FROM e),
         |c2 AS (SELECT doc_id, n_emails,
         |         CASE WHEN ($luhnTerms) % 10 = 0 THEN 1 ELSE 0 END AS n_ccs,
         |         CASE WHEN ($luhnTerms) % 10 = 0
         |              THEN regexp_replace(t1x, '\\b' || cand || '\\b',
         |                                  '<CC>', 'g') ELSE t1x END AS t2x
         |       FROM c1),
         |i AS (SELECT doc_id, n_emails, n_ccs,
         |        len(regexp_extract_all(t2x, '$ip')) AS n_ips,
         |        regexp_replace(t2x, '$ip', '<IP>', 'g') AS t3x FROM c2),
         |p AS (SELECT doc_id, CAST(n_emails + n_ccs + n_ips +
         |        len(regexp_extract_all(t3x, '$phone')) AS BIGINT) AS n_pii
         |      FROM i),
         |v AS (
         |  SELECT b.doc_id, rr.n_tokens,
         |    (CASE WHEN rr.n_tokens < 16 OR rr.n_tokens > 96 THEN 1 ELSE 0 END
         |     + CASE WHEN b.alpha_chars * 1000 < b.total_chars * 810
         |            THEN 2 ELSE 0 END
         |     + CASE WHEN b.n_tri > 0 AND
         |              (b.n_tri - b.nd_tri) * 1000 > b.n_tri * 40
         |            THEN 4 ELSE 0 END
         |     + CASE WHEN rr.n_tokens > 0 AND
         |              rr.rarity // rr.n_tokens > 1300000000
         |            THEN 8 ELSE 0 END
         |     + CASE WHEN p.n_pii > 1 THEN 16 ELSE 0 END
         |     + CASE WHEN b.n_urls > 1 THEN 32 ELSE 0 END) AS fm
         |  FROM base b JOIN rr USING (doc_id) JOIN p USING (doc_id))
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN fm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(CASE WHEN fm = 0 THEN n_tokens END) AS BIGINT)
         |    AS tokens_kept,
         |  CAST(SUM(CASE WHEN fm & 1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_len,
         |  CAST(SUM(CASE WHEN fm & 2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_alpha,
         |  CAST(SUM(CASE WHEN fm & 4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_rep,
         |  CAST(SUM(CASE WHEN fm & 8 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_rare,
         |  CAST(SUM(CASE WHEN fm & 16 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_pii,
         |  CAST(SUM(CASE WHEN fm & 32 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail_url
         |FROM v JOIN documents d ON d.doc_id = v.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },
    "t20_redaction_extended" -> {
      val email = TextAnalysis.emailPattern
      val phone = TextAnalysis.phonePattern
      val ip = TextAnalysis.ipv4Pattern
      val cc = TextAnalysis.ccPattern
      val luhnTerms = luhnTermsSql
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |    CASE
         |      WHEN doc_id % 5 <= 1 THEN text || ' card ' ||
         |        substr(ccs, 1, 4) || ' ' || substr(ccs, 5, 4) || ' ' ||
         |        substr(ccs, 9, 4) || ' ' || substr(ccs, 13, 4) || ' on file.'
         |      WHEN doc_id % 5 = 2 THEN text || ' from 203.0.' ||
         |        CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |        CAST(doc_id % 97 + 1 AS VARCHAR) || ' node'
         |      WHEN doc_id % 5 = 3 THEN text || ' contact user' ||
         |        CAST(doc_id AS VARCHAR) || '@example.com or call +1 555-0100.'
         |      ELSE text END AS t0
         |  FROM (SELECT *, lpad(CAST((doc_id * 2654435761) %
         |          10000000000000000 AS VARCHAR), 16, '0') AS ccs
         |        FROM documents)
         |),
         |e AS (SELECT source, doc_id,
         |        len(regexp_extract_all(t0, '$email')) AS n_emails,
         |        regexp_replace(t0, '$email', '<EMAIL>', 'g') AS t1 FROM d),
         |c1 AS (SELECT *, regexp_replace(regexp_extract(t1, '$cc', 0),
         |         '[^0-9]', '', 'g') AS ccd,
         |         regexp_extract(t1, '$cc', 0) AS cand FROM e),
         |c2 AS (SELECT source, doc_id, n_emails,
         |         CASE WHEN ($luhnTerms) % 10 = 0 THEN 1 ELSE 0 END AS n_ccs,
         |         CASE WHEN ($luhnTerms) % 10 = 0
         |              THEN regexp_replace(t1, '\\b' || cand || '\\b',
         |                                  '<CC>', 'g') ELSE t1 END AS t2
         |       FROM c1),
         |i AS (SELECT source, n_emails, n_ccs,
         |        len(regexp_extract_all(t2, '$ip')) AS n_ips,
         |        regexp_replace(t2, '$ip', '<IP>', 'g') AS t3 FROM c2),
         |r AS (SELECT source, n_emails, n_ccs, n_ips,
         |        len(regexp_extract_all(t3, '$phone')) AS n_phones,
         |        regexp_replace(t3, '$phone', '<PHONE>', 'g') AS red FROM i)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_emails) AS BIGINT) AS emails_found,
         |  CAST(SUM(n_ccs) AS BIGINT) AS ccs_found,
         |  CAST(SUM(n_ips) AS BIGINT) AS ips_found,
         |  CAST(SUM(n_phones) AS BIGINT) AS phones_found,
         |  CAST(SUM(${h32Sql("red")}) AS BIGINT) AS redacted_checksum
         |FROM r GROUP BY source ORDER BY source""".stripMargin
    },
    // the t21 injection + host extraction + last-two-label reduction
    // replayed: engines agree on the RE2-safe patterns and every output
    // is an integer count. The host pattern INTERPOLATES the shared
    // TextAnalysis.urlHostPattern constant (r18 review: the old literal
    // copy had to be hand-edited in lockstep with the engine — the one
    // drift hazard of the oracle-twin scheme); in the s-interpolator the
    // remaining literal backslashes are doubled so single backslashes
    // still reach DuckDB verbatim.
    "t21_domain_stats" ->
      s"""WITH t2 AS (
         |  SELECT doc_id, CASE
         |    WHEN doc_id % 3 = 0 THEN text || ' via https://www.mirror' ||
         |      CAST(doc_id % 7 AS VARCHAR) || '.example' ||
         |      CAST(doc_id % 5 AS VARCHAR) ||
         |      '.com/path?q=1 and http://cdn.Site' ||
         |      CAST(doc_id % 7 AS VARCHAR) || '.net/x'
         |    WHEN doc_id % 3 = 1 THEN text || ' at http://host' ||
         |      CAST(doc_id % 11 AS VARCHAR) || '.org page'
         |    ELSE text END AS text2
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(lower(text2), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM t2),
         |hosts AS (
         |  SELECT doc_id,
         |    lower(unnest(regexp_extract_all(text2,
         |      '${TextAnalysis.urlHostPattern}', 1)))
         |      AS host
         |  FROM t2),
         |dom AS (
         |  SELECT doc_id,
         |    CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = ''
         |         THEN host
         |         ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS domain
         |  FROM hosts),
        |per AS (
        |  SELECT doc_id, domain, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM dom GROUP BY doc_id, domain)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(cnt) AS BIGINT) AS n_mentions,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM per JOIN toks USING (doc_id)
        |GROUP BY domain ORDER BY n_docs DESC, domain LIMIT 20""".stripMargin,
    "t12_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id, $toksSql AS toks FROM documents WHERE doc_id < 10
         |),
         |st AS (
         |  SELECT id, toks,
         |    unnest(range(1, greatest(len(toks) - 31, 1) + 1, 16)) AS s
         |  FROM t
         |)
         |SELECT id, CAST((s - 1) // 16 AS BIGINT) AS chunk_idx,
         |  CAST(s AS BIGINT) AS start_token,
         |  CAST(len(list_slice(toks, s, s + 31)) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(list_slice(toks, s, s + 31), ' ') AS chunk_text
         |FROM st ORDER BY id, chunk_idx""".stripMargin,
    "t13_dupspans" ->
      // mirror of TextAnalysis.duplicatedSpans (CTE chain shared with the
      // t14 composite): per-doc rollup over all docs, zero-filled.
      s"""WITH ${dupSpanCtes(4)},
         |perdoc AS (
         |  SELECT doc_id, COUNT(*) AS n_spans, SUM(len) AS dup_tokens,
         |    MIN(start) AS first_start
         |  FROM spans GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(COALESCE(p.first_start, 0) AS BIGINT) AS first_start
         |FROM documents d LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "t15_despan" -> {
      val n = 4
      s"""WITH ${dupSpanCtes(n)},
         |covered AS (
         |  SELECT DISTINCT m.doc_id, u.p AS pos
         |  FROM marked m, UNNEST(range(m.pos, m.pos + $n)) AS u(p)),
         |tk AS (
         |  SELECT t.doc_id, u.i AS pos, t.toks[u.i] AS tok
         |  FROM t13t t, UNNEST(range(1, len(t.toks) + 1)) AS u(i)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok FROM tk t
         |  LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |  WHERE c.pos IS NULL),
         |rebuilt AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         |    COUNT(*) AS after
         |  FROM kept GROUP BY 1),
         |perdoc AS (
         |  SELECT d.doc_id, d.source, len($toksSql) AS before,
         |    COALESCE(r.after, 0) AS after,
         |    COALESCE(r.clean_text, '') AS clean_text
         |  FROM documents d LEFT JOIN rebuilt r USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(before - after) AS BIGINT) AS tokens_removed,
         |  CAST(SUM(CASE WHEN after < before THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_changed,
         |  CAST(SUM(${h32Sql("clean_text")}) AS BIGINT) AS clean_checksum
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
    },
    "t14_corpus_profile" -> {
      val fpSql =
        h32Sql("regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')")
      s"""WITH base AS (
         |  SELECT source, doc_id, len($toksSql) AS n_toks,
         |    len(text) AS n_chars,
         |    len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
         |    $fpSql AS fp
         |  FROM documents),
         |dupfp AS (SELECT fp FROM base GROUP BY fp HAVING COUNT(*) >= 2),
         |persrc AS (
         |  SELECT source, COUNT(*) AS n_docs, SUM(n_toks) AS total_tokens,
         |    SUM(n_chars) AS total_chars, SUM(n_alpha) AS alpha_chars,
         |    SUM(CASE WHEN n_toks < 32 THEN 1 ELSE 0 END) AS n_short,
         |    SUM(CASE WHEN fp IN (SELECT fp FROM dupfp) THEN 1 ELSE 0 END)
         |      AS n_exact_dup
         |  FROM base GROUP BY 1),
         |$langPredCtes,
         |domc AS (SELECT source, predicted_lang, COUNT(*) AS c
         |         FROM lp GROUP BY 1, 2),
         |dom AS (SELECT source, predicted_lang AS dominant_lang FROM (
         |  SELECT source, predicted_lang,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY c DESC, predicted_lang) AS rn
         |  FROM domc) WHERE rn = 1),
         |${dupSpanCtes(4)},
         |sp AS (
         |  SELECT d.source, SUM(s.len) AS dupspan_tokens
         |  FROM spans s JOIN documents d USING (doc_id) GROUP BY 1)
         |SELECT p.source, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(total_tokens AS BIGINT) AS total_tokens,
         |  CAST(total_chars AS BIGINT) AS total_chars,
         |  CAST(alpha_chars AS BIGINT) AS alpha_chars,
         |  CAST(alpha_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
         |    AS alpha_ratio,
         |  CAST(n_short AS BIGINT) AS n_short, dom.dominant_lang,
         |  CAST(n_exact_dup AS BIGINT) AS n_exact_dup,
         |  CAST(COALESCE(sp.dupspan_tokens, 0) AS BIGINT) AS dupspan_tokens
         |FROM persrc p
         |JOIN dom USING (source)
         |LEFT JOIN sp ON sp.source = p.source
         |ORDER BY p.source""".stripMargin
    },
    "e4_quantized_recall" -> {
      val qdot = "list_sum(list_transform(range(1, 65), i -> a.qvec[i] * b.qvec[i]))"
      val qnorm = (t: String) =>
        s"sqrt(list_sum(list_transform(range(1, 65), i -> $t.qvec[i] * $t.qvec[i])))"
      s"""WITH ex AS (
         |  SELECT pid, cid FROM (
         |    SELECT p.vec_id AS pid, c.vec_id AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |    FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |    WHERE p.vec_id IN (0, 1, 2))
         |  WHERE rank <= 10
         |),
         |q AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> floor(x::DOUBLE * 127 /
         |      greatest(list_max(list_transform(embedding, y -> abs(y::DOUBLE))), 1e-30)
         |      + 0.5)) AS qvec
         |  FROM embeddings
         |),
         |ap AS (
         |  SELECT pid, cid FROM (
         |    SELECT a.id AS pid, b.id AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY a.id
         |        ORDER BY $qdot / (${qnorm("a")} * ${qnorm("b")}) DESC, b.id) AS rank
         |    FROM q a JOIN q b ON b.id <> a.id
         |    WHERE a.id IN (0, 1, 2))
         |  WHERE rank <= 10
         |),
         |hits AS (
         |  SELECT ex.pid, COUNT(*) AS hits
         |  FROM ex JOIN ap ON ap.pid = ex.pid AND ap.cid = ex.cid
         |  GROUP BY ex.pid
         |)
         |SELECT p.pid, COALESCE(h.hits, 0) AS hits,
         |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / 10 AS recall
         |FROM (SELECT DISTINCT pid FROM ex) p LEFT JOIN hits h USING (pid)
         |ORDER BY pid""".stripMargin
    })
}
