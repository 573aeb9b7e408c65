package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-vote heuristic), quality scoring (length/char-class/stopword
  * ratios), token counting, and content fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they run at scan speed and are
  * SQL-oracle-checkable.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram-free heuristic.
    * Deterministic and mirrored in the oracle SQL.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Stopword votes per language: |tokens ∩ stopwords(lang)| (distinct). */
  def langVotes(toks: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }

  /** Predicted language = argmax votes, ties broken by language name
    * (deterministic); no votes at all → 'und' (undetermined).
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val votes = langVotes(toks)
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = votes.foldRight(lit("und")) { case ((lang, v), acc) =>
      when(v === best && best > 0, lang).otherwise(acc)
    }
    // foldRight + otherwise chain means the FIRST language (asc order) with
    // the max vote wins — mirrored in SQL with a CASE over the same order.
    df.withColumn("predicted_lang", pred)
  }

  /** Quality metrics: token count, char count, alpha ratio, space ratio,
    * avg token length, and a composite [0,1] score.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val nAlpha = length(regexp_replace(lower(t), "[^a-z]", "")).cast("double")
    val nSpace = length(regexp_replace(t, "[^ ]", "")).cast("double")
    val nToks = size(toks).cast("double")
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("alpha_ratio", nAlpha / nChars)
      .withColumn("space_ratio", nSpace / nChars)
      .withColumn("avg_token_len", (nChars - nSpace) / nToks)
      .withColumn("quality_score",
        least(lit(1.0), nToks / lit(64.0)) * col("alpha_ratio"))
  }

  /** Corpus token statistics per grouping column. */
  def tokenStats(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol), tokens(col(textCol)).as("toks"))
      .select(col(groupCol), size(col("toks")).as("n"),
        size(array_distinct(col("toks"))).as("nd"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(col("nd")).as("total_distinct_tokens"),
        max(col("n")).as("max_tokens"))

  /** Corpus vocabulary report per group — the curation-dashboard composite
    * a mixture designer reads before weighting sources: corpus-wide type
    * count (distinct tokens), token total, type/token ratio, and the top-k
    * terms by frequency. Everything is exact integers except the single
    * final int→double TTR division (bit-identical across engines), the
    * term-count aggregation partial-combines map-side, and the top-k rides
    * a PER-GROUP window (a 100 TB corpus never sees a global sort — the
    * t13 rule).
    */
  def vocabularyReport(df: DataFrame, textCol: String, groupCol: String,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_tokens"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("term"))
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .join(totals, Seq(groupCol))
      .select(col(groupCol), col("rank"), col("term"), col("cnt"),
        col("n_types"), col("n_tokens"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("type_token_ratio"))
  }

  /** GPT-2-style BPE pre-tokenization regex: contractions, letter runs,
    * digit runs, punctuation runs (each optionally space-prefixed) — the
    * units a subword tokenizer splits further. RE2-compatible so the DuckDB
    * oracle applies the identical pattern.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** Pieces from BPE pre-tokenization. */
  def bpePieces(t: Column): Column =
    regexp_extract_all(t, lit(bpePattern), lit(0))

  /** Estimated subword count: each piece contributes ceil(chars/4) — the
    * ~4-chars-per-token rule of thumb, cheap enough to run at scan speed
    * over 100 TB where a real tokenizer would dominate the job.
    */
  def bpeTokenEstimate(t: Column): Column =
    aggregate(bpePieces(t), lit(0L),
      (acc, p) => acc + floor((length(p) + lit(3)) / lit(4)).cast("long"))

  /** Per-group BPE token statistics (piece count + subword estimate). */
  def bpeTokenStats(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol),
        size(bpePieces(col(textCol))).as("n_pieces"),
        bpeTokenEstimate(col(textCol)).as("n_subwords"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_pieces")).as("total_pieces"),
        sum(col("n_subwords")).as("total_subwords"))

  /** Frozen BPE merge table for [[bpeTokenCount]] — the output of
    * [[learnBpeMerges]](documents at sf0.01, 24), pinned as a literal so
    * the t19 oracle can mirror the application chain statically (a
    * runtime-learned table cannot be interpolated into the driver's
    * static oracle SQL). Rank = priority: earlier merges apply first,
    * and later entries may merge PRODUCTS of earlier ones — the
    * multi-level structure that distinguishes real BPE from any
    * per-piece length heuristic. Letters only by construction (enforced
    * below), so the oracle's quoted literals never need escaping.
    */
  val bpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"))

  require(bpeMerges.forall { case (a, b) => (a + b).matches("[A-Za-z]+") },
    "bpeMerges must stay letter-only (oracle SQL literals)")

  /** One BPE pre-token as a spaced symbol string: every symbol rendered
    * as ` sym ` so adjacent symbols are separated by TWO spaces. The
    * invariant makes a plain left-to-right replace-all of ` a  b ` →
    * ` ab ` implement exactly one BPE merge step — each match consumes
    * only its own symbols' flanking spaces, so the next symbol still
    * starts a fresh match (a run `l l l l` merges to `ll ll`, never the
    * off-by-one `ll l ll` a single-space encoding produces under
    * non-overlapping scan). The piece's leading space (the GPT-2 word
    * marker) is trimmed: a token COUNTER fuses it into the word exactly
    * as the reference tokenizers do.
    */
  private def bpeSpaced(p: Column): Column =
    regexp_replace(ltrim(p), "(.)", " $1 ")

  /** Apply a ranked merge table to a spaced symbol string — one literal
    * (non-regex) replace per merge, identical semantics in DuckDB's
    * `replace`, so the oracle chain mirrors op for op.
    */
  def bpeApplyMerges(spaced: Column,
      merges: Seq[(String, String)] = bpeMerges): Column =
    merges.foldLeft(spaced) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }

  /** Real BPE token count of a text column under a ranked merge table:
    * pieces from [[bpePieces]], each char-split into spaced symbols,
    * merges applied in rank order, surviving symbols counted. Pure
    * column HOFs — no UDF, scan-speed at 100 TB; the merge table is a
    * plan literal, broadcast with the task binary.
    */
  def bpeTokenCount(t: Column,
      merges: Seq[(String, String)] = bpeMerges): Column =
    aggregate(bpePieces(t), lit(0L), (acc, p) =>
      acc + size(split(trim(bpeApplyMerges(bpeSpaced(p), merges)),
        "  ", -1)).cast("long"))

  /** Per-group real-BPE token statistics (the t19 gate shape — t5's
    * [[bpeTokenStats]] stays as the cheap ceil(chars/4) estimator).
    */
  def bpeRealTokenStats(df: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)] = bpeMerges): DataFrame =
    df.select(col(groupCol),
        size(bpePieces(col(textCol))).as("n_pieces"),
        bpeTokenCount(col(textCol), merges).as("n_tok"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_pieces")).as("total_pieces"),
        sum(col("n_tok")).as("total_tokens"))

  /** Learn a BPE merge table from a corpus (Sennrich et al. 2016, ACL —
    * "Neural Machine Translation of Rare Words with Subword Units"):
    * per round, count adjacent symbol pairs across the corpus under the
    * merges learned so far and append the most frequent (ties broken by
    * (a, b) ascending — deterministic). Counting is fully distributed
    * (explode → map-side-combined groupBy); only the argmax row (two
    * short strings) ever reaches the driver per round, and the spaced
    * corpus is checkpointed once with the chain re-applied per round —
    * n rounds = n aggregation jobs, no growing lineage. Stops early
    * when no pair repeats.
    */
  def learnBpeMerges(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] = {
    val spark = df.sparkSession
    val base = df.select(explode(bpePieces(col(textCol))).as("p"))
      .select(bpeSpaced(col("p")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var done = false
      while (!done && merges.size < nMerges) {
        val syms = base
          .select(split(trim(bpeApplyMerges(col("s"), merges.toSeq)),
            "  ", -1).as("y"))
          .where(size(col("y")) >= 2)
        val top = syms.select(explode(transform(
            sequence(lit(0), size(col("y")) - 2),
            i => struct(element_at(col("y"), i + 1).as("a"),
              element_at(col("y"), i + 2).as("b")))).as("bg"))
          .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2) // a pair seen once is noise, not a rule
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else merges += ((top(0).getString(0), top(0).getString(1)))
      }
    } finally graft.util.Checkpoints.release(spark,
      graft.util.Checkpoints.idsOf(base))
    merges.toSeq
  }

  /** Top-k TF-IDF terms per document. idf is the raw ratio N/df (no log):
    * the ranking it induces per fixed document is identical to log-idf, and
    * the score stays an exact small-integer ratio in doubles — so the DuckDB
    * oracle matches bit-for-bit where a libm `ln` would not. Distributed
    * shape: explode → two groupBys (map-side combinable) → broadcast-able
    * doc-count join → per-doc window top-k; no all-pairs, no driver state.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // tf rows are distinct (id, term): df = count per term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf").cast("double") * col("n_docs") / col("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Repetition quality signals (the Gopher-filter family): documents
    * dominated by a few repeated tokens or n-grams are low-quality for
    * training. Per document:
    *   - top_token / top_token_ratio: most frequent token and the fraction
    *     of all tokens it accounts for (ties → lexicographically first);
    *   - top_bigram / top_bigram_ratio: same over word 2-grams;
    *   - dup_trigram_ratio: fraction of word 3-grams that are repeats
    *     (1 − distinct/total).
    * Distributed shape: explode → map-side-combinable groupBy → per-doc
    * top-1 window (partitioned by doc, never global); the trigram ratio is
    * a pure column expression. Ratios are single-division doubles of exact
    * integers, so the DuckDB oracle matches bit-for-bit.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // top-1 via min(struct(-cnt, unit)): same (count DESC, unit ASC)
    // tie-break as a row_number window, but fully map-side combinable —
    // no per-doc sort, one partial-aggregated shuffle instead of a window
    def top1(unit: DataFrame, unitCol: String): DataFrame =
      unit.groupBy(col("id"), col(unitCol)).agg(count(lit(1)).as("cnt"))
        .groupBy(col("id"))
        .agg(min(struct((-col("cnt")).as("neg"), col(unitCol).as("u"))).as("m"))
        .select(col("id"), col("m.u").as(unitCol), (-col("m.neg")).as("cnt"))
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol).as("id"),
      size(toks).as("n_tokens"),
      size(shingles(toks, 2)).as("n_bigrams"),
      size(shingles(toks, 3)).as("n_trigrams"),
      size(array_distinct(shingles(toks, 3))).as("nd_trigrams"))
    val topTok = top1(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok")), "tok")
      .select(col("id"), col("tok").as("top_token"), col("cnt").as("top_token_cnt"))
    val topBig = top1(
      df.select(col(idCol).as("id"),
        explode(shingles(tokens(col(textCol)), 2)).as("bigram")), "bigram")
      .select(col("id"), col("bigram").as("top_bigram"), col("cnt").as("top_bigram_cnt"))
    base.join(topTok, Seq("id"), "left").join(topBig, Seq("id"), "left")
      .select(col("id"), col("n_tokens").cast("long").as("n_tokens"),
        col("top_token"),
        (col("top_token_cnt").cast("double") / col("n_tokens")).as("top_token_ratio"),
        col("top_bigram"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams")).as("top_bigram_ratio"),
        when(col("n_trigrams") > 0,
          lit(1.0) - col("nd_trigrams").cast("double") / col("n_trigrams"))
          .otherwise(lit(0.0)).as("dup_trigram_ratio"))
  }

  /** Domain-mixing weights under a global token budget — the sampling plan
    * a multi-source pre-training run starts from. Per-source token totals
    * are flattened with a 0.5-temperature power (floor(sqrt(T)), exact in
    * both engines: sqrt of an exact integer is correctly rounded, floor is
    * exact), normalized into weights, and the budget is allocated by
    * integer arithmetic so the plan is bit-deterministic:
    *   alloc_s = (budget * fs_s) div sum(fs), fs_s = floor(sqrt(T_s)).
    * sample_rate = min(1, alloc/T); epochs = alloc/T (> 1 → the source
    * repeats). The cross-source total rides a broadcast single-row join,
    * not a global window.
    */
  def mixtureWeights(df: DataFrame, sourceCol: String, textCol: String,
      budget: Long): DataFrame = {
    val perSource = df
      .select(col(sourceCol).as("source"), size(tokens(col(textCol))).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("total_tokens"))
      .withColumn("fs", floor(sqrt(col("total_tokens"))).cast("long"))
    val totals = perSource.agg(sum(col("fs")).as("sum_fs"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("total_tokens"),
        (col("fs").cast("double") / col("sum_fs")).as("weight"),
        expr(s"($budget * fs) div sum_fs").as("alloc_tokens"))
      .withColumn("epochs", col("alloc_tokens").cast("double") / col("total_tokens"))
      .withColumn("sample_rate", least(lit(1.0), col("epochs")))
  }

  /** Execute a mixture plan: deterministic per-source hash sampling at the
    * allocated rate — a document survives iff h32(id) mod total_tokens <
    * alloc_tokens, i.e. with probability alloc/total (everything survives
    * when the source is set to repeat, epochs >= 1). The tiny per-source
    * plan rides a broadcast join and the predicate is partition-local (the
    * x15 sampling pattern), so the corpus scan itself never shuffles.
    */
  def sampleByMixture(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budget: Long): DataFrame = {
    val w = mixtureWeights(df, sourceCol, textCol, budget)
      .select(col("source").as(sourceCol), col("total_tokens"), col("alloc_tokens"))
    df.join(broadcast(w), Seq(sourceCol))
      // h60, not h32: total_tokens exceeds 2^32 at production scale, and
      // h32 % total would then degenerate to h32 (rate = alloc/2^32, not
      // alloc/total)
      .where(h60(col(idCol).cast("string")) % col("total_tokens") < col("alloc_tokens"))
      .drop("total_tokens", "alloc_tokens")
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences. Documents are sharded deterministically (h32(id) mod
    * nShards) and packed greedily in id order within each (source, shard):
    * seq_id = (running token total before the doc) div seqLen — the
    * standard "concat then cut every seqLen tokens" packing, computed with
    * a cumulative-sum window. The window partitions on (source, shard),
    * never globally: a 100 TB source splits across nShards independent
    * partitions instead of serializing through one sort, and packing
    * quality is unaffected because sequences never cross shards anyway.
    * Output: (source, shard, id, n_tokens, seq_id, seq_offset) where
    * seq_offset is the token position the doc starts at inside its shard's
    * concatenation.
    */
  def packSequences(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, seqLen: Long, nShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(sourceCol).as("source"),
        pmod(h32(col(idCol).cast("string")), lit(nShards)).as("shard"),
        col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("source"), col("shard"), col("id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $seqLen").as("seq_id"),
        ((col("cum") - col("n_tokens")) % lit(seqLen)).as("seq_offset"))
  }

  /** Training-corpus emit manifest (r19 — the pipeline's actual LAST
    * step, priced end-to-end): mixture-sample the corpus
    * ([[sampleByMixture]]'s deterministic h60 rate draw), pack the
    * survivors into fixed-token training sequences ([[packSequences]]'s
    * (source, shard)-confined cumulative window), and reduce to the
    * per-(source, shard) manifest a trainer consumes: n_docs, n_seqs,
    * n_tokens and an ORDER-INDEPENDENT content digest —
    * bit_xor of h60("id|seq_id|seq_offset") — so equality of manifests
    * proves byte-identical shard content without any global sort (XOR
    * commutes; a LONG sum of 2^60-class hashes would overflow).
    *
    * Scale shape: the corpus scan never shuffles for the sample (tiny
    * broadcast plan + partition-local predicate); the ONLY data-sized
    * exchange keys on (source, shard) for the packing window, and the
    * manifest aggregate reuses that partitioning (no second exchange) —
    * PlanAuditSpec pins exactly this. The write side is the same
    * relation `.write.partitionBy("source", "shard")` — the manifest is
    * the receipt to check that write against.
    */
  def emitManifest(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budget: Long, seqLen: Long,
      nShards: Int = 64): DataFrame = {
    val packed = packSequences(
        sampleByMixture(df, idCol, sourceCol, textCol, budget),
        idCol, sourceCol, textCol, seqLen, nShards)
      .withColumn("__h", TextHash.h60(
        concat_ws("|", col("id"), col("seq_id"), col("seq_offset"))))
    packed.groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        (max(col("seq_id")) + 1L).as("n_seqs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        expr("bit_xor(__h)").cast("long").as("digest"))
  }

  /** PII scrubbing: replace emails and phone-number-shaped digit runs with
    * typed placeholder tokens, and count what was found. Pure codegen'd
    * regexp expressions (RE2-compatible so the DuckDB oracle applies the
    * identical patterns) — runs at scan speed, no shuffle.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+?[0-9][0-9\\- ]{7,}[0-9]"

  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(emailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(
          regexp_replace(t, emailPattern, "<EMAIL>"), lit(phonePattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))
  }

  /** Additional PII span shapes (r16): dotted-quad IPv4 with exact octet
    * ranges, and 16-digit card numbers in the common 4×4 grouping
    * (spaces/dashes allowed). Both RE2-compatible — no backreferences —
    * so the DuckDB oracle applies the identical strings.
    */
  val ipv4Pattern: String =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b"
  val ccPattern: String = "\\b[0-9]{4}([- ]?[0-9]{4}){3}\\b"

  /** Mod-10 Luhn checksum over a non-empty all-digit string column: from
    * the RIGHT, every second digit doubles (minus 9 past 9), and a valid
    * number sums to 0 mod 10. One integer `aggregate` fold — codegen'd,
    * no UDF, and replayable as unrolled SQL terms at a fixed length.
    */
  def luhnChecksum(digits: Column): Column =
    aggregate(
      sequence(lit(1), length(digits)),
      lit(0L),
      (acc, i) => {
        val d = (ascii(digits.substr(i, lit(1))) - 48).cast("long")
        val doubled = (length(digits) - i) % 2 === 1
        acc + when(doubled, d * 2L - when(d >= 5L, 9L).otherwise(0L))
          .otherwise(d)
      }) % 10

  /** Extended PII scrubbing (r16): emails, Luhn-VALID card numbers, IPv4
    * addresses, then phone-shaped digit runs — in that order, each pass
    * over the previous pass's output so every count is unambiguous. Card
    * candidates come from [[ccPattern]] and only spans whose digits pass
    * the Luhn check are redacted (the check is real arithmetic over the
    * bytes, not a doc-id oracle); failing candidates fall through to the
    * phone pass, which naturally swallows digit runs — deterministic
    * either way. Everything is codegen'd regex + HOF folds over the text
    * column: map-only, runs at scan speed at any corpus size.
    */
  def redactPiiExtended(df: DataFrame, textCol: String): DataFrame = {
    // each pass is STAGED through an intermediate column, never re-inlined
    // into its consumers: CollapseProject refuses to duplicate non-cheap
    // expressions, so the Luhn candidate filter and every regex pass run
    // ONCE per row (a single nested expression tree would recompute the
    // candidate filter in all four consumers — measured 4× regex work),
    // while the stacked Projects still fuse into one codegen stage
    df.withColumn("__after_email",
        regexp_replace(col(textCol), emailPattern, "<EMAIL>"))
      .withColumn("__cc_valid", filter(
        regexp_extract_all(col("__after_email"), lit(ccPattern), lit(0)),
        c => luhnChecksum(regexp_replace(c, "[^0-9]", "")) === 0L))
      // distinct spans only for the replace fold (each regexp_replace is
      // all-occurrences, so a duplicate span needs one pass, not two);
      // n_ccs still counts every valid MATCH. The replace re-anchors the
      // span with \b on both sides (r16 review) so a valid span EMBEDDED
      // in a longer token — which the extraction regex deliberately did
      // not match — is not rewritten; candidates are digits/space/dash
      // only, so the built pattern needs no escaping
      .withColumn("__after_cc", aggregate(array_distinct(col("__cc_valid")),
        col("__after_email"), (t, c) => regexp_replace(t,
          concat(lit("\\b"), c, lit("\\b")), lit("<CC>"))))
      .withColumn("__after_ip",
        regexp_replace(col("__after_cc"), ipv4Pattern, "<IP>"))
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0))))
      .withColumn("n_ccs", size(col("__cc_valid")))
      .withColumn("n_ips",
        size(regexp_extract_all(col("__after_cc"), lit(ipv4Pattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("__after_ip"), lit(phonePattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(col("__after_ip"), phonePattern, "<PHONE>"))
      .drop("__after_email", "__cc_valid", "__after_cc", "__after_ip")
  }

  /** Sliding-window chunking: split each document's token stream into
    * overlapping context windows of `chunkTokens` tokens advancing by
    * `stride` — the retrieval/context-window preparation step. One row per
    * chunk: (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).
    * A pure per-row explode (no shuffle, no state): at 100 TB this is a
    * map-only pass whose output feeds the embedding/packing stages.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens > 0, "chunkTokens and stride must be positive")
    val toks = tokens(col(textCol))
    val starts = sequence(lit(1), greatest(size(toks) - lit(chunkTokens - 1), lit(1)), lit(stride))
    df.select(col(idCol).as("id"), toks.as("__toks"), explode(starts).as("start_token"))
      .select(col("id"),
        ((col("start_token") - 1) / stride).cast("long").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        size(slice(col("__toks"), col("start_token"), lit(chunkTokens))).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("start_token"), lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Duplicated-substring span detection — the distributed shape of
    * suffix-array exact-substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": drop verbatim repeats
    * >= n tokens): a token n-gram occurring more than once ANYWHERE in
    * the corpus (cross-doc or self-repeat) marks its n positions
    * duplicated; per document, marked n-gram starts whose distance is
    * <= n overlap or touch and merge into one maximal span (classic
    * gaps-and-islands). Output per doc: span count, duplicated-token
    * total (sum of merged span lengths), and the first span's 1-based
    * start — the numbers a removal/filter stage keys on.
    *
    * Scale shape: the corpus-wide frequency pass is ONE partial-combined
    * groupBy on the n-gram; the mark-back is a semi join against the
    * (usually small — AQE broadcasts it) duplicated-gram set; the island
    * window partitions BY DOCUMENT, so no global sort exists anywhere —
    * per-partition state is bounded by one document's marked positions
    * (the packSequences per-shard-window precedent).
    */
  /** Corpus-wide duplicated n-gram start positions: (doc_id, pos), the
    * shared first stage of span DETECTION (duplicatedSpans) and span
    * REMOVAL (removeDuplicatedSpans).
    */
  private def dupMarkedPositions(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 2, "span n-gram order must be >= 2")
    val grams = df.select(col(idCol).as("doc_id"),
        posexplode(shingles(tokens(col(textCol)), n)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("gram"))
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 2)
      .select(col("gram"))
    grams.join(dupGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos"))
  }

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val marked = dupMarkedPositions(df, idCol, textCol, n)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      // NULL lag (first marked position) falls to otherwise(1): a new span
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= n, lit(0))
          .otherwise(lit(1)))
      .withColumn("span", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) - min(col("pos")) + lit(n)).as("len"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("dup_tokens"),
        min(col("start")).as("first_start"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
        coalesce(col("first_start"), lit(0)).cast("long").as("first_start"))
  }

  /** Duplicated-span REMOVAL — the output side of ExactSubstr dedup
    * (Lee et al. 2022 drop the duplicated substrings, not the documents):
    * every token position covered by a corpus-duplicated n-gram is
    * deleted and the remaining tokens are rejoined in order. Returns one
    * row per input doc: (doc_id, n_tokens_before, n_tokens_after,
    * clean_text) — a fully-removed doc comes back with empty text, ready
    * for a min-length filter downstream.
    *
    * Scale shape: covered positions are a bounded explode of the marked
    * starts (n rows each); the rebuild is ONE anti join plus ONE per-doc
    * aggregate whose sort is array_sort over a single document's kept
    * tokens — no window, no global sort.
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val marked = dupMarkedPositions(df, idCol, textCol, n)
    val covered = marked.select(col("doc_id"),
      explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens_after"))
    df.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens_before"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens_before"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-unigram negative log-likelihood — the LM-perplexity quality
    * filter (the CCNet filtering shape) with the corpus itself as the
    * unigram model: p(tok) = corpus count / corpus total, per-document
    * score Σ -ln p(tok_i) / n_tokens — low = common/fluent wording, high
    * = rare/garbled. Everything that decides the result is exact
    * arithmetic: token counts are integers, each -ln p term is computed
    * as ln(total) - ln(cnt) with [[graft.util.PortableLog]] (libm-free,
    * bit-identical in DuckDB) and snapped onto the 10^-quantize grid as
    * floor(10^q·x + 0.5) LONG (the g34 pattern — shuffle-order-
    * independent, cross-engine bit-stable; the r10 driver gate proved
    * Spark `round` vs DuckDB `ROUND` disagree near grid boundaries),
    * per-(doc, tok) multiplicities multiply the quantized term exactly
    * in LONG, the DECIMAL presentation is exact integer × 10^-q decimal
    * arithmetic (never a DOUBLE hop), and the mean divides the exact
    * integers in doubles with the identical op order on both engines.
    * The corpus total rides the plan as a broadcast 1-row aggregate (no
    * driver action); every exchange keys on the doc/tok aggregate
    * relations — all partial-combined, none over raw text — and
    * PlanAuditSpec pins that no other shuffle or window exists.
    */
  def unigramNll(df: DataFrame, idCol: String, textCol: String,
      quantize: Int = 6): DataFrame = {
    import graft.pipeline.TextHash.tokens
    import graft.util.PortableLog.lnLong
    val scale = math.pow(10, quantize)
    val dec28 = org.apache.spark.sql.types.DecimalType(28, quantize)
    val microLit =
      lit(new java.math.BigDecimal(java.math.BigInteger.ONE, quantize))
    val docTok = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("k"))
    val freq = docTok.groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val weight = freq.crossJoin(broadcast(total))
      .select(col("tok"),
        floor(lit(scale) * (lnLong(col("total")) - lnLong(col("cnt")))
          + lit(0.5)).cast("long").as("wm"))
    docTok.join(weight, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("wm") * col("k")).as("nll_micro"))
      .select(col("doc_id"), col("n_tokens"),
        (col("nll_micro").cast(org.apache.spark.sql.types.DecimalType(22, 0))
          * microLit).cast(dec28).as("nll_sum"),
        ((col("nll_micro").cast("double") / lit(scale))
          / col("n_tokens").cast("double")).as("nll_mean"))
  }

  /** Integer-pure oracle twin of [[unigramNll]]: the same per-(doc, tok)
    * multiplicities and corpus unigram frequencies, scored with the exact
    * LONG rarity weight `rScale div cnt` (integer division — with positive
    * operands Spark `div` and DuckDB `//` agree exactly; the e7/g26
    * precedent) instead of the -ln p term. `rarity = Σ k·(rScale div cnt)`
    * pins the identical join/aggregation structure the NLL score flows
    * through — doc multiplicities, corpus counts, the per-doc weighted sum
    * — without a transcendental anywhere near a hashed column (the r10/r11
    * driver-red lesson: ln-derived integers diverge on an unknown oracle
    * host even when bit-identical locally). The FP NLL itself stays in
    * [[unigramNll]], pinned by PipelineSpec's hand-computed corpus.
    * Overflow envelope: w ≤ rScale = 10^12, so a doc needs > ~9·10^6
    * singleton-rare tokens to overflow the LONG sum — far beyond any
    * pre-chunked training document; shard docs past that.
    */
  def unigramRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.pipeline.TextHash.tokens
    val docTok = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("k"))
    val freq = docTok.groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
    val weight = freq.select(col("tok"),
      expr("CAST(1000000000000 AS BIGINT) div cnt").as("w"))
    docTok.join(weight, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_tokens"),
        sum(col("w") * col("k")).cast("long").as("rarity"))
      .select(col("doc_id"), col("n_tokens"), col("rarity"))
  }

  /** Corpus-bigram interpolated rarity — the LM-quality signal one step
    * past [[unigramRarity]]'s unigram model (the CCNet/KenLM filtering
    * shape with the corpus as its own interpolated bigram model). Each
    * in-document bigram u→v scores the exact integer inverse of the
    * per-mille-interpolated probability
    * p = (λ·c(uv)/c(u·) + (1000−λ)·c(v)/T) / 1000 — put over the common
    * denominator, the weight is ONE positive-integer division
    * w(u,v) = (1000·S·c(u·)·T) div (λ·c(uv)·T + (1000−λ)·c(v)·c(u·)),
    * so w ≈ S/p exactly on both engines (positive operands: Spark `div`
    * ≡ DuckDB `//`; the t17 rarity convention — after r10/r11 proved
    * ln-derived hashed integers diverge on an unknown oracle host, rare
    * stays an integer reciprocal, never a transcendental). The unigram
    * floor is what makes unseen-in-context bigrams score sanely: a
    * common word after a novel predecessor is cheap, a rare word is
    * expensive everywhere — the standard Jelinek-Mercer backoff shape.
    *
    * Returns one row per input document:
    * (doc_id, n_bigrams, bigram_rarity = Σ k·w) — docs under 2 tokens
    * carry (0, 0). Low rarity = fluent in-corpus wording; high = garbled
    * or out-of-domain. Feeds [[qualityFilter]]'s optional bigram cap.
    *
    * Overflow envelope (loud, the pivotStress convention): the weight
    * numerator c(u·)·T·1000·S must fit LONG — try_multiply + raise_error
    * fires past ~3·10^6 corpus tokens at the default S = 1000; shard the
    * corpus model or lower S past that. Per-doc sums are bounded by
    * n_bigrams·1000·S·T/(1000−λ): ≥ 9·10^5 worst-case bigrams per doc
    * before LONG wraps — far beyond pre-chunked training documents.
    *
    * Scale shape: doc/bigram/prefix/unigram aggregates, all map-side
    * combinable; T rides the plan as a broadcast 1-row aggregate; the
    * weight relation is |distinct bigrams| rows joined back on (u, v).
    */
  def bigramRarity(df: DataFrame, idCol: String, textCol: String,
      lambdaPermille: Int = 700, s: Long = 1000L): DataFrame = {
    import graft.pipeline.TextHash.tokens
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"bigramRarity: lambdaPermille $lambdaPermille must be 0..1000")
    require(s >= 1, s"bigramRarity: scale $s must be >= 1")
    val lam = lambdaPermille.toLong
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      tokens(col(textCol)).as("ts"))
    val db = toks.where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => struct(a.as("u"), b.as("v")))).as("bg"))
      .groupBy(col("doc_id"), col("bg.u").as("u"), col("bg.v").as("v"))
      .agg(count(lit(1)).as("k"))
    val cb = db.groupBy(col("u"), col("v")).agg(sum(col("k")).as("cuv"))
    val cu = cb.groupBy(col("u")).agg(sum(col("cuv")).as("cu"))
    val cv = toks.select(col("doc_id"), explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = cv.agg(sum(col("cnt")).as("total"))
    val w = cb.join(cu, "u")
      .join(cv.select(col("tok").as("v"), col("cnt")), "v")
      .crossJoin(broadcast(total))
      .select(col("u"), col("v"),
        expr(s"coalesce(try_multiply(try_multiply(cu, total), " +
          s"CAST(${1000L * s} AS BIGINT)), raise_error(" +
          "'bigramRarity: weight numerator exceeds the LONG domain - " +
          "shard the corpus model or lower the scale')) div " +
          s"(CAST($lam AS BIGINT) * coalesce(try_multiply(cuv, total), " +
          "raise_error('bigramRarity: cuv*T exceeds the LONG domain')) + " +
          s"CAST(${1000L - lam} AS BIGINT) * " +
          "coalesce(try_multiply(cnt, cu), raise_error(" +
          "'bigramRarity: cnt*cu exceeds the LONG domain')))").as("w"))
    val scored = db.join(w, Seq("u", "v"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        sum(col("k") * col("w")).cast("long").as("bigram_rarity"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bigram_rarity"), lit(0L)).as("bigram_rarity"))
  }

  /** Content fingerprint: h32 of the normalized text (exact-dup detector),
    * plus a min-shingle-hash (stable under small edits — rolling-hash
    * style document signature).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val sh = shingles(tokens(col(textCol)), n)
    df.select(col(idCol).as("id"),
      h32(norm).as("content_fp"),
      when(size(sh) > 0, array_min(transform(sh, s => h32(s)))).otherwise(lit(null))
        .as("min_shingle_fp"))
  }

  /** Count-Min sketch over the corpus token stream (Cormode–Muthukrishnan
    * 2005) — the heavy-hitter primitive for streams too large to count
    * per-key: depth × width integer counters, counter (r, b) = number of
    * token occurrences with h32(r + "|" + token) ≡ b (mod width). The
    * build is one explode + one (r, b)-keyed count — depth rows per
    * occurrence in, `depth·width` counters out regardless of vocabulary
    * size, all map-side combinable. Point estimates take the MIN over
    * the depth counters and never understate the true count.
    *
    * Returns the corpus's exact top-k tokens (deterministic tie-break on
    * the token) with the exact count IN-ROW beside the sketch estimate,
    * so the collision margin is visible: (rank, tok, exact_n, cm_est).
    * Every column is COUNT/MIN integer arithmetic — oracle-exact by
    * construction.
    */
  def countMinTopTokens(df: DataFrame, textCol: String, topK: Int = 10,
      depth: Int = 4, width: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(explode(tokens(col(textCol))).as("tok"))
    val depthRows = array((0 until depth).map(lit): _*)
    def bucket(r: Column, tok: Column): Column =
      h32(concat(r.cast("string"), lit("|"), tok)) % width
    val sketch = toks
      .select(explode(depthRows).as("r"), col("tok"))
      .select(col("r"), bucket(col("r"), col("tok")).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    // top-k by exact count: limit first, then rank the k survivors (the
    // global window never sees more than k rows)
    val top = exact.orderBy(col("exact_n").desc, col("tok")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("exact_n").desc, col("tok"))))
    top
      .select(col("rank"), col("tok"), col("exact_n"),
        explode(depthRows).as("r"))
      .withColumn("b", bucket(col("r"), col("tok")))
      .join(sketch, Seq("r", "b"))
      .groupBy(col("rank"), col("tok"), col("exact_n"))
      .agg(min(col("c")).as("cm_est"))
      .select(col("rank").cast("long").as("rank"), col("tok"),
        col("exact_n").cast("long").as("exact_n"),
        col("cm_est").cast("long").as("cm_est"))
  }

  /** Per-source corpus curation digest (the t14 gate, hoisted in r14 so
    * the CALL surface can reach it): document/token/char counts, alpha
    * ratio, short-doc and exact-duplicate counts, the dominant language
    * and the duplicated-span token mass — one row per source, the
    * numbers a curation pipeline reads before choosing mixture weights.
    * Expressions are kept byte-identical to the long-green gate (the
    * standing never-rewrite-green-arithmetic rule); the input must carry
    * (source, doc_id, text).
    */
  def corpusProfile(d: DataFrame): DataFrame = {
    val toks = TextHash.tokens(col("text"))
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val base = d.select(col("source"), col("doc_id"),
      size(toks).cast("long").as("n_toks"),
      length(col("text")).cast("long").as("n_chars"),
      length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        .cast("long").as("n_alpha"),
      h32(norm).as("fp"))
    val dupFp = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("fp")).withColumn("dup", lit(1L))
    val perSrc = base.join(dupFp, Seq("fp"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_alpha")).as("alpha_chars"),
        sum(when(col("n_toks") < 32, 1L).otherwise(0L)).as("n_short"),
        sum(coalesce(col("dup"), lit(0L))).as("n_exact_dup"))
    val domLang = langId(d, "text")
      .groupBy(col("source"), col("predicted_lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(min(struct((-col("c")).as("nc"),
        col("predicted_lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("dominant_lang"))
    val spans = duplicatedSpans(d, "doc_id", "text", 4)
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(sum(col("dup_tokens")).as("dupspan_tokens"))
    perSrc.join(domLang, Seq("source")).join(spans, Seq("source"))
      .withColumn("alpha_ratio",
        col("alpha_chars").cast("double") / col("total_chars").cast("double"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("total_chars"), col("alpha_chars"), col("alpha_ratio"),
        col("n_short"), col("dominant_lang"), col("n_exact_dup"),
        col("dupspan_tokens"))
      .orderBy(col("source"))
  }

  /** URL host pattern: scheme + an OPTIONAL userinfo component (RFC 3986
    * allows `user:pass@` before the host — scraped corpora commonly carry
    * token URLs like `https://x-token@github.com/...`, and without the
    * skip the user label would be reported as the domain; r17 review) +
    * the host chars a reg-name allows (alnum, dot, hyphen). The userinfo
    * class is NEGATED (r17 ADVICE: the old explicit class omitted RFC
    * 3986 sub-delims like `!$&'()*,;=`, so `https://a!b@c.com` reported
    * host `a`): anything up to the `@` counts as userinfo EXCEPT the
    * characters that legally terminate the authority first (`/?#`) and
    * whitespace. RE2-safe (no backrefs/lookarounds); port/path excluded
    * by the host character class.
    */
  val urlHostPattern: String =
    "https?://(?:[^/@?#\\s]+@)?([A-Za-z0-9.-]+)"

  /** Registrable domain of a host as its LAST TWO dot labels — a
    * DOCUMENTED public-suffix simplification (this container carries no
    * PSL table, so co.uk-style multi-label suffixes group under their
    * second-level label); a single-label host (localhost) is its own
    * registrable domain. RE2-safe anchored extract, engine-portable.
    */
  def registrableDomain(host: Column): Column = {
    val lastTwo = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(lastTwo === "", host).otherwise(lastTwo)
  }

  /** Registrable-domain statistics — the group-by a curation dashboard
    * runs before anything else: every URL host in the text (map-only
    * regexp extraction), reduced to its registrable domain, then per
    * domain the DISTINCT-doc count, total mention count, and total
    * token volume of the docs mentioning it (each doc's tokens counted
    * once per domain regardless of mention count). Two chained
    * map-side-combinable aggregates — (id, domain) then (domain) — and
    * all-integer outputs (the hashable class). Returns (domain, n_docs,
    * n_mentions, total_tokens); rank with (n_docs DESC, domain ASC) at
    * the caller.
    */
  /** FineWeb-style composite quality filter (the shape of Penedo et al.,
    * "The FineWeb Datasets", 2024, arXiv:2406.17557 — a conjunction of
    * cheap per-document signals deciding keep/drop): composes the
    * already-priced signals — token-count window (t2), alpha ratio (t2),
    * duplicated-trigram share (t7), corpus-rarity per token (t17), PII
    * span count (t20), URL count (t21) — into one verdict with EXACT
    * INTEGER thresholds (ratios compare cross-multiplied per-mille, never
    * as doubles), plus a fail BITMASK (1 len | 2 alpha | 4 repetition |
    * 8 rarity | 16 pii | 32 urls) so a curation dashboard can read WHY
    * documents drop. Returns one row per document:
    * (doc_id, n_tokens, rarity, n_pii, n_urls, fail_mask, keep).
    *
    * `bigramCap` (r19, optional — None leaves the plan and output
    * byte-identical to the priced t22 shape) upgrades the rarity signal
    * with [[bigramRarity]]'s interpolated bigram model: bit 64 fires
    * when bigram_rarity div n_bigrams exceeds the cap (docs under 2
    * tokens have no bigrams and never fire it).
    *
    * Scale shape: two map-only passes (signals + PII chain) plus the
    * t17 rarity join (doc/token aggregates, broadcast total) — every
    * aggregate map-side combinable; the verdict itself is a projection.
    * Empty documents: split-on-whitespace yields one empty token, so
    * every row survives the rarity inner join (n_tokens ≥ 1 always).
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long, alphaPermille: Long,
      dupTriPermille: Long, rarityPerTokenCap: Long, maxPii: Long,
      maxUrls: Long, bigramCap: Option[Long] = None): DataFrame = {
    import graft.pipeline.TextHash.{tokens, shingles}
    val rare = unigramRarity(df, idCol, textCol) // (doc_id, n_tokens, rarity)
    val pii = redactPiiExtended(
        df.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("__t")), "__t")
      .select(col("doc_id"),
        (col("n_emails") + col("n_ccs") + col("n_ips") + col("n_phones"))
          .cast("long").as("n_pii"))
    val t = col(textCol)
    val tri = shingles(tokens(t), 3)
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      length(t).cast("long").as("total_chars"),
      length(regexp_replace(lower(t), "[^a-z]", "")).cast("long")
        .as("alpha_chars"),
      size(tri).cast("long").as("n_tri"),
      size(array_distinct(tri)).cast("long").as("nd_tri"),
      size(regexp_extract_all(t, lit(urlHostPattern), lit(1))).cast("long")
        .as("n_urls"))
    val withBigram = bigramCap match {
      case None => base.join(rare, "doc_id").join(pii, "doc_id")
        .withColumn("__bg_fail", lit(0L))
      case Some(cap) => base.join(rare, "doc_id").join(pii, "doc_id")
        .join(bigramRarity(df, idCol, textCol), "doc_id")
        .withColumn("__bg_fail",
          when(col("n_bigrams") > 0L &&
            expr("bigram_rarity div n_bigrams") > cap, lit(64L))
            .otherwise(lit(0L)))
    }
    withBigram
      .withColumn("fail_mask",
        col("__bg_fail") +
        when(col("n_tokens") < minTokens || col("n_tokens") > maxTokens,
          lit(1L)).otherwise(lit(0L)) +
        when(col("alpha_chars") * 1000L < col("total_chars") * alphaPermille,
          lit(2L)).otherwise(lit(0L)) +
        when(col("n_tri") > 0L &&
            (col("n_tri") - col("nd_tri")) * 1000L >
              col("n_tri") * dupTriPermille,
          lit(4L)).otherwise(lit(0L)) +
        when(col("n_tokens") > 0L &&
            expr("rarity div n_tokens") > rarityPerTokenCap,
          lit(8L)).otherwise(lit(0L)) +
        when(col("n_pii") > maxPii, lit(16L)).otherwise(lit(0L)) +
        when(col("n_urls") > maxUrls, lit(32L)).otherwise(lit(0L)))
      .withColumn("keep", col("fail_mask") === 0L)
      .select(col("doc_id"), col("n_tokens"), col("rarity"), col("n_pii"),
        col("n_urls"), col("fail_mask"), col("keep"))
  }

  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withToks = df.select(col(idCol).as("id"),
      size(TextHash.tokens(col(textCol))).cast("long").as("n_tokens"),
      regexp_extract_all(col(textCol), lit(urlHostPattern), lit(1))
        .as("hosts"))
    val perDoc = withToks
      .select(col("id"), col("n_tokens"), explode(col("hosts")).as("host"))
      .withColumn("domain", registrableDomain(lower(col("host"))))
      .groupBy(col("id"), col("domain"))
      .agg(count(lit(1)).as("cnt"), min(col("n_tokens")).as("n_tokens"))
    perDoc.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("cnt")).as("n_mentions"),
        sum(col("n_tokens")).as("total_tokens"))
  }
}
