package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) as opaque binary
  * columns with typed metadata, processed by a partition-wise decoder.
  *
  * The Spark-side plumbing is real and tested — schema, batch iteration via
  * mapPartitions (the Scala analogue of mapInPandas batches), deterministic
  * output schema — while the codec itself is a STUB: this container has no
  * image/audio libraries, so `decodeStub` computes deterministic fake
  * features (payload length + md5-derived pseudo-feature). A production
  * deployment swaps `decodeStub` for a JNI/javacpp codec without touching
  * the plumbing.
  */
object Multimodal {

  /** Deterministic fake "decode": [byte length, h32(payload) % 251].
    * Mirrors TextHash.h32 so the SQL oracle can reproduce it.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
    (bytes.length.toLong, java.lang.Long.parseLong(hex, 16) % 251)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_len", LongType, nullable = false),
    StructField("feature", LongType, nullable = false)))

  /** Attach decoded features to a DataFrame with a binary `payload` column.
    * Partition-wise iteration (one decoder instance per partition, batch
    * shape = the partition's row iterator) — the distribution pattern a
    * real codec needs.
    */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", featureSchema, nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder setup happens here (stub: none needed)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (len, feat) = decodeStub(bytes)
        Row.fromSeq(r.toSeq :+ Row(len, feat))
      }
    }
  }

  /** Column-expression equivalent of `decodeStub` — same (length, feature)
    * pair, but computed inside whole-stage codegen with no encoder
    * round-trip. This is the hot-path form; `extractFeatures` stays as the
    * documented plumbing pattern for codecs that genuinely need per-partition
    * native state.
    */
  def decodeStubCols(payload: Column): (Column, Column) =
    (length(payload).cast("long"), TextHash.h32(payload) % 251)

  /** Split a binary payload into fixed-size frames — the Spark-side shape
    * of video frame extraction (a real codec replaces byte-slicing with
    * decode, the chunk/explode plumbing is identical). Pure column
    * expressions: sequence + transform + substring, all codegen'd.
    */
  def frames(payload: Column, frameBytes: Int): Column =
    transform(
      sequence(lit(0), greatest(ceil(length(payload) / lit(frameBytes.toDouble))
        .cast("int") - 1, lit(0))),
      i => substring(payload, i * frameBytes + 1, lit(frameBytes)))

  /** Sample every `every`-th frame (frame ids 0, every, 2*every, …) and
    * explode to one row per sampled frame with its index and byte length —
    * the distribution shape a frame-level feature extractor consumes.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
      every: Int): DataFrame =
    df.select(col("*"), posexplode(frames(col(payloadCol), frameBytes)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .where(col("frame_idx") % every === 0)
      .withColumn("frame_bytes", length(col("frame")).cast("long"))

  /** Deterministic "resize" stub: truncate the payload to 1/factor of its
    * bytes and record the original length — stands in for a codec resize;
    * swapping in a real implementation keeps the schema and plumbing.
    */
  def resizeStub(payload: Column, factor: Int): Column =
    substring(payload, lit(1),
      greatest((length(payload) / lit(factor)).cast("int"), lit(1)))

  /** Big-endian unsigned read of `bytes` payload bytes at 1-based `pos` —
    * the byte-slice primitive of the header parsers: hex of a binary
    * substring, folded to a LONG by conv. All builtins, codegen'd; a read
    * extending even PARTIALLY past the payload end yields NULL (the slice
    * length is checked — a truncated file must report unknown dimensions,
    * never a number assembled from fewer bytes than the field holds).
    */
  def beUInt(payload: Column, pos: Column, bytes: Int): Column = {
    val slice = payload.substr(pos.cast("int"), lit(bytes))
    when(length(slice) === bytes, conv(hex(slice), 16, 10).cast("long"))
  }

  /** Magic-byte format sniff over an opaque binary payload — the first
    * metadata pass of a multimodal ingest (route by container BEFORE any
    * codec runs). Prefix compare via hex (Spark hex(binary) is uppercase).
    */
  def sniffFormat(payload: Column): Column =
    when(hex(payload.substr(lit(1), lit(8))) === "89504E470D0A1A0A", "png")
      .when(hex(payload.substr(lit(1), lit(2))) === "FFD8", "jpeg")
      .when(hex(payload.substr(lit(1), lit(4))) === "47494638", "gif")
      .when(hex(payload.substr(lit(1), lit(4))) === "52494646", "riff")
      .when(hex(payload.substr(lit(1), lit(5))) === "255044462D", "pdf")
      // ISO-BMFF: a leading 'ftyp' box — the fourcc sits at byte 5,
      // after the box's BE32 size (r16, the video leg of the triad)
      .when(hex(payload.substr(lit(5), lit(4))) === "66747970", "mp4")
      .otherwise("unknown")

  /** PNG pixel dimensions from the IHDR chunk — REAL header parsing (not
    * a stub): the spec fixes IHDR as the first chunk, so width/height are
    * the big-endian 32-bit words at byte offsets 17 and 21 (1-based).
    */
  def pngDims(payload: Column): (Column, Column) =
    (beUInt(payload, lit(17), 4), beUInt(payload, lit(21), 4))

  /** JPEG pixel dimensions via a bounded marker walk to the first SOF0/1/2
    * segment — real JFIF structure (segments are FF mm LL LL payload, the
    * 2-byte length includes itself; dimensions sit at +5/+7 inside SOF).
    * The walk is ONE `aggregate` higher-order fold over `maxSegments`
    * steps, so the expression tree stays linear in the budget (a naive
    * unroll re-nests the position column ~4× per step — exponential).
    * Spec-legal length-less constructs are handled: FF-fill padding
    * between segments slides one byte (ISO/IEC 10918-1 B.1.1.2), TEM and
    * RSTn/SOI standalone markers slide two — each costs one budget step.
    * Stops on a non-FF byte, EOI, or a SOF hit; NULL dims when no SOF is
    * found within budget.
    */
  def jpegDims(payload: Column, maxSegments: Int = 8): (Column, Column) = {
    def byteAt(pos: Column) = beUInt(payload, pos, 1)
    def be16(pos: Column) = beUInt(payload, pos, 2)
    val init = struct(lit(3L).as("pos"),
      lit(null).cast("long").as("w"), lit(null).cast("long").as("h"),
      lit(false).as("done"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (st, _) => {
        val pos = st.getField("pos")
        val done = st.getField("done")
        val isMarker = byteAt(pos) === 255L
        val mk = byteAt(pos + 1)
        val isSof = isMarker && mk.isin(192L, 193L, 194L)
        val isFill = isMarker && mk === 255L // FF FF padding: slide 1
        // TEM (01), RST0-7 (D0-D7), SOI (D8): marker only, no length
        val standalone = isMarker && (mk === 1L ||
          (mk >= 208L && mk <= 216L))
        val stop = done || isSof || !isMarker || mk === 217L // 217 = EOI
        struct(
          when(stop, pos)
            .when(isFill, pos + 1L)
            .when(standalone, pos + 2L)
            .otherwise(pos + 2L + be16(pos + 2)).as("pos"),
          when(!done && isSof, be16(pos + 7)).otherwise(st.getField("w")).as("w"),
          when(!done && isSof, be16(pos + 5)).otherwise(st.getField("h")).as("h"),
          stop.as("done"))
      })
    (walked.getField("w"), walked.getField("h"))
  }

  /** Generic container-chunk walk — the shared primitive of the MP4 box
    * walk and the RIFF chunk walk (r16): step through `[header][payload]`
    * chunks from 1-based `start`, returning the position of the first
    * chunk whose fourcc (read by `fourccAt`) equals `targetHex`, NULL
    * when the budget runs out or the walk dies (truncated size read, or
    * a non-advancing step — both park the position at NULL so every
    * later read reports unknown, never a number from garbage bytes).
    * ONE `aggregate` higher-order fold over `maxChunks` steps — the
    * [[jpegDims]] discipline: the expression tree stays LINEAR in the
    * budget (a naive unroll re-nests the position column per step —
    * exponential), and the whole walk is codegen'd byte-slice builtins.
    */
  private def chunkWalk(payload: Column, start: Column, targetHex: String,
      maxChunks: Int, fourccAt: Column => Column,
      nextAt: Column => Column, endPos: Option[Column] = None): Column = {
    val len = length(payload).cast("long")
    // the optional inclusive end bound confines a CHILD walk to its parent
    // box's extent (r16 review: without it, a moov with no mvhd child let
    // the walk escape into sibling boxes and "find" a stray fourcc there).
    // It rides IN the fold state so it is evaluated ONCE at init: a bound
    // derived from the parent's own walk referenced per-iteration would
    // re-nest that walk-sized expression maxChunks times — the exact
    // exponential-tree blowup the jpegDims fold exists to avoid (measured:
    // ~130x slower end to end before this was state-carried). A NULL bound
    // (corrupt parent size) fails inRange and parks the walk.
    val init = struct(start.cast("long").as("pos"), lit(false).as("found"),
      endPos.getOrElse(len).cast("long").as("bound"))
    val walked = aggregate(
      sequence(lit(1), lit(maxChunks)),
      init,
      (st, _) => {
        val pos = st.getField("pos")
        val found = st.getField("found")
        val bnd = st.getField("bound")
        // a corrupt size can carry pos past the payload (or past 2^31,
        // where substr's int cast would error): range-check BEFORE any
        // read — &&/when short-circuit, so out-of-range bytes are never
        // touched and the walk parks at NULL
        val inRange = coalesce(pos >= 1L && pos + 7L <= len &&
          pos + 7L <= bnd, lit(false))
        val hit = inRange && fourccAt(pos) === targetHex
        val nxt = when(inRange, nextAt(pos))
        // a chunk must advance past its own 8-byte header: anything
        // shorter is corrupt and would loop or misalign every later read
        val dead = !inRange || nxt.isNull || nxt < pos + 8L
        struct(
          when(found || hit, pos)
            .when(dead, lit(null).cast("long"))
            .otherwise(nxt).as("pos"),
          (found || hit).as("found"),
          bnd.as("bound"))
      })
    when(walked.getField("found"), walked.getField("pos"))
  }

  /** MP4/ISO-BMFF movie metadata — REAL container parsing, the video leg
    * of the [[pngDims]]/[[jpegDims]]/[[wavMeta]] triad (r16): boxes are
    * `[BE32 size][fourcc]` with size INCLUDING the header, so the walk
    * steps `pos + size`. One top-level walk finds `moov`, one child walk
    * inside it finds `mvhd`, then timescale/duration are plain BE reads
    * at the version-dependent offsets (version 0: BE32s at +20/+24;
    * version 1 widens creation/modification to 64 bits, pushing
    * timescale/duration to +28/+32 with an 8-byte duration). Returns
    * (timescale, duration) — NULL on anything that is not a walkable
    * ISO-BMFF tree (route-then-decode, like the image parsers).
    * Exactness domain: duration < 2^63 (a v1 duration at or above it
    * wraps the LONG — no real container is within 10^5× of that).
    */
  private def boxFourcc(payload: Column)(p: Column): Column =
    hex(payload.substr((p + 4L).cast("int"), lit(4)))

  /** Position after box `p` — the two spec-legal escape encodings
    * (ISO 14496-12 §4.2, on real encoder output — r16 review): size == 1
    * means a 64-bit largesize follows the fourcc (>4 GB mdat), size == 0
    * means the box runs to EOF (the streaming/last-box form — advance
    * past the payload end, which parks the walk unless this box WAS the
    * target: the fourcc check fires before the advance).
    */
  private def boxNext(payload: Column)(p: Column): Column = {
    val sz = beUInt(payload, p, 4)
    val ls = beUInt(payload, p + 8L, 8)
    // a largesize box's header is 16 bytes, so a largesize in [8, 15]
    // is corrupt yet would pass the walk's generic 8-byte minimum-
    // advance check and misalign every later read (r16 review) — park
    // it at NULL here instead
    when(sz === 1L, when(ls >= 16L, p + ls))
      .when(sz === 0L, length(payload).cast("long") + 1L)
      .otherwise(p + sz)
  }

  /** Top-level moov box position (NULL when absent/corrupt/past budget). */
  def mp4Moov(payload: Column, maxBoxes: Int = 8): Column =
    chunkWalk(payload, lit(1L), "6D6F6F76", maxBoxes,
      boxFourcc(payload), boxNext(payload))

  /** mvhd position inside a FOUND moov box. The child walk is confined to
    * moov's own extent and starts after moov's ACTUAL header (16 bytes in
    * the largesize form) — without both, a moov with no mvhd child reads
    * a stray sibling "mvhd", and a largesize moov misparses its own
    * largesize field as a child. moov's inclusive end is boxNext(moov)-1:
    * one shared expression covering all three size forms that goes NULL —
    * parking the child walk — on a corrupt largesize. IMPORTANT at the
    * call site: pass `moov` as a MATERIALIZED column (a withColumn
    * alias), not the raw walk expression — the walk tree is embedded ~10
    * times here, and per-row HOF evaluation re-runs every copy (measured
    * 15-130x slowdowns when the full walk expression was inlined).
    */
  def mp4Mvhd(payload: Column, moov: Column, maxBoxes: Int = 8): Column = {
    val szMoov = beUInt(payload, moov, 4)
    val childStart = when(szMoov === 1L, moov + 16L).otherwise(moov + 8L)
    chunkWalk(payload, childStart, "6D766864", maxBoxes,
      boxFourcc(payload), boxNext(payload),
      Some(moovBound(payload, moov)))
  }

  /** (timescale, duration) BE reads at a FOUND mvhd's version-dependent
    * offsets — same materialized-column caveat as [[mp4Mvhd]]. `bound` is
    * the parent moov's inclusive end: the child walk only confines the
    * mvhd HEADER to it, so without re-checking here a corrupt moov whose
    * declared size ends inside the mvhd body would read timescale/
    * duration from sibling/stray bytes (r16 review follow-up). The check
    * is version-aware — v0's fields end at mvhd+27, v1's at mvhd+39 — so
    * a minimal v0 mvhd flush against its parent's end stays readable.
    */
  def mvhdTimes(payload: Column, mvhd: Column,
      bound: Option[Column] = None): (Column, Column) = {
    val v = beUInt(payload, mvhd + 8L, 1)
    def fits(end: Long): Column =
      bound.map(b => mvhd + end <= b).getOrElse(lit(true))
    (when(v === 0L && fits(27L), beUInt(payload, mvhd + 20L, 4))
       .when(v === 1L && fits(39L), beUInt(payload, mvhd + 28L, 4)),
      when(v === 0L && fits(27L), beUInt(payload, mvhd + 24L, 4))
        .when(v === 1L && fits(39L), beUInt(payload, mvhd + 32L, 8)))
  }

  /** Parent moov's inclusive end — the bound both the child walk and the
    * mvhd field reads are confined to (NULL on a corrupt largesize,
    * parking both).
    */
  def moovBound(payload: Column, moov: Column): Column =
    boxNext(payload)(moov) - 1L

  /** Column-level composition of the walks — for single-use contexts
    * only; [[videoMeta]] materializes each stage once instead (this form
    * embeds the moov walk twice: once in the child walk, once for the
    * field-read bound).
    */
  def mp4Meta(payload: Column, maxBoxes: Int = 8): (Column, Column) = {
    val moov = mp4Moov(payload, maxBoxes)
    mvhdTimes(payload, mp4Mvhd(payload, moov, maxBoxes),
      Some(moovBound(payload, moov)))
  }

  /** Video-metadata extraction over opaque binary payloads (the m7 gate):
    * format sniff plus the MP4 moov/mvhd read — (format, timescale,
    * duration, duration_ms, payload_bytes), NULL video fields on anything
    * that is not ISO-BMFF. duration_ms finishes the read-off with the one
    * documented integer ratio (duration · 1000) div timescale —
    * try_multiply + raise_error keeps the product loud outside the LONG
    * domain (the pivotStress guard discipline).
    */
  def videoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    // each walk stage lands in its own aliased column so downstream
    // references evaluate it ONCE per row: CollapseProject keeps
    // non-cheap multi-referenced aliases in separate projections, so the
    // moov walk runs once, the mvhd walk once (embedding the moov
    // ATTRIBUTE, not the moov walk), and the version reads once — inlining
    // the raw expressions instead re-evaluates the walk per reference
    // (measured 15x end-to-end on the m7 gate)
    val staged = df.withColumn("__moov", mp4Moov(p))
      .withColumn("__mvhd", mp4Mvhd(p, col("__moov")))
    val (ts, dur) =
      mvhdTimes(p, col("__mvhd"), Some(moovBound(p, col("__moov"))))
    staged.withColumn("format", sniffFormat(p))
      .withColumn("timescale", when(col("format") === "mp4", ts))
      .withColumn("duration", when(col("format") === "mp4", dur))
      .withColumn("duration_ms", expr(
        // the NOT NULL guard keeps raise_error for genuine overflow only
        // (try_multiply of a NULL duration is NULL-in, not overflow)
        "CASE WHEN timescale > 0 AND duration IS NOT NULL THEN " +
          "coalesce(try_multiply(duration, 1000L), " +
          "CAST(raise_error('videoMeta: duration * 1000 overflows LONG') " +
          "AS BIGINT)) div timescale END"))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop("__moov", "__mvhd")
      .drop(payloadCol)
  }

  /** Little-endian unsigned read — RIFF-family containers (WAV/AVI) store
    * multi-byte fields least-significant first. Composed from single-byte
    * reads (hex-reversing a slice would need a binary reverse Spark lacks);
    * `bytes` ≤ 4 keeps the expression a handful of codegen'd terms.
    */
  def leUInt(payload: Column, pos: Column, bytes: Int): Column =
    (0 until bytes).map { i =>
      beUInt(payload, pos + i, 1) * (1L << (8 * i))
    }.reduce(_ + _)

  /** WAV audio metadata from the canonical RIFF layout — REAL header
    * parsing, the audio sibling of [[pngDims]]/[[jpegDims]]: requires
    * "RIFF" + "WAVE" + a leading "fmt " chunk (the canonical encoder
    * layout), then channels (LE16 @23), sample rate (LE32 @25) and bits
    * per sample (LE16 @35), all 1-based offsets. Non-WAV or non-canonical
    * payloads yield NULLs — route-then-decode, like the image parsers.
    */
  private def isCanonicalWav(payload: Column): Column =
    hex(payload.substr(lit(1), lit(4))) === "52494646" &&
      hex(payload.substr(lit(9), lit(8))) === "57415645666D7420" // WAVEfmt_

  def wavMeta(payload: Column): (Column, Column, Column) = {
    val isWav = isCanonicalWav(payload)
    (when(isWav, leUInt(payload, lit(23), 2)),
      when(isWav, leUInt(payload, lit(25), 4)),
      when(isWav, leUInt(payload, lit(35), 2)))
  }

  /** WAV data-chunk read-off (r16, extending [[wavMeta]]'s fixed-offset
    * fmt parse with a REAL chunk walk): RIFF chunks are
    * `[fourcc][LE32 size]` with the size EXCLUDING the 8-byte header and
    * odd sizes padded to even (the RIFF word-alignment rule — the walk
    * steps `pos + 8 + size + size%2`), so `data` need not sit at the
    * canonical offset 37: LIST/fact/cue chunks between fmt and data are
    * skipped by size, exactly as a real decoder does. Returns
    * (data_bytes, byte_rate) — data payload length from the walked data
    * chunk, bytes/second from the fmt chunk — NULL on non-canonical-WAV
    * payloads; the caller finishes duration_ms = (data_bytes · 1000)
    * div byte_rate (exact integer, no overflow: data_bytes < 2^32).
    */
  def wavData(payload: Column, maxChunks: Int = 8): (Column, Column) = {
    val isWav = isCanonicalWav(payload)
    // chunks start at byte 13, after the RIFF/size/WAVE preamble
    val dataPos = chunkWalk(payload, lit(13L), "64617461", maxChunks,
      p => hex(payload.substr(p.cast("int"), lit(4))),
      p => {
        val sz = leUInt(payload, p + 4L, 4)
        p + 8L + sz + sz % 2L
      })
    (when(isWav, leUInt(payload, dataPos + 4L, 4)),
      when(isWav, leUInt(payload, lit(29), 4)))
  }

  /** Audio duration extraction over opaque binary payloads (the m8 gate,
    * the duration sibling of [[audioMeta]]): format sniff, the walked
    * data-chunk byte count, the fmt byte rate, and the finished
    * duration_ms = (data_bytes · 1000) div byte_rate — all exact integer
    * reads, NULL fields on anything that is not canonical WAV.
    */
  def audioDuration(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val (dataBytes, byteRate) = wavData(p)
    df.withColumn("format", sniffFormat(p))
      .withColumn("data_bytes", dataBytes)
      .withColumn("byte_rate", byteRate)
      .withColumn("duration_ms", expr(
        "CASE WHEN byte_rate > 0 THEN (data_bytes * 1000) div byte_rate END"))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
  }

  /** Audio-metadata extraction over opaque binary payloads (the m5 gate):
    * format sniff plus the WAV fmt-chunk read — (format, channels,
    * sample_rate, bits_per_sample, payload_bytes), NULL audio fields on
    * anything that is not canonical WAV.
    */
  def audioMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val (ch, rate, bits) = wavMeta(p)
    df.withColumn("format", sniffFormat(p))
      .withColumn("channels", ch)
      .withColumn("sample_rate", rate)
      .withColumn("bits_per_sample", bits)
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
  }

  /** Typed metadata extraction over opaque binary payloads: format sniff
    * plus per-format pixel-dimension parse, all pure byte-slice column
    * expressions (the m3 gate). Unknown containers keep NULL dims — the
    * route-then-decode contract; the payload itself is dropped from the
    * output (metadata relations are narrow, payloads stay in the lake).
    */
  def binaryMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val fmt = sniffFormat(p)
    val (pw, ph) = pngDims(p)
    val (jw, jh) = jpegDims(p)
    df.withColumn("format", fmt)
      .withColumn("width",
        when(col("format") === "png", pw)
          .when(col("format") === "jpeg", jw))
      .withColumn("height",
        when(col("format") === "png", ph)
          .when(col("format") === "jpeg", jh))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
  }

  /** Binary near-duplicate pairs — the d6 SimHash banding applied to
    * bytes: features are the fixed-size payload chunks (the [[frames]]
    * slicer) hashed via their hex rendering (h32(hex(chunk)) replays in
    * SQL, where DuckDB hex(text) is the same uppercase byte rendering),
    * folded into a 32-bit SimHash and band-bucketed — candidate pairs are
    * confined to same-band buckets, never all-pairs (the d6 scale
    * argument, unchanged).
    */
  def binaryNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
      chunkBytes: Int = 16, maxDist: Int = 3): DataFrame = {
    // EMPTY payloads are excluded: they have no content to band (exact
    // dedup owns the all-empty-are-identical case), and `frames` would
    // otherwise emit one empty chunk while a range-based replay emits
    // none — the one engine/oracle asymmetry of the byte variant
    val feats = df.where(length(col(payloadCol)) > 0)
      .select(col(idCol).as("id"),
        explode(frames(col(payloadCol), chunkBytes)).as("chunk"))
      .select(col("id"), TextHash.h32(hex(col("chunk"))).as("h"))
    Dedup.bandedSimhashPairs(Dedup.simhashOfFeatures(feats), maxDist)
  }

  /** Binary near-dup clustering (the d7 shape on bytes): m4's banded
    * byte-chunk SimHash pairs become an undirected similarity graph,
    * distributed connected components (GraphX min-id labeling) turn
    * pairwise matches into clusters, survivor = minimum id. Same 100 TB
    * posture as the text path — banded candidates, never all-pairs,
    * distributed clustering. One row per cluster of size ≥ 2:
    * (survivor_id, n_members, members comma-joined in id order).
    */
  def binaryNearDupClusters(df: DataFrame, idCol: String,
      payloadCol: String, chunkBytes: Int = 16, maxDist: Int = 3): DataFrame =
    Dedup.clustersOfPairs(
      binaryNearDupPairs(df, idCol, payloadCol, chunkBytes, maxDist))

  /** Demo pipeline over documents: treat text bytes as a fake media payload,
    * decode, and aggregate per source — exercises binary columns end-to-end.
    * Pure column expressions (codegen'd); the mapPartitions plumbing in
    * `extractFeatures` is cross-validated against this in MultimodalSpec.
    */
  def featureStats(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val (mlen, feat) = decodeStubCols(payload)
    docs
      .select(col("source"), mlen.as("media_len"), feat.as("feature"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("media_len")).as("total_bytes"),
        sum(col("feature")).as("feature_sum"))
  }
}
