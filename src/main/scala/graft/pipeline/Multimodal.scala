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
    // every per-step read comes off a 16-byte window carried IN the fold
    // state — ONE payload reference per step (r17, the chunkWalk media-
    // probe lesson: interpreted BoundReferences copy the whole binary
    // field per reference), covering the marker (1), type (2), length
    // (3–4) and the SOF dims at window bytes 6–9
    def hdrAt(p: Column): Column = payload.substr(p.cast("int"), lit(16))
    def b(hdr: Column, i: Int) = beUInt(hdr, lit(i.toLong), 1)
    def b16(hdr: Column, i: Int) = beUInt(hdr, lit(i.toLong), 2)
    val init = struct(lit(3L).as("pos"),
      lit(null).cast("long").as("w"), lit(null).cast("long").as("h"),
      lit(false).as("done"), hdrAt(lit(3L)).as("hdr"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (st, _) => {
        val pos = st.getField("pos")
        val done = st.getField("done")
        val hdr = st.getField("hdr")
        val isMarker = b(hdr, 1) === 255L
        val mk = b(hdr, 2)
        val isSof = isMarker && mk.isin(192L, 193L, 194L)
        val isFill = isMarker && mk === 255L // FF FF padding: slide 1
        // TEM (01), RST0-7 (D0-D7), SOI (D8): marker only, no length
        val standalone = isMarker && (mk === 1L ||
          (mk >= 208L && mk <= 216L))
        // 217 = EOI; 218 = SOS — entropy-coded data follows SOS, where a
        // length-walk would misparse aliased marker bytes (r17 ADVICE:
        // same stop jpegExifApp1 ships; SOF legally precedes SOS, so no
        // spec-conforming payload changes)
        val stop = done || isSof || !isMarker || mk === 217L || mk === 218L
        val nxt = when(isFill, pos + 1L)
          .when(standalone, pos + 2L)
          .otherwise(pos + 2L + b16(hdr, 3))
        struct(
          when(stop, pos).otherwise(nxt).as("pos"),
          when(!done && isSof, b16(hdr, 8)).otherwise(st.getField("w")).as("w"),
          when(!done && isSof, b16(hdr, 6)).otherwise(st.getField("h")).as("h"),
          stop.as("done"),
          // the one payload touch — skipped once stopped
          when(stop, hdr)
            .otherwise(when(nxt <= 2147483647L, hdrAt(nxt))).as("hdr"))
      })
    (walked.getField("w"), walked.getField("h"))
  }

  /** Position of the first APP1/Exif segment (the FF E1 marker byte,
    * 1-based) via the [[jpegDims]] bounded marker walk — the curation
    * fields a multimodal ingest actually needs (orientation, capture
    * timestamp) live here. An APP1 that is NOT Exif (XMP uses the same
    * marker) walks on like any other segment; the walk additionally stops
    * at SOS (FF DA) — entropy-coded data follows it, where a length-walk
    * would misparse, and a spec-conforming APP1 precedes SOS anyway.
    * NULL when absent/corrupt/past budget.
    */
  def jpegExifApp1(payload: Column, maxSegments: Int = 8): Column = {
    // same one-window-per-step discipline as [[jpegDims]]: the window's
    // bytes 5–10 carry the "Exif\0\0" signature right after the length
    def hdrAt(p: Column): Column = payload.substr(p.cast("int"), lit(16))
    def b(hdr: Column, i: Int) = beUInt(hdr, lit(i.toLong), 1)
    val init = struct(lit(3L).as("pos"), lit(false).as("found"),
      hdrAt(lit(3L)).as("hdr"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (st, _) => {
        val pos = st.getField("pos")
        val found = st.getField("found")
        val hdr = st.getField("hdr")
        val isMarker = b(hdr, 1) === 255L
        val mk = b(hdr, 2)
        // "Exif\0\0" immediately after the 2-byte length
        val hit = isMarker && mk === 225L &&
          hex(hdr.substr(lit(5), lit(6))) === "457869660000"
        val isFill = isMarker && mk === 255L
        val standalone = isMarker && (mk === 1L ||
          (mk >= 208L && mk <= 216L))
        val stop = found || hit || !isMarker ||
          mk === 217L || mk === 218L // EOI, SOS
        val nxt = when(isFill, pos + 1L)
          .when(standalone, pos + 2L)
          .otherwise(pos + 2L + beUInt(hdr, lit(3L), 2))
        struct(
          when(stop, pos).otherwise(nxt).as("pos"),
          (found || hit).as("found"),
          when(stop, hdr)
            .otherwise(when(nxt <= 2147483647L, hdrAt(nxt))).as("hdr"))
      })
    when(walked.getField("found"), walked.getField("pos"))
  }

  /** (orientation, datetime) from the TIFF IFD0 inside a FOUND APP1/Exif
    * segment — real TIFF structure on the [[chunkWalk]] discipline: the
    * byte-order flag ("II"/"MM") selects [[leUInt]]/[[beUInt]] for every
    * later read, the 0x002A magic is verified, IFD0 entries are fixed
    * 12-byte records scanned under ONE aggregate fold (entry positions
    * are affine in the index, so the tree stays linear — the jpegDims
    * lesson), and every read is confined to the APP1 segment's own
    * declared extent (the m7 mvhd lesson: a corrupt length must yield
    * NULL, never a value assembled from sibling bytes). Orientation is
    * tag 274 (SHORT, count 1 — the value sits left-justified in the
    * 4-byte field per TIFF 6.0 §2); DateTime is tag 306 (ASCII, count 20
    * — the field holds an offset, relative to the TIFF header, to the
    * 19-char "YYYY:MM:DD HH:MM:SS" + NUL). The entry budget defaults to
    * 24 because REAL camera IFD0s lead with Make/Model/resolution
    * entries and place DateTime at index 8+ (r17 review) — the fold is
    * linear in the budget, so headroom is cheap. Same
    * materialized-column caveat as [[mp4Mvhd]]: pass `app1` as a
    * withColumn alias.
    */
  /** APP1's inclusive end: the 2-byte segment length counts itself but
    * not the marker, so the last segment byte is app1 + 1 + LL (clamped
    * to the payload).
    */
  private def app1Bound(payload: Column, app1: Column): Column =
    least(length(payload).cast("long"),
      app1 + 1L + beUInt(payload, app1 + 2L, 2))

  /** The IFD0 entry scan as ONE struct(orient, dtoff) expression — split
    * out so [[exifMeta]] can materialize the fold ONCE (the videoMeta
    * staging discipline: the returned struct is a full fold tree, and a
    * consumer referencing it more than once re-evaluates the scan per
    * reference).
    */
  def exifScan(payload: Column, app1: Column,
      maxEntries: Int = 24): Column = {
    val bound = app1Bound(payload, app1)
    val t = app1 + 10L // TIFF header, after marker(2) + LL(2) + "Exif\0\0"
    val bo = beUInt(payload, t, 2) // 0x4949 = "II" (LE), 0x4D4D = "MM" (BE)
    val isLE = bo === 18761L
    def ord(pos: Column, bytes: Int): Column =
      when(isLE, leUInt(payload, pos, bytes))
        .otherwise(beUInt(payload, pos, bytes))
    val headOk = (bo === 18761L || bo === 19789L) &&
      t + 7L <= bound && ord(t + 2L, 2) === 42L
    val ifd = when(headOk, t + ord(t + 4L, 4))
    val nEntries = when(ifd + 1L <= bound, ord(ifd, 2))
    val init = struct(lit(null).cast("long").as("orient"),
      lit(null).cast("long").as("dtoff"))
    aggregate(
      sequence(lit(0L), lit(maxEntries - 1L)),
      init,
      (st, i) => {
        val e = ifd + 2L + i * 12L
        // entry must exist AND its full 12-byte record must sit inside
        // the APP1 extent — short-circuits keep escaped bytes untouched
        val valid = coalesce(i < nEntries && e + 11L <= bound, lit(false))
        val tag = ord(e, 2)
        val typ = ord(e + 2L, 2)
        val cnt = ord(e + 4L, 4)
        // first-hit-wins via coalesce(prev, candidate): prev is the fold
        // accumulator (a lambda variable — cheap to re-read; what must
        // NEVER ride per-iteration is an EXPRESSION like a walk result,
        // the f085da9 lesson), and coalesce short-circuits so a matched
        // tag stops evaluating candidates on later entries
        struct(
          coalesce(st.getField("orient"),
            when(valid && tag === 274L && typ === 3L && cnt === 1L,
              ord(e + 8L, 2))).as("orient"),
          coalesce(st.getField("dtoff"),
            when(valid && tag === 306L && typ === 2L && cnt === 20L,
              ord(e + 8L, 4))).as("dtoff"))
      })
  }

  /** The DateTime string read-off of a scanned dtoff: a legal value
    * offset points past the 8-byte TIFF header, and the 19-char
    * "YYYY:MM:DD HH:MM:SS" must sit inside the APP1 extent — anything
    * else is corrupt and reads NULL, never sibling bytes.
    */
  def exifDatetime(payload: Column, app1: Column, dtOff: Column): Column = {
    val dtPos = app1 + 10L + dtOff
    when(dtOff >= 8L && dtPos + 18L <= app1Bound(payload, app1),
      payload.substr(dtPos.cast("int"), lit(19)).cast("string"))
  }

  /** Column-level composition for single-use contexts — the [[mp4Meta]]
    * caveat applies: the scan fold is embedded once per returned column,
    * so [[exifMeta]]'s staged form is the hot path.
    */
  def exifFields(payload: Column, app1: Column,
      maxEntries: Int = 24): (Column, Column) = {
    val scanned = exifScan(payload, app1, maxEntries)
    (scanned.getField("orient"),
      exifDatetime(payload, app1, scanned.getField("dtoff")))
  }

  /** EXIF metadata extraction over opaque binary payloads (the m9 gate):
    * format sniff plus the APP1/Exif orientation + capture-timestamp read
    * — (format, exif_orientation, exif_datetime, payload_bytes), NULL
    * EXIF fields on anything that is not a JPEG with a walkable Exif
    * APP1. Each walk stage lands in its own aliased column (the
    * [[videoMeta]] staging discipline — the fold otherwise re-evaluates
    * per reference).
    */
  def exifMeta(df: DataFrame, payloadCol: String,
      maxSegments: Int = 8, maxEntries: Int = 24): DataFrame = {
    val p = col(payloadCol)
    // marker walk and entry-scan fold each land in their own aliased
    // column so downstream references evaluate them ONCE per row (the
    // videoMeta staging discipline), and the payload is SLICED to the
    // APP1 extent and dropped in the first projection (the r17 media-
    // probe lesson: later stages re-copy every carried column, so only
    // the one unavoidable full pass may carry the payload). A JPEG
    // segment length is 16-bit, so the slice is ≤ 64 KiB by format.
    // the marker walk appears exactly ONCE inside the slice expression
    // (NULL app1 → NULL slice via substr), so this stays a single
    // payload-touching projection; the fixed window covers any legal
    // APP1 (2 marker bytes + a 16-bit length ⇒ ≤ 65537 bytes), and all
    // extent checks are recomputed in slice coordinates from the
    // slice's own length field
    val staged = df
      .withColumn("__abytes",
        p.substr(jpegExifApp1(p, maxSegments).cast("int"), lit(65537)))
      .withColumn("format", sniffFormat(p))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
      .withColumn("__scan", exifScan(col("__abytes"), lit(1L), maxEntries))
    staged
      .withColumn("exif_orientation", when(col("format") === "jpeg",
        col("__scan").getField("orient")))
      .withColumn("exif_datetime", when(col("format") === "jpeg",
        exifDatetime(col("__abytes"), lit(1L),
          col("__scan").getField("dtoff"))))
      .select(df.columns.filter(_ != payloadCol).map(col).toIndexedSeq ++
        Seq(col("format"), col("exif_orientation"), col("exif_datetime"),
          col("payload_bytes")): _*)
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
      maxChunks: Int, fourccOf: Column => Column,
      nextOf: (Column, Column, Column) => Column,
      endPos: Option[Column] = None): Column = {
    val walked = chunkWalkState(payload, start, targetHex, maxChunks,
      fourccOf, nextOf, endPos)
    when(walked.getField("found"), walked.getField("pos"))
  }

  /** The full final state of a [[chunkWalk]] — (pos, found, bound, plen,
    * hdr) — for callers that need more than the hit position: the found
    * chunk's own 16-byte header window rides in `hdr`, so its size can be
    * read off the window WITHOUT re-embedding the walk expression (the
    * videoMeta staging lesson) or re-touching the payload (the r17 media
    * probe: every BoundReference to a binary column copies the whole
    * field in an interpreted HOF).
    */
  private def chunkWalkState(payload: Column, start: Column,
      targetHex: String, maxChunks: Int, fourccOf: Column => Column,
      nextOf: (Column, Column, Column) => Column,
      endPos: Option[Column] = None): Column = {
    val len = length(payload).cast("long")
    // the window every per-step read comes from: the chunk's full 8-byte
    // header plus the 8-byte largesize field the MP4 escape form appends.
    // ONE payload reference per step (r17, from the media probe): an
    // interpreted HOF evaluates BoundReferences via UnsafeRow.getBinary,
    // which copies the WHOLE binary field per reference — the old
    // read-at-position form made ~8 payload references per step and
    // measured ~65x the one-copy floor on 16 MiB payloads. The window
    // rides IN the fold state, so steps after a hit (or a dead park)
    // re-touch nothing: the when short-circuit skips the slice.
    def hdrAt(p: Column): Column = payload.substr(p.cast("int"), lit(16))
    // the optional inclusive end bound confines a CHILD walk to its parent
    // box's extent (r16 review: without it, a moov with no mvhd child let
    // the walk escape into sibling boxes and "find" a stray fourcc there).
    // Bound, payload length, and the start window are all evaluated ONCE
    // at init: anything re-derived per-iteration would re-embed its
    // expression maxChunks times — the exponential-tree blowup the
    // jpegDims fold exists to avoid (measured ~130x before state-carry).
    // A NULL bound (corrupt parent size) fails inRange and parks the walk.
    val init = struct(start.cast("long").as("pos"), lit(false).as("found"),
      endPos.getOrElse(len).cast("long").as("bound"), len.as("plen"),
      hdrAt(start.cast("long")).as("hdr"))
    val walked = aggregate(
      sequence(lit(1), lit(maxChunks)),
      init,
      (st, _) => {
        val pos = st.getField("pos")
        val found = st.getField("found")
        val bnd = st.getField("bound")
        val plen = st.getField("plen")
        val hdr = st.getField("hdr")
        // the full 8-byte chunk header must be present (a short window
        // means the chunk is truncated — length(hdr) >= 8 is the old
        // pos + 7 <= len check read off the window itself) and inside
        // the bound; a corrupt size parking pos at NULL cascades here
        val inRange = coalesce(pos >= 1L && length(hdr) >= 8 &&
          pos + 7L <= bnd, lit(false))
        val hit = inRange && fourccOf(hdr) === targetHex
        val nxt = when(inRange, nextOf(hdr, pos, plen))
        // a chunk must advance past its own 8-byte header: anything
        // shorter is corrupt and would loop or misalign every later read
        val dead = !inRange || nxt.isNull || nxt < pos + 8L
        val stay = found || hit
        struct(
          when(stay, pos)
            .when(dead, lit(null).cast("long"))
            .otherwise(nxt).as("pos"),
          stay.as("found"),
          bnd.as("bound"), plen.as("plen"),
          // the one payload touch of the step — skipped once found/dead;
          // a next position past int range (corrupt largesize sum) gets
          // a NULL window and parks on the following step's range check
          when(stay || dead, hdr)
            .otherwise(when(nxt <= 2147483647L, hdrAt(nxt))).as("hdr"))
      })
    walked
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
  /** Box fourcc read off a chunkWalk 16-byte header window (bytes 5–8). */
  private def boxFourccH(hdr: Column): Column =
    hex(hdr.substr(lit(5), lit(4)))

  /** [[boxNext]] off the header window: size is the window's first BE32,
    * the escape largesize its bytes 9–16 (a truncated window NULLs the
    * read, parking the walk — the old past-payload check, now read off
    * the window itself).
    */
  private def boxNextH(hdr: Column, pos: Column, plen: Column): Column = {
    val sz = beUInt(hdr, lit(1L), 4)
    val ls = beUInt(hdr, lit(9L), 8)
    when(sz === 1L, when(ls >= 16L, pos + ls))
      .when(sz === 0L, plen + 1L)
      .otherwise(pos + sz)
  }

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
      boxFourccH, boxNextH)

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
      boxFourccH, boxNextH,
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

  /** First trak box inside a FOUND moov — the m10 walk level between
    * moov and tkhd (ISO 14496-12 §8.3.1: trak is a plain container box).
    * Same child-walk shape as [[mp4Mvhd]]: confined to moov's extent,
    * children start after moov's ACTUAL header (16 bytes in the largesize
    * form). FIRST-trak semantics, documented: a multi-track file reports
    * its first trak's dimensions (an audio-first layout reports the audio
    * tkhd's 0×0) — the per-track explode is a caller-side variant, not
    * this scalar read-off. Same materialized-column caveat as [[mp4Mvhd]].
    */
  def mp4Trak(payload: Column, moov: Column, maxBoxes: Int = 8): Column = {
    val szMoov = beUInt(payload, moov, 4)
    val childStart = when(szMoov === 1L, moov + 16L).otherwise(moov + 8L)
    chunkWalk(payload, childStart, "7472616B", maxBoxes,
      boxFourccH, boxNextH, Some(moovBound(payload, moov)))
  }

  /** tkhd position inside a FOUND trak box — confined to trak's own
    * extent exactly like the mvhd walk is to moov's (a trak with no tkhd
    * child must read NULL, never a stray sibling's fourcc).
    */
  def mp4Tkhd(payload: Column, trak: Column, maxBoxes: Int = 8): Column = {
    val szTrak = beUInt(payload, trak, 4)
    val childStart = when(szTrak === 1L, trak + 16L).otherwise(trak + 8L)
    chunkWalk(payload, childStart, "746B6864", maxBoxes,
      boxFourccH, boxNextH, Some(boxNext(payload)(trak) - 1L))
  }

  /** (width, height) integer parts from a FOUND tkhd's version-dependent
    * offsets — the track-dimension read a video-curation pass needs
    * (ISO 14496-12 §8.3.2: width/height are 16.16 fixed-point BE32s at
    * tkhd +84/+88 in version 0; version 1 widens creation/modification/
    * duration, pushing them to +96/+100). The integer part is the exact
    * `raw >> 16` (≡ div 65536 on the non-negative BE32 domain — integer
    * arithmetic, the hashed-column class). The reads are gated BOTH by
    * the tkhd's OWN declared size (largesize-aware via the same boxNext
    * read the walk uses — r18 ADVICE: a tkhd declaring fewer bytes than
    * its version's fields, followed by a sibling box inside the same
    * trak, must read NULL, never the sibling's bytes) AND by `bound`,
    * the parent trak's inclusive end, each checked version-aware: v0's
    * fields end at tkhd+91, v1's at tkhd+103. A corrupt largesize makes
    * the own-end NULL, parking both fields. Same materialized-column
    * caveat as [[mp4Mvhd]].
    */
  def tkhdDims(payload: Column, tkhd: Column,
      bound: Option[Column] = None): (Column, Column) = {
    val v = beUInt(payload, tkhd + 8L, 1)
    val ownEnd = boxNext(payload)(tkhd) - 1L
    def fits(end: Long): Column = {
      val self = tkhd + end <= ownEnd
      bound.map(b => self && tkhd + end <= b).getOrElse(self)
    }
    (when(v === 0L && fits(91L), shiftright(beUInt(payload, tkhd + 84L, 4), 16))
       .when(v === 1L && fits(103L), shiftright(beUInt(payload, tkhd + 96L, 4), 16)),
      when(v === 0L && fits(91L), shiftright(beUInt(payload, tkhd + 88L, 4), 16))
        .when(v === 1L && fits(103L), shiftright(beUInt(payload, tkhd + 100L, 4), 16)))
  }

  /** Track-dimension extraction over opaque binary payloads (the m10
    * gate): format sniff plus the moov → trak → tkhd read —
    * (format, track_width, track_height, payload_bytes), NULL track
    * fields on anything that is not ISO-BMFF with a walkable first trak.
    * Same staging discipline as [[videoMeta]]: the ONE payload-touching
    * projection finds moov and slices min(declared, budget)
    * ([[moovSlice]]); each walk stage lands in its own aliased column so
    * downstream references evaluate it once per row.
    */
  def trackMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val staged = df
      .withColumn("__mbytes", moovSlice(p))
      .withColumn("format", sniffFormat(p))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
      .withColumn("__trak", mp4Trak(col("__mbytes"), lit(1L)))
      .withColumn("__tkhd", mp4Tkhd(col("__mbytes"), col("__trak")))
    val (w, h) = tkhdDims(col("__mbytes"), col("__tkhd"),
      Some(boxNext(col("__mbytes"))(col("__trak")) - 1L))
    staged
      .withColumn("track_width", when(col("format") === "mp4", w))
      .withColumn("track_height", when(col("format") === "mp4", h))
      .select(df.columns.filter(_ != payloadCol).map(col).toIndexedSeq ++
        Seq(col("format"), col("track_width"), col("track_height"),
          col("payload_bytes")): _*)
  }

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
  /** The moov slice budget (r17 ADVICE: the old FIXED 64 KiB slice
    * silently NULLed fields of real moovs whose mvhd sat past 64 KiB —
    * stco/stsz tables grow with sample count). The slice is now
    * min(declared moov size, this budget): normal moovs copy exactly
    * their declared KBs (cheaper than the old fixed window), oversized-
    * but-legal moovs parse up to the budget, and only a moov declaring
    * more than 4 MiB has its fields past the budget read NULL —
    * documented budget, like the walk's box count.
    */
  val MoovBudgetBytes: Long = 4L * 1024 * 1024

  /** The payload-touching moov slice: ONE expression that runs the moov
    * walk once, reads the found box's declared size OFF THE WALK'S OWN
    * header window, and slices min(declared, budget) — built as an
    * `aggregate` whose FINISH lambda reads the walk's final state as a
    * lambda variable (cheap per re-read), because referencing the walk
    * expression twice (substr pos + declared-size read) would re-evaluate
    * the whole walk per reference (the videoMeta staging lesson), and
    * reading the size off the payload would add whole-payload copies (the
    * r17 media-probe lesson). A corrupt declared size (largesize < 16)
    * yields a NULL length — the slice, and every field read, parks NULL.
    */
  def moovSlice(payload: Column, maxBoxes: Int = 8): Column =
    aggregate(
      sequence(lit(1), lit(1)),
      chunkWalkState(payload, lit(1L), "6D6F6F76", maxBoxes,
        boxFourccH, boxNextH),
      (st, _) => st,
      st => {
        val pos = when(st.getField("found"), st.getField("pos"))
        val declared =
          boxNextH(st.getField("hdr"), pos, st.getField("plen")) - pos
        val len = when(declared.isNotNull,
          least(declared, lit(MoovBudgetBytes)))
        payload.substr(pos.cast("int"), len.cast("int"))
      })

  def videoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    // each walk stage lands in its own aliased column so downstream
    // references evaluate it ONCE per row: CollapseProject keeps
    // non-cheap multi-referenced aliases in separate projections, so the
    // moov walk runs once and the mvhd walk once — inlining the raw
    // expressions instead re-evaluates the walk per reference (measured
    // 15x end-to-end on the m7 gate). SLICE-EARLY (r17, from the media
    // probe): each staged projection re-copies every carried column, so
    // carrying a multi-MB payload through three stages tripled the scan
    // cost (video_min 10.0 s vs the 1-projection binaryMeta's 3.7 s at
    // 16 MiB payloads). The FIRST projection — the one unavoidable full
    // pass — finds moov, slices its clamped extent, and DROPS the
    // payload; every later stage walks the KB-sized slice rebased to
    // position 1 (moov's size field is the slice's first 4 bytes, so
    // every boxNext/bound read works unchanged in slice coordinates; a
    // truncated or clamp-exceeding extent shortens the slice and the
    // walks' length range-checks park at NULL exactly as before).
    // the walk appears exactly ONCE inside the slice expression (a NULL
    // moov propagates through substr to a NULL slice), so CollapseProject
    // inlines it and this stays a single projection — the only one that
    // touches the payload. The slice is min(declared moov size, 4 MiB)
    // read off the walk's own header window ([[moovSlice]], r17 ADVICE):
    // all downstream extent checks are recomputed in slice coordinates
    // from the slice's own size fields, so a shorter-than-declared or
    // budget-exceeding moov parks exactly where the slice ends.
    val staged = df
      .withColumn("__mbytes", moovSlice(p))
      .withColumn("format", sniffFormat(p))
      .withColumn("payload_bytes", length(p).cast("long"))
      .drop(payloadCol)
      .withColumn("__mvhd", mp4Mvhd(col("__mbytes"), lit(1L)))
    val (ts, dur) = mvhdTimes(col("__mbytes"), col("__mvhd"),
      Some(moovBound(col("__mbytes"), lit(1L))))
    staged.withColumn("timescale", when(col("format") === "mp4", ts))
      .withColumn("duration", when(col("format") === "mp4", dur))
      .withColumn("duration_ms", expr(
        // the NOT NULL guard keeps raise_error for genuine overflow only
        // (try_multiply of a NULL duration is NULL-in, not overflow)
        "CASE WHEN timescale > 0 AND duration IS NOT NULL THEN " +
          "coalesce(try_multiply(duration, 1000L), " +
          "CAST(raise_error('videoMeta: duration * 1000 overflows LONG') " +
          "AS BIGINT)) div timescale END"))
      .select(df.columns.filter(_ != payloadCol).map(col).toIndexedSeq ++
        Seq(col("format"), col("timescale"), col("duration"),
          col("duration_ms"), col("payload_bytes")): _*)
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
      hdr => hex(hdr.substr(lit(1), lit(4))),
      (hdr, p, _) => {
        val sz = leUInt(hdr, lit(5L), 4)
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

  /** dHash perceptual fingerprint over RAWG raw-bitmap payloads (r19 —
    * the content-aware image near-dup m4/m6's byte-level simhash cannot
    * give: re-encoded or brightness-shifted images share NO bytes but DO
    * share gradient signs). Payload format "RAWG": 4 magic bytes, BE16
    * width, BE16 height, then width·height row-major 8-bit gray pixels —
    * the uncompressed bitmap class, so no codec runs anywhere. The
    * fingerprint is the classic dHash (resize to 9×8, compare horizontal
    * neighbors): sample positions x_k = (k·w) div 9, y_r = (r·h) div 8
    * read nearest-neighbor single bytes off the stored grid, and bit
    * (r·8 + k) is set when px(r, k) < px(r, k+1). A uniform brightness
    * shift cancels in every comparison; a small translation of smooth
    * content keeps the gradient signs — the collisions PipelineSpec pins
    * by hand.
    *
    * Plan shape (r19 rework, the slice-early lesson one step further):
    * the ONE payload-touching projection concatenates the 72 sampled
    * bytes into a tiny `__s` slice and the payload is never referenced
    * again — every comparison then reads `__s` at a LITERAL offset, so
    * the whole fingerprint compiles to small fixed-position byte reads
    * instead of 72 independent position-computed header parses (the
    * first cut spent ~3 s per plan in codegen alone). Sample positions
    * are monotone in (r, k), so a payload cut mid-grid only shortens
    * `__s`'s tail — and the `__ok` length gate already parks that NULL.
    *
    * Returns (id, dhash): NULL for payloads that are not RAWG, shorter
    * than the declared grid, or degenerate (w < 9 or h < 8 — fewer
    * pixels than sample points).
    */
  def dHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val sampleBytes = for (r <- 0 until 8; k <- 0 to 8) yield
      col("__p").substr((lit(9L) +
          expr(s"(($r * __h) div 8) * __w + (($k * __w) div 9)")).cast("int"),
        lit(1))
    val staged = df.select(col(idCol).as("id"), p.as("__p"),
        beUInt(p, lit(5L), 2).as("__w"), beUInt(p, lit(7L), 2).as("__h"))
      .withColumn("__ok",
        beUInt(col("__p"), lit(1L), 4) === lit(0x52415747L) &&
          col("__w") >= 9L && col("__h") >= 8L &&
          length(col("__p")).cast("long") >= lit(8L) + col("__w") * col("__h"))
      .withColumn("__s", concat(sampleBytes.toIndexedSeq: _*))
      .select(col("id"), col("__ok"), col("__s"))
    // bitwise OR, not +: bit 63 (r = 7, k = 7) is Long.MinValue, and an
    // ANSI arithmetic sum would overflow where the OR is just bits
    val fp = (for (r <- 0 until 8; k <- 0 until 8) yield
      when(beUInt(col("__s"), lit(r * 9 + k + 1L), 1) <
          beUInt(col("__s"), lit(r * 9 + k + 2L), 1),
        lit(1L << (r * 8 + k))).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    staged.select(col("id"), when(col("__ok"), fp).as("dhash"))
  }

  /** Perceptual near-duplicate pairs over the 64-bit dHash: 4 fixed
    * 16-bit bands bucket the candidates (pigeonhole: any pair at Hamming
    * ≤ 3 shares at least one intact band), exact distance =
    * bit_count(xor) filters. Non-RAWG payloads (NULL dhash) never pair.
    * Same 100 TB posture as the m4 byte variant — banded candidates,
    * never all-pairs. One row per pair: (a, b, hamming), a < b.
    */
  def dHashNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"dHashNearDupPairs: 4 bands guarantee recall only for maxDist < 4, " +
        s"got $maxDist")
    // materialize the (id, dhash) relation BEFORE both the self-join and
    // the NULL filter: the two join branches would otherwise each
    // evaluate the full fingerprint plan, and a filter AHEAD of the
    // checkpoint is pushed below the projection with the whole fp tree
    // SUBSTITUTED into its condition — measured 232 s vs 2.6 s on 1000
    // rows for the identical result (the alias-substitution face of the
    // m7 expression-blowup lesson). The relation is 2 small columns.
    val sig = dHash(df, idCol, payloadCol).localCheckpoint()
      .where(col("dhash").isNotNull)
    val bk = sig.select(col("id"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bits",
        expr("shiftright(dhash, CAST(band * 16 AS INT)) & 65535"))
    bk.as("x").join(bk.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        expr("CAST(bit_count(x.dhash ^ y.dhash) AS BIGINT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

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
