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
