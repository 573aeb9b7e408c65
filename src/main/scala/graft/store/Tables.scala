package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided deterministic parquet tables
  * (/root/repo/TESTDATA.md). All queries take the sf directory as input and
  * read through this single entry point so that partition pruning / column
  * pruning behavior is uniform.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts normalizes to a micros TimestampType column whatever the
    // generator wrote:
    //  - TIMESTAMP(NANOS) parquet surfaces as a long
    //    (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench
    //    sessions); `div` (integer division) keeps full precision — `/`
    //    would go through double and lose sub-ms precision past 2^53
    //  - timestamp[us] with isAdjustedToUTC=false (pandas-written) reads
    //    as TIMESTAMP_NTZ; the cast to TIMESTAMP interprets the naive
    //    value in the session timezone, which is UTC on the driver host,
    //    so the instant equals the stored micros (DuckDB's oracle reads
    //    the same naive value)
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
