package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/`. All readers go through here so
  * scan options (and, at cluster scale, bucketing / partition discovery)
  * live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dispatches `events` to its ns-timestamp-safe loader — a raw read of
    * events.parquet throws PARQUET_TYPE_ILLEGAL unless some earlier query
    * happened to set the legacy-nanos conf (a latent ordering bug
    * otherwise).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` needs normalizing to a session-zone TIMESTAMP whatever
    * physical type the generator wrote:
    *  - nanosecond int64 (older generations): Spark's vectorized reader
    *    rejects it ([PARQUET_TYPE_ILLEGAL]) unless read as raw nanos
    *    (legacy.parquet.nanosAsLong), then rebuilt at microsecond
    *    precision — the only cross-engine-safe precision;
    *  - timestamp[us] without timezone (current generation): reads as
    *    TIMESTAMP_NTZ, which streaming watermarks reject
    *    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The session zone is
    *    pinned to UTC everywhere here, so the NTZ→LTZ cast is
    *    wall-clock-preserving and the DuckDB oracle sees identical values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
