package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers go through `spark.read.parquet` so Catalyst gets a relation it
  * can push filters/column pruning into — at 100 TB the scan is the dominant
  * cost and every query below must show `PushedFilters`/pruned `ReadSchema`
  * in `.explain("formatted")`.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped with two physical encodings for `ts`
    // across driver testdata generations: TIMESTAMP(NANOS) (which vanilla
    // Spark rejects — PARQUET_TYPE_ILLEGAL — hence the nanosAsLong legacy
    // flag and a ns→µs rebuild) and plain TIMESTAMP(MICROS) (read as
    // TIMESTAMP_NTZ under inferTimestampNTZ). Normalize both to a µs
    // TimestampType column: the session timezone is pinned to UTC
    // (GraftSession), so the NTZ→TZ cast is value-identical to the
    // timestamp_micros rebuild and downstream queries see one stable type.
    // The legacy flag is set once, only if absent — a loader silently
    // re-configuring a live session on every call is a concurrency footgun.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` twins of the oracle SQL
    * run verbatim. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
