package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Loaders for the star-schema testdata.
  *
  * Reads are plain `spark.read.parquet` so Catalyst owns column pruning and
  * filter pushdown — callers `select`/`filter` and the scan only reads the
  * needed columns/row groups (verified in specs via `PushedFilters` /
  * `ReadSchema`). At 100 TB the same call reads a partitioned directory tree
  * and partition pruning composes with the row-group pushdown for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped in two parquet encodings across driver data drops:
    * TIMESTAMP(NANOS) — which Spark can only read as a nanos long via
    * spark.sql.legacy.parquet.nanosAsLong — and TIMESTAMP(MICROS, NTZ).
    * Branch on the arrived type and normalize both to a session-zone
    * TimestampType column (session tz is pinned to UTC, so the wall-clock
    * values match DuckDB's naive TIMESTAMP either way).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Normalize an events-shaped frame's `ts` column to TimestampType from
    * whichever encoding it arrived in (nanos long / NTZ micros / already
    * session-zone). Shared by the batch loader and the streaming specs.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Typed view of lineitem for callers who want compile-time field checks.
    * Same scan + pushdown as the DataFrame path (Encoders are Catalyst
    * expressions, not reflection at runtime); use the DataFrame loaders when
    * the schema is dynamic.
    */
  final case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  def lineitemDS(s: SparkSession, d: String): Dataset[LineItem] = {
    import s.implicits._
    lineitem(s, d).as[LineItem]
  }
}
