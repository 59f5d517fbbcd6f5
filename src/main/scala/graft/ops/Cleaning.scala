package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coercing-cleanup column helpers — the reference's pandas idioms
  * (`to_numeric(errors='coerce').fillna(0)`, `to_datetime(errors='coerce')`,
  * NaN-dropping doc cleanup in index_to_es.clean_doc) as Column expressions
  * that run inside codegen on every executor.
  */
object Cleaning {

  /** to_numeric(errors='coerce').fillna(default): try_cast gives null on
    * garbage, coalesce fills.
    */
  def coerceDouble(c: Column, default: Double = 0.0): Column =
    coalesce(c.try_cast("double"), lit(default))

  def coerceLong(c: Column, default: Long = 0L): Column =
    coalesce(c.try_cast("long"), lit(default))

  /** to_datetime(errors='coerce'): null on unparseable (try_to_timestamp —
    * plain to_timestamp THROWS under ANSI mode, like cast).
    */
  def coerceTimestamp(c: Column, fmt: String = "yyyy-MM-dd HH:mm:ss"): Column =
    try_to_timestamp(c, lit(fmt))

  /** NaN → null (parquet/ES both prefer absent over NaN). */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Range-validation predicate builder (index_to_es.py filters). */
  def inRange(c: Column, lo: Double, hi: Double): Column =
    c.isNotNull && c >= lo && c <= hi
}
