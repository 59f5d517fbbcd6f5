package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — "each left row joined to the latest right row
  * with rightTs <= leftTs, per key" — the standard feature-engineering /
  * attribution operator Spark lacks natively.
  *
  * Implementation: union the two sides tagged by origin, ONE shuffle+sort
  * on (key, ts, side) — right rows sort before left rows at equal ts, so
  * `>=` semantics fall out — then a running `last(right, ignoreNulls)`
  * window carries the newest right payload forward into each left row.
  *
  * Why this shape at 100 TB: a naive `left JOIN right ON key AND rTs <= lTs`
  * + max-window explodes to |L_k|·|R_k| rows per key before pruning; the
  * union form moves each row exactly once and never materializes the
  * quadratic intermediate. Skewed keys are split by AQE like any sort.
  */
object AsOf {

  /** left.* plus the latest matching right row's columns (null when no right
    * row precedes the left row). Right columns keep their names — alias them
    * before the call if they collide with left's.
    *
    * `tolerance`: maximum staleness — a right row older than
    * leftTs − tolerance does NOT match (its columns come back null), the
    * pandas merge_asof `tolerance` semantics. Applied as a post-window
    * filter on the carried timestamp, so the plan shape is unchanged.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      tolerance: Option[String] = None): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val l2 = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(0).as("__side"), lStruct.as("__l"),
      lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r"))
    val r2 = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(left.select(lStruct).schema.head.dataType).as("__l"),
      rStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightFields = right.columns.filter(c => c != key)
    val carried = l2.unionByName(r2)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val bounded = tolerance match {
      case None => carried
      case Some(tol) =>
        // stale match → null out the carried right payload
        carried.withColumn("__last_r",
          when(col(s"__last_r.$rightTs") >=
            col("__ts") - expr(s"INTERVAL $tol"), col("__last_r")))
    }
    bounded.select(left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightFields.map(c => col(s"__last_r.$c").as(c)): _*)
  }
}
