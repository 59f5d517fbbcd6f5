package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering (InjectRuntimeFilter): when a shuffle join's
  * build side is selective, Spark injects a bloom-filter semi-filter on the
  * probe side so non-matching fact rows die at the scan instead of riding
  * the exchange — the engine's own dynamic version of q_bloom_prune's
  * explicit map-side filter, and a big deal at 100 TB where the probe side
  * IS the table. Own newSession: the application-side size threshold
  * defaults to 10 GB, far above any test scan.
  */
class RuntimeFilterSpec extends SparkSpecBase {

  private def run(enabled: Boolean): (Array[String], String) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
      enabled.toString)
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "10MB")
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey"), col("l_extendedprice"))
    val p = s.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_size"))
      .filter(col("p_size") === 1) // selective build side
    val joined = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("rev"))
    val rows = joined.collect().map(_.toString).sorted
    (rows, joined.queryExecution.executedPlan.toString)
  }

  test("a selective shuffle join injects a bloom runtime filter on the probe scan") {
    val (withRows, withPlan) = run(enabled = true)
    assert(withPlan.toLowerCase.contains("might_contain"),
      s"no runtime bloom filter in the probe side:\n$withPlan")
    val (withoutRows, withoutPlan) = run(enabled = false)
    assert(!withoutPlan.toLowerCase.contains("might_contain"))
    assert(withRows.sameElements(withoutRows),
      "runtime filtering changed the join results")
  }
}
