package graft

import org.apache.spark.sql.functions._
import graft.ops.Salting
import graft.sources.{Datalake, Tables}

class BucketingSpec extends SparkSpecBase {

  test("co-bucketed fact tables join with no exchange") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Datalake.writeBucketed(o.withColumnRenamed("o_orderkey", "k"),
      "b_orders", "k", 8)
    Datalake.writeBucketed(l.withColumnRenamed("l_orderkey", "k"),
      "b_lineitem", "k", 8)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not re-shuffle:\n$plan")
      // sanity: same answer as the plain join
      assert(joined.count() ===
        o.join(l, o("o_orderkey") === l("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join returns exactly the plain-join result") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"), col("c_name"))
    val salted = Salting.saltedJoin(o, c, "k", salts = 4)
    val plain = o.join(c, "k")
    assert(salted.count() === plain.count())
    val sSum = salted.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)
    val pSum = plain.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(sSum === pSum)
  }
}
