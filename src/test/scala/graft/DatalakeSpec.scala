package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Datalake

class DatalakeSpec extends SparkSpecBase {
  import spark.implicits._

  test("jsonl bulk-export sink round-trips documents") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val docs = Seq((1L, "a", 10.5), (2L, "b", 20.0)).toDF("id", "name", "price")
    Datalake.writeJsonl(docs, s"$tmp/out")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType)))
    val back = Datalake.readJsonl(spark, s"$tmp/out", schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
      docs.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("csv read with schema coerces malformed cells to null") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in.csv"),
      "id,price\n1,10.5\n2,notanumber\n3,\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    val got = Datalake.readCsv(spark, s"$tmp/in.csv", schema)
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === Seq((1L, Some(10.5)), (2L, None), (3L, None)))
  }

  test("partitioned parquet write enables partition pruning") {
    val tmp = Files.createTempDirectory("graft-pq").toString
    val df = Seq((1L, "20240101", 1.0), (2L, "20240102", 2.0)).toDF("id", "ingest_date", "v")
    Datalake.writeParquet(df, s"$tmp/t", partitionBy = Seq("ingest_date"))
    val read = spark.read.parquet(s"$tmp/t").filter(col("ingest_date") === "20240102")
    assert(read.collect().map(_.getAs[Long]("id")).toSeq === Seq(2L))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ingest_date"),
      s"no partition pruning:\n$plan")
  }
}
