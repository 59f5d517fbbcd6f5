package graft

/** Dev diagnostic: per-query exchange/broadcast/codegen-span counts from
  * the EXECUTED (post-AQE) plans — a quick scan for accidental shuffles.
  * Usage: sbt "runMain graft.PlanDump [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = GraftSession.get("graft-plandump")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(plan).length
        println(f"PLAN $name%-24s exch=${c("Exchange")}%2d " +
          f"bcast=${c("BroadcastExchange")}%2d reuse=${c("ReusedExchange")}%2d " +
          f"smj=${c("SortMergeJoin")}%2d bhj=${c("BroadcastHashJoin")}%2d " +
          f"nlj=${c("BroadcastNestedLoopJoin")}%2d " +
          // negative lookahead: WindowGroupLimit (top-k pushdown, desirable)
          // must not count as a WindowExec
          f"win=${c("Window(?!GroupLimit)")}%2d wgl=${c("WindowGroupLimit")}%2d")
      } catch { case e: Throwable => println(s"PLAN $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
