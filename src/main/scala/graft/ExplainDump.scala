package graft

/** Dev diagnostic (optimization rounds): dump `.explain("formatted")` for a
  * comma-separated list of registered queries to one file per query — the
  * plan-evidence artifacts (`plans/rNN/<query>_{before,after}.txt`) without
  * paying one sbt+Spark startup per query.
  *
  * Usage: sbt "runMain graft.ExplainDump <sfDir> <outDir> <suffix> q_a,q_b,..."
  * (suffix = "before" | "after"; an empty query list dumps every query).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.get("graft-explain")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"EXPLAIN $n -> ${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"EXPLAIN $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
