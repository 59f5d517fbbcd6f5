package graft

/** Dev harness: time one query repeatedly to separate JVM/codegen warmup
  * from steady state. Usage:
  *   sbt "runMain graft.Profile <queryName> [reps] [sfDir]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.get("graft-profile")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
