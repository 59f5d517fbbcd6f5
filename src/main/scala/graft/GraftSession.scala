package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration we want on a real cluster.
  *
  * Scale notes: AQE handles runtime coalescing + skew-join splitting, so the
  * static `shuffle.partitions` is only an upper bound for the local harness
  * (32 threads). On a 1000-executor cluster the same code runs with
  * `spark.sql.shuffle.partitions` sized to ~2-3x total cores and AQE
  * coalesces small stages back down.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // allow co-partitioned joins to ride a partitioning on a SUBSET of
      // the join keys (e.g. one user_id repartition serving a
      // (user_id, day) join — qGapFill): rows equal on all join keys are
      // certainly co-located when partitioned by a subset. The default
      // (true) forces a full-key reshuffle purely to avoid inheriting a
      // coarser partitioning's skew; our skew story is AQE skew-join +
      // explicit salting, so the extra shuffle is pure waste here.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // graft custom expressions usable from plain SQL
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      // testdata events.ts is parquet TIMESTAMP(NANOS); read as raw nanos
      // longs and convert in sources.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
  }

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
