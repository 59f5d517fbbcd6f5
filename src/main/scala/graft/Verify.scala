package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — dev-loop filter for
    // checking one new query without dumping all 135 (the driver always
    // passes exactly two args, so its contract is unchanged)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, names) => (s, o, Some(names.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a re-run into a used outDir must not inherit ANY stale end-of-run
    // artifact: the failure marker (a clean re-run would gate red), and
    // the manifest + oracles (a run that dies mid-loop would otherwise
    // leave fresh parquet next to an old manifest/oracle set, and
    // check_oracle would validate the partial snapshot as green)
    Seq("_failures.txt", "queries.txt", "oracle_sql.json").foreach(f =>
      Files.deleteIfExists(Paths.get(s"$outDir/$f")))
    // the manifest is written BEFORE the query loop (the registry is known
    // up front): a run killed mid-loop then leaves fresh parquet WITH a
    // manifest, so check_oracle's missing-output check catches the partial
    // snapshot — written after, the same death leaves no manifest and the
    // oracle-keys-only fallback would silently pass over the missing dirs
    val selected = only match {
      case None => SparkEntry.queries
      case Some(names) =>
        // loud on typos: a silently-empty selection writes an empty
        // manifest, dumps nothing, and exits clean — the developer
        // concludes the query verified when nothing ran (review finding)
        val unknown = names.diff(SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} " +
            s"— check SparkEntry.queries")
        SparkEntry.queries.view.filterKeys(names).toMap
    }
    Files.writeString(Paths.get(s"$outDir/queries.txt"),
      selected.keys.toSeq.sorted.mkString("", "\n", "\n"))
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
    }
    // the generated trained-model oracles are only valid for the sfDir the
    // models were trained on — a cache populated from a different dir (or a
    // partial run) would dump oracles that don't match the dumped parquet
    if (!graft.queries.SimilarityQueries.modelsConsistentWith(sfDir) ||
        !graft.queries.TextQueries.bpeModelConsistentWith(sfDir) ||
        !graft.queries.Relational.gbtModelConsistentWith(sfDir) ||
        !graft.queries.Relational.gbtTreeModelConsistentWith(sfDir) ||
        !graft.queries.Relational.rollbackModelConsistentWith(sfDir) ||
        !graft.queries.Relational.aliasModelsConsistentWith(sfDir) ||
        !graft.queries.Relational.deepModelConsistentWith(sfDir))
      failed += "_model_dir_mismatch"
    // machine-readable failure marker: the exit code stays 0 (the driver's
    // contract), so tooling (scripts/gate.sh) reads this file instead of
    // scraping logs — log-scrape breaks silently if the message wording
    // changes, and a runtime-broken snapshot must not gate green
    if (failed.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/_failures.txt"),
        failed.sorted.mkString("", "\n", "\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
