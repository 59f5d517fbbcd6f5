package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{array, col, explode, lit, struct, when}
import org.apache.spark.sql.types.StructType

/** Layered datalake IO, mirroring the reference's raw/formatted/usage tree
  * (cf. /root/reference/Datalake + the dags/lib fetcher modules) as distributed
  * Spark reads/writes instead of single files handled in driver pandas.
  *
  * Layout: `<root>/<layer>/<domain>/<name>[/ingest_date=YYYYMMDD]/part-*`.
  * Partitioning by ingest_date gives partition pruning on incremental reads
  * (the reference's state-file watermark becomes a pruned predicate).
  */
object Datalake {
  val Raw = "raw"
  val Formatted = "formatted"
  val Usage = "usage"

  def path(root: String, layer: String, domain: String, name: String): String =
    s"$root/$layer/$domain/$name"

  /** CSV ingestion with explicit schema + coercing mode: malformed rows get
    * nulls (PERMISSIVE), matching the reference's errors='coerce' semantics
    * without a driver-side pass.
    */
  def readCsv(spark: SparkSession, p: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(p)

  /** JSON-lines ingestion (one doc per line — the streaming-friendly form
    * of the reference's per-fetch JSON arrays).
    */
  def readJsonl(spark: SparkSession, p: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(p)

  /** Multiline JSON-array ingestion — the reference's raw layer stores one
    * JSON ARRAY per fetch (lbc_fetcher.py writes the whole API response),
    * not JSONL. `multiLine` makes Spark parse each FILE as one JSON value
    * and explode top-level arrays into rows. Scale note: multiline JSON is
    * not splittable (one file = one task), which matches the raw-fetch
    * shape (many small files, parallelism across files); the formatted
    * layer re-writes as parquet/JSONL for splittable downstream reads.
    */
  def readJsonArray(spark: SparkSession, p: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(p)

  /** ORC round-trip for interop with Hive-era warehouses (ORC supports the
    * same predicate pushdown / column pruning as parquet; same layered
    * layout applies). Parquet stays the house format — this is the bridge
    * for tables that already live as ORC.
    */
  def writeOrc(df: DataFrame, p: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "snappy").orc(p)

  def readOrc(spark: SparkSession, p: String): DataFrame =
    spark.read.orc(p)

  /** Write a formatted/usage layer as snappy parquet, optionally
    * partitioned (ingest_date, geo prefix, …) for downstream pruning.
    */
  def writeParquet(df: DataFrame, p: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(p)
  }

  /** Bulk-export sink: JSONL documents, the shape Elasticsearch `_bulk`
    * (or any doc store) ingests. The reference iterates rows in the driver
    * and POSTs batches of 1000 (index_to_es.py) — here every executor
    * writes its partition directly, so export scales with the cluster.
    */
  def writeJsonl(df: DataFrame, p: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(p)

  /** Idempotent incremental layer maintenance: overwrite ONLY the
    * partitions present in `df` (dynamic partition overwrite), leaving
    * every other partition untouched — re-running one ingest day (the
    * reference re-triggers a DAG day) replaces exactly that day. A static
    * overwrite would drop the whole table first.
    */
  def upsertPartitions(df: DataFrame, p: String,
      partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(partitionBy: _*)
      .parquet(p)

  /** Schema-evolution read: union the schemas of every file under `p`
    * (columns added over time come back null for old files). Costs a
    * footer read per file at planning — acceptable for layer roots,
    * not for hot paths (which pin an explicit schema).
    */
  def readMergedSchema(spark: SparkSession, p: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(p)

  /** Compact a directory of many small files into `nFiles` well-sized ones
    * — the small-files problem is the classic datalake killer (every file
    * is a task + a footer read + an object-store request at 100 TB).
    * Round-robin repartition gives evenly sized output files; the rewrite
    * goes to a new path so the swap can be atomic at the catalog/manifest
    * level.
    */
  def compact(spark: SparkSession, from: String, to: String,
      nFiles: Int): Unit =
    spark.read.parquet(from)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(to)

  /** Atomic publish without a table format: data lands under a new
    * versioned directory, and ONE tiny manifest file is swapped last —
    * readers resolve the manifest first, so they see either the old
    * version or the new one, never a half-written directory. This is the
    * commit protocol every serious datalake needs on plain object storage
    * (a failed job leaves an orphan version dir, never a corrupt table);
    * the manifest write is a single small PUT, the closest thing to atomic
    * an object store offers.
    */
  def publish(df: DataFrame, tableRoot: String, version: String): Unit = {
    val dataPath = s"$tableRoot/v=$version"
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(dataPath)
    // manifest IO goes through the Hadoop FileSystem of tableRoot, same as
    // the data (java.nio would silently write a LOCAL file for an
    // hdfs://-or-s3a:// root). Rename atomicity is the underlying FS's:
    // true on HDFS/local; object stores need their conditional-put — the
    // protocol still guarantees readers never resolve a partial directory.
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(conf)
    // rename-atomicity is the FS's, not ours: on object stores (s3a/gs/...)
    // rename is copy+delete, so a reader can hit a missing/partial MANIFEST
    // window. Warn loudly rather than silently weakening the old-or-new
    // guarantee — object-store deployments need a conditional-put manifest.
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (!Set("file", "hdfs", "viewfs").contains(scheme)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Datalake.publish: filesystem scheme '$scheme' does not guarantee " +
          "atomic rename — the manifest swap is NOT old-or-new atomic here; " +
          "use a conditional-put manifest implementation for object stores")
    }
    val tmp = new org.apache.hadoop.fs.Path(root, s".MANIFEST.$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v=$version\n".getBytes("UTF-8")) finally out.close()
    val manifest = new org.apache.hadoop.fs.Path(root, "MANIFEST")
    // FileContext rename+OVERWRITE is the atomic-replace primitive
    // (plain FileSystem.rename won't overwrite; delete-then-rename would
    // open a window with no manifest at all)
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, manifest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** TIME TRAVEL: read a specific published version directly, bypassing
    * the manifest — version directories are immutable once published, so
    * any historical version stays readable until retention deletes it
    * (the Iceberg/Delta snapshot-read shape on plain object storage).
    */
  def readVersion(spark: SparkSession, tableRoot: String,
      version: String): DataFrame =
    spark.read.parquet(s"$tableRoot/v=$version")

  /** Read the currently-published version via the manifest. */
  def readPublished(spark: SparkSession, tableRoot: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(root, "MANIFEST"))
    val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    spark.read.parquet(s"$tableRoot/$v")
  }

  /** The manifest-current version name, if a manifest exists. */
  def currentVersion(spark: SparkSession, tableRoot: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(root, "MANIFEST")
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      Some(v.stripPrefix("v="))
    }
  }

  /** Published version names under `tableRoot`, oldest → newest. Numeric
    * versions order numerically (so "10" is newer than "9" — epoch or
    * counter versioning both work); non-numeric ones lexicographically
    * after them. One driver-side directory listing — version counts are
    * catalog-sized, never data-sized.
    */
  def listVersions(spark: SparkSession, tableRoot: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v="))
      .sortBy(v =>
        (if (v.nonEmpty && v.forall(_.isDigit) && v.length <= 18) 0 else 1,
          if (v.nonEmpty && v.forall(_.isDigit) && v.length <= 18) v.toLong
          else 0L, v))
  }

  /** VACUUM — version retention for the manifest protocol: delete every
    * published version directory except the newest `keepLast` and —
    * always, regardless of age — the manifest-current version (a vacuum
    * must never be able to break the reader the manifest is pointing
    * at, even one pinned to an old version for reproducibility). Version
    * dirs are immutable, so retained readers are untouched by
    * construction; expired time-travel reads fail fast on a missing
    * path instead of returning partial data. Returns the versions
    * deleted, oldest → newest. The deletes are recursive directory
    * removals — object-store deployments fan the per-file deletes out,
    * but the PROTOCOL stays this: retention is a lake-side GC decision,
    * never a reader-side one (the Iceberg `expire_snapshots` shape).
    */
  def vacuum(spark: SparkSession, tableRoot: String,
      keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val versions = listVersions(spark, tableRoot)
    val keep = versions.takeRight(keepLast).toSet ++
      currentVersion(spark, tableRoot)
    val drop = versions.filterNot(keep)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
    }
    drop
  }

  /** Schema-evolution read ACROSS versions: one frame over the given
    * version directories with their schemas UNIONED (mergeSchema) —
    * columns added in later versions come back null for earlier files.
    * This is the cross-snapshot audit read (diff two eras of a table,
    * backfill a new column) that plain per-version reads can't express
    * when the schema moved between them.
    */
  def readVersionsMerged(spark: SparkSession, tableRoot: String,
      versions: Seq[String]): DataFrame = {
    require(versions.nonEmpty, "no versions to read")
    spark.read.option("mergeSchema", "true")
      .parquet(versions.map(v => s"$tableRoot/v=$v"): _*)
  }

  /** CHANGE DATA FEED between two published versions (round 10): the
    * row-level delta a downstream consumer replays to go from `fromV` to
    * `toV` — Delta Lake's `table_changes` shape on the manifest protocol.
    * Emits one row per insert/delete and TWO rows per update (pre- and
    * post-image, the CDC convention that lets consumers retract the old
    * row before applying the new), each with `_change_type`,
    * `_from_version`, `_to_version` metadata columns; unchanged rows
    * (the overwhelming mass of a real diff) never leave the join.
    *
    * q_table_diff is the SNAPSHOT form of this read (status summary, one
    * row per key); this is the REPLAYABLE form — `readVersion(toV)` must
    * equal `readVersion(fromV)` + applying this feed, which DatalakeSpec
    * pins as an algebraic property.
    *
    * Plan shape: ONE full-outer hash join on the key (shuffle_hash hint:
    * full-outer can't broadcast, and without the hint it falls to
    * SortMergeJoin), then a single-pass conditional array-explode that
    * emits 0/1/2 change rows per joined key — the three change classes
    * do NOT re-scan the join (a union of three filters over it would run
    * the join thrice). Scale: one shuffle per side, or none when the
    * snapshots are bucketed by key; null-safe (<=>) per-column compare so
    * NULL payloads diff correctly.
    */
  def changeFeed(spark: SparkSession, tableRoot: String, fromV: String,
      toV: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeFeed needs at least one key column")
    val a0 = readVersion(spark, tableRoot, fromV)
    val b0 = readVersion(spark, tableRoot, toV)
    require(a0.columns.sorted.sameElements(b0.columns.sorted),
      s"changeFeed requires identical schemas; use readVersionsMerged for " +
        s"cross-schema audits (v$fromV: ${a0.columns.mkString(",")} vs " +
        s"v$toV: ${b0.columns.mkString(",")})")
    val payload = a0.columns.filterNot(keys.contains).toSeq
    val va = a0.select(keys.map(col) ++
      payload.map(c => col(c).as(s"_a_$c")) :+ lit(1).as("_in_a"): _*)
    val vb = b0.select(keys.map(col) ++
      payload.map(c => col(c).as(s"_b_$c")) :+ lit(1).as("_in_b"): _*)
    val j = va.join(vb.hint("shuffle_hash"), keys, "full_outer")
    val pre = struct(payload.map(c => col(s"_a_$c").as(c)): _*)
    val post = struct(payload.map(c => col(s"_b_$c").as(c)): _*)
    val same = payload.map(c => col(s"_a_$c") <=> col(s"_b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    // unchanged rows exit before the explode; the when-chain deliberately
    // has NO otherwise — a row somehow slipping through yields NULL, and
    // non-outer explode emits zero rows for it (fail-quiet is correct:
    // "no change" is its semantic meaning)
    val changes =
      when(col("_in_a").isNull,
        array(struct(lit("insert").as("_change_type"), post.as("img"))))
      .when(col("_in_b").isNull,
        array(struct(lit("delete").as("_change_type"), pre.as("img"))))
      .when(!same, array(
        struct(lit("update_preimage").as("_change_type"), pre.as("img")),
        struct(lit("update_postimage").as("_change_type"), post.as("img"))))
    j.filter(col("_in_a").isNull || col("_in_b").isNull || !same)
      .select(keys.map(col) :+ explode(changes).as("_c"): _*)
      .select(keys.map(col) ++
        payload.map(c => col(s"_c.img.`$c`").as(c)) ++ Seq(
          col("_c._change_type").as("_change_type"),
          lit(fromV).as("_from_version"), lit(toV).as("_to_version")): _*)
  }

  /** Persist as a bucketed+sorted table: two fact tables bucketed on their
    * join key with the same bucket count join with NO exchange and NO sort —
    * the shuffle is paid once at write time instead of on every join. This
    * is the 100 TB answer for fact⋈fact joins that recur (e.g.
    * orders⋈lineitem): co-locate by construction.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)
}
