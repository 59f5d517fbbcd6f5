package graft

import org.apache.spark.sql.functions._
import graft.ops.{Components, Fixpoint, FuzzyJoin}

/** Round-19 pins (optimization round): the strong-field blocked fuzzy
  * pair join must be output-identical to the derive-then-filter form it
  * replaced; the fixpoint loop-width derivation must clamp correctly and
  * restore session conf on every exit path; the width-scoped components
  * loop must label identically at any width.
  */
class Round19Spec extends SparkSpecBase {
  import spark.implicits._

  /** Synthetic dirty mentions: sequential names (heavy deletion-key
    * sharing — the blow-up case), typo'd duplicates agreeing on the
    * strong field, and a near-name pair DISAGREEING on it (must be
    * admitted by fuzzy-alone, dropped by strong agreement).
    */
  private def mentions = {
    val base = spark.range(0, 60).select(
      col("id").as("m_id"),
      concat(lit("Cust#00"), lpad(col("id").cast("string"), 3, "0"))
        .as("m_name"),
      (col("id") % 7).cast("double").as("bal"))
    val typos = spark.range(0, 60).filter(col("id") % 10 === 0).select(
      (col("id") + 1000).as("m_id"),
      concat(lit("Kust#00"), lpad(col("id").cast("string"), 3, "0"))
        .as("m_name"),
      (col("id") % 7).cast("double").as("bal"))
    base.unionByName(typos)
  }

  test("edit1StrongPairs == edit1Pairs + exact strong-field post-filter") {
    val m = mentions
    val strong = FuzzyJoin.edit1StrongPairs(m, col("m_id"), col("m_name"),
        col("bal"))
      .orderBy("id1", "id2").collect().map(_.toString).toSeq
    val bal = m.select(col("m_id"), col("bal"))
    val filtered = FuzzyJoin.edit1Pairs(m, col("m_id"), col("m_name"))
      .join(bal.select(col("m_id").as("id1"), col("bal").as("b1")), "id1")
      .join(bal.select(col("m_id").as("id2"), col("bal").as("b2")), "id2")
      .filter(col("b1") === col("b2"))
      .select(col("id1"), col("id2")).distinct()
      .orderBy("id1", "id2").collect().map(_.toString).toSeq
    assert(strong === filtered,
      "blocking on (key, strong) must admit exactly the pairs the " +
        "post-filter form admits")
    assert(strong.nonEmpty, "the typo'd duplicates must pair up")
    // fuzzy-alone admits MORE on sequential names (the mass the blocking
    // saves) — otherwise this pin proves nothing
    val fuzzyOnly = FuzzyJoin.edit1Pairs(m, col("m_id"), col("m_name"))
      .select("id1", "id2").distinct().count()
    assert(fuzzyOnly > strong.length,
      s"sequential names must admit extra fuzzy-alone pairs ($fuzzyOnly " +
        s"vs ${strong.length}) for the blocking to matter")
  }

  test("edit1IncrementalStrongPairs == full strong pairs touching the probe") {
    val m = mentions
    val probe = m.filter(col("m_id") % 5 === 4)
    val index = m.filter(col("m_id") % 5 =!= 4)
    def keys(df: org.apache.spark.sql.DataFrame) =
      FuzzyJoin.deletionKeysWith(df, col("m_id"), col("m_name"), col("bal"))
    val inc = FuzzyJoin.edit1IncrementalStrongPairs(keys(probe), keys(index))
      .orderBy("id1", "id2").collect().map(_.toString).toSeq
    val full = FuzzyJoin.edit1StrongPairs(m, col("m_id"), col("m_name"),
      col("bal"))
    val indexInternal = FuzzyJoin.edit1StrongPairs(index, col("m_id"),
      col("m_name"), col("bal"))
    val expected = full.exceptAll(indexInternal)
      .orderBy("id1", "id2").collect().map(_.toString).toSeq
    assert(inc === expected,
      "incremental strong pairs must be exactly the full pair set minus " +
        "index-internal pairs")
  }

  test("Fixpoint.widthFor clamps to [1, session width] and honors the conf") {
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Fixpoint.widthFor(spark, 0L) === 1)
    assert(Fixpoint.widthFor(spark, 1L) === 1)
    assert(Fixpoint.widthFor(spark, Fixpoint.DefaultRowsPerPartition) === 1)
    assert(Fixpoint.widthFor(spark,
      Fixpoint.DefaultRowsPerPartition + 1) === math.min(2, cap))
    assert(Fixpoint.widthFor(spark, Long.MaxValue / 4) === cap)
    spark.conf.set(Fixpoint.RowsPerPartitionKey, "10")
    try {
      assert(Fixpoint.widthFor(spark, 25L) === math.min(3, cap))
    } finally spark.conf.unset(Fixpoint.RowsPerPartitionKey)
  }

  test("withLoopConf restores AQE and shuffle width on success and throw") {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    val sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    Fixpoint.withLoopConf(spark, 1) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "1")
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === sp0)
    intercept[RuntimeException] {
      Fixpoint.withLoopConf(spark, 2) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === sp0)
  }

  test("connectedComponents labels identically at width 1 and session width") {
    // two components + an isolated node; edge mass small enough that the
    // derived loop width is 1 — force the session-width shape via the
    // rowsPerPartition conf and compare
    val nodes = spark.range(0, 50).toDF("id")
    val edges = spark.range(1, 40)
      .select((col("id") - 1).as("src"), col("id").as("dst"))
      .unionByName(Seq((45L, 46L), (46L, 47L)).toDF("src", "dst"))
    val tiny = Components.connectedComponents(nodes, edges)
      .orderBy("id").collect().map(_.toString).toSeq
    spark.conf.set(Fixpoint.RowsPerPartitionKey, "1")
    val wide = try Components.connectedComponents(nodes, edges)
      .orderBy("id").collect().map(_.toString).toSeq
    finally spark.conf.unset(Fixpoint.RowsPerPartitionKey)
    assert(tiny === wide,
      "the labeling must be independent of the loop's shuffle width")
    assert(tiny.length === 50)
  }
}
