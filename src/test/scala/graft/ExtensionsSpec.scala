package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function registration path: a session built with GraftExtensions
  * can call every custom expression from plain SQL.
  *
  * getOrCreate() reuses any existing default session and silently skips
  * extension injection, so this suite clears the default/active session,
  * builds its own (sharing the JVM's SparkContext), and restores the prior
  * default afterwards. It must use builder.withExtensions — the
  * `spark.sql.extensions` CONFIG is read from the SparkContext's conf, which
  * belongs to whichever suite created the context first in this JVM.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // Initialize the shared suite session FIRST: suites run in parallel, and
    // if this suite's extension session (built without the nanosAsLong read
    // conf) exists when TestSession's lazy getOrCreate fires, it gets captured
    // as the shared session and every events-table suite fails on
    // TIMESTAMP_NTZ columns. Forcing the lazy val here makes the order
    // deterministic.
    prior = Some(TestSession.spark)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    spark = SparkSession.builder()
      .appName("graft-ext-test")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    // do NOT stop: the SparkContext is shared with the other suites
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
  }

  test("cosine_sim and vec_dot work from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c,
        |       vec_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |               array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 23.0)
  }

  test("topk works from SQL and the check rule rejects oversized k at analysis") {
    val rows = spark.sql(
      """SELECT g, topk(s, i, 2) AS t FROM VALUES
        |  (1, 5.0D, 10L), (1, 9.0D, 11L), (1, 7.0D, 12L) AS v(g, s, i)
        |GROUP BY g""".stripMargin).collect()
    assert(rows.head.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) ===
      Seq(11L, 12L))
    val err = intercept[Exception] {
      spark.sql("SELECT topk(s, i, 2000000) FROM VALUES (1.0D, 1L) AS v(s, i)")
        .collect()
    }
    assert(err.getMessage.contains("cap"), s"wrong error: ${err.getMessage}")
  }

  test("text_stats, sig_agreement, vec_quantize round-trip from SQL") {
    val r = spark.sql(
      """SELECT text_stats('the cat and the dog!').s_en AS en,
        |       text_stats('le chat  et la mer').s_fr AS fr,
        |       text_stats(' a b  c ').ws_tokens AS wt,
        |       sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 2L, 9L, 4L)) AS sa,
        |       vec_dequantize(vec_quantize(
        |         array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)))) AS rt
        |""".stripMargin).collect().head
    assert(r.getLong(0) === 3L) // the, and, the
    assert(r.getLong(1) === 3L) // le, et, la
    assert(r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.75)
    val rt = r.getSeq[Float](4)
    assert(math.abs(rt(0) - 1.0f) <= 1f / 254 && math.abs(rt(1) + 0.5f) <= 1f / 254)
  }

  test("word_shingles, minhash_sig, simhash64 work from SQL") {
    val r = spark.sql(
      """SELECT word_shingles('The quick  brown Fox', 3) AS sh,
        |       size(minhash_sig(word_shingles('a b c d', 3), 32)) AS k,
        |       simhash64(word_shingles('hello world', 1)) AS s1,
        |       simhash64(word_shingles('HELLO   world', 1)) AS s2
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) === Seq("the quick brown", "quick brown fox"))
    assert(r.getInt(1) === 32)
    assert(r.getLong(2) === r.getLong(3), "simhash must be normalization-invariant")
  }
}
