package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface (`spark.sql.extensions=graft.GraftExtensions`): every
  * injected function must resolve from plain SQL and return EXACTLY what
  * the Scala/Column API returns — same expression class, so same codegen,
  * same results. The shared test session registers the extension through
  * the same `withExtensions` path a production config uses.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("graft_extract_spans from pure SQL equals the Column-API extraction") {
    Fixtures.raw(spark).createOrReplaceTempView("ge_raw")
    val sql = spark.sql(
      "SELECT doc_id, graft_extract_spans(spans, meta) AS r FROM ge_raw")
      .select(col("doc_id"), col("r"))
    val api = Fixtures.raw(spark).select(col("doc_id"),
      graft.functions.ExtractSpansExpr(col("spans"), col("meta")).as("r"))
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.selectExpr("bit_xor(xxhash64(doc_id, to_json(r)))").head().getLong(0)
    assert(h(sql) == h(api))
    // annotated form resolves too and differs from the plain form
    val ann = spark.sql(
      "SELECT bit_xor(xxhash64(doc_id, to_json(graft_extract_spans_annotated(spans, meta)))) FROM ge_raw")
      .head().getLong(0)
    assert(ann != h(api))
  }

  test("sketch functions from SQL match their Column forms; nav function resolves") {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "completely different content here about shuffles"))
      .toDF("doc_id", "text").createOrReplaceTempView("ge_docs")
    val sql = spark.sql(
      """SELECT doc_id, graft_shingle_hashes(text, 3) AS sh,
        |  graft_minhash_shingles(text, 32, 3).sig AS sig,
        |  graft_rolling_fp(text) AS fp FROM ge_docs""".stripMargin).collect()
      .map(r => r.getLong(0) -> r).toMap
    val api = spark.table("ge_docs").select(col("doc_id"),
      graft.functions.ShingleHashExpr(col("text"), 3).as("sh"),
      graft.functions.MinHashWithShinglesExpr(col("text"), 32, 3).getField("sig").as("sig"),
      graft.functions.RollingHash64(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r).toMap
    api.foreach { case (id, a) =>
      val s = sql(id)
      assert(s.getSeq[Long](1) == a.getSeq[Long](1))
      assert(s.getSeq[Long](2) == a.getSeq[Long](2))
      assert(s.getLong(3) == a.getLong(3))
    }
    // span_nav resolves over the extraction output shape
    Fixtures.docs(spark).createOrReplaceTempView("ge_spans")
    assert(spark.sql("SELECT graft_span_nav(spans) FROM ge_spans LIMIT 1").count() == 1L)
  }

  test("non-literal scalar config is rejected with a clear message at resolution") {
    import spark.implicits._
    Seq((1L, "a b c")).toDF("doc_id", "text").createOrReplaceTempView("ge_bad")
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(text, CAST(doc_id AS INT)) FROM ge_bad").collect()
    }
    assert(ex.getMessage.contains("integer literal"))
  }

  test("DESCRIBE FUNCTION shows the usage signature (r05 advice: usage was dropped)") {
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED graft_extract_spans")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_extract_spans(spans, meta)"),
      s"usage text missing from DESCRIBE output:\n$desc")
    assert(desc.contains("strips boilerplate"))
    val descSig = spark.sql("DESCRIBE FUNCTION graft_minhash_sig")
      .collect().map(_.getString(0)).mkString("\n")
    assert(descSig.contains("graft_minhash_sig(shingle_hashes, num_hashes)"))
  }
}
