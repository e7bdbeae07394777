package graft

import graft.corpus.SyntheticCorpus
import graft.oracle.Extractor
import graft.streaming.StreamingExtract
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extraction: output parity with the sequential oracle, and
  * checkpointed exactly-once resume — restarting with the same checkpoint
  * directory processes ONLY files that landed after the first run.
  */
class StreamingExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeWave(dir: String, ids: Seq[Long], wave: Int): Unit = {
    import spark.implicits._
    ids.map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i)))
      .toDS().coalesce(1).write.parquet(s"$dir/wave=$wave")
  }

  test("streaming extraction drains available files and matches the oracle; resume is exactly-once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    new java.io.File(in).mkdirs()

    // wave 1: two files land
    writeWave(in, 0L until 40L, 1)
    writeWave(in, 40L until 80L, 2)
    val q1 = StreamingExtract.start(spark, s"$in/*", out, ck)
    q1.awaitTermination()

    val got1 = spark.read.parquet(out)
    assert(got1.count() == 80)
    // span-sequence parity with the sequential oracle for the good docs
    val expected = (0L until 80L).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i)))
      .flatMap(d => try Some(Extractor.extract(d)) catch { case _: Exception => None })
      .map(d => d.doc_id -> d.spans).toMap
    got1.where($"error".isNull).as[graft.core.Extracted].collect().foreach { e =>
      assert(expected(e.doc_id) == e.spans, e.doc_id)
    }

    // wave 2 lands AFTER the first query stopped; restart with same checkpoint
    writeWave(in, 80L until 100L, 3)
    val q2 = StreamingExtract.start(spark, s"$in/*", out, ck)
    q2.awaitTermination()
    val got2 = spark.read.parquet(out)
    // exactly-once: 100 total, no reprocessing of waves 1-2
    assert(got2.count() == 100)
    assert(got2.select($"doc_id").distinct().count() == 100)
  }

  test("streaming dedup within horizon: one survivor per fingerprint across micro-batches") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_stream_d").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("event_time", TimestampType)))
    def wave(n: Int, rows: Seq[(Long, String, Long)]): Unit = {
      import spark.implicits._
      rows.map { case (id, t, ms) => (id, t, new java.sql.Timestamp(ms)) }
        .toDF("doc_id", "text", "event_time")
        .coalesce(1).write.parquet(s"$in/wave=$n")
    }
    val t0 = 1700000000000L
    wave(1, Seq((1L, "alpha text", t0), (2L, "beta text", t0 + 1000),
      (10L, null, t0 + 500)))
    // re-ingested duplicate of "alpha text" (different doc_id, later time)
    // inside the horizon + one genuinely new doc + a SECOND null-text doc
    // (unscorable rows must ALL pass through — batch-parity contract; a
    // naive null fingerprint key would collapse them to one survivor)
    wave(2, Seq((3L, "alpha text", t0 + 2000), (4L, "gamma text", t0 + 3000),
      (11L, null, t0 + 2500)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = StreamingExtract.dedupWithinHorizon(src)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("dedup_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // exactly one survivor per distinct text; the duplicate doc_id=3 dropped;
    // BOTH null-text docs survive (unique per-doc dedup keys)
    assert(got.collect { case (_, t) if t != null => t }.sorted.toSeq
      == Seq("alpha text", "beta text", "gamma text"))
    assert(!got.map(_._1).contains(3L))
    assert(got.filter(_._2 == null).map(_._1).toSet == Set(10L, 11L))
  }

  test("streaming decontamination drops hash-route and short-item-route docs on arrival, parity with batch") {
    import spark.implicits._
    val longItem = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    val shortItem = "what is the capital of france"
    val bench = Seq(longItem, shortItem).toDF("text")
    val docs = Seq(
      1L -> s"intro words then $longItem and trailing words", // 13-gram hash hit
      2L -> s"padding $shortItem padding",                    // short containment hit
      3L -> "completely clean document with nothing shared at all beyond stray words")
    val model = StreamingExtract.benchmarkModel(bench, 13)
    assert(model.shingleHashes.nonEmpty && model.shortItems.sameElements(Array(shortItem)))

    val base = java.nio.file.Files.createTempDirectory("graft_stream_c").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/wave=1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = StreamingExtract.dropContaminatedStream(src, model)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.table("decon_stream").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    // exact parity with the batch op at minCollisions = 1
    val batchKept = graft.functions.Dedup
      .dropContaminated(docs.toDF("doc_id", "text"), bench, 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == kept)
  }

  test("streaming health counts aggregate docs/quarantine/spans per window") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream_h").toString
    val in = s"$base/in"; val ck = s"$base/ck"
    new java.io.File(in).mkdirs()
    // include a poison doc: 1009 is the poison stride
    writeWave(in, Seq(1009L) ++ (0L until 30L), 1)
    val raw = spark.readStream.schema(graft.model.Schemas.rawDocs).parquet(s"$in/*")
    val counts = StreamingExtract.healthCounts(graft.core.Extract.runExpr(raw))
    // complete mode: append would hold the open window in state until LATER
    // data advances the watermark — an always-on job gets that for free, a
    // drain-and-stop test does not
    val q = counts.writeStream.format("memory").queryName("graft_health")
      .outputMode("complete")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.sql("SELECT n_docs, n_quarantined, n_spans FROM graft_health").collect()
    val totDocs = rows.map(_.getLong(0)).sum
    val totQuar = rows.map(_.getLong(1)).sum
    assert(totDocs == 31)
    assert(totQuar == 1)
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
