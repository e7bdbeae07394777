package graft

import graft.core.Lineage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Checkpoint-resume semantics (SURVEY.md §4.3.2): kill after batch k,
  * re-run, output identical; completed batches are not re-executed.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rmrf(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  test("batched run commits lineage rows; resume skips completed batches and yields identical output") {
    import spark.implicits._
    val rawPath = "/tmp/graft_lineage_raw"
    val outPath = "/tmp/graft_lineage_out"
    rmrf(rawPath); rmrf(outPath)
    (0L until 200L).map(i => graft.corpus.SyntheticCorpus.rawDoc(graft.corpus.SyntheticCorpus.docIdFor(i)))
      .toDS().repartition(6).write.parquet(rawPath)

    val rows1 = Lineage.runBatched(spark, rawPath, outPath, numBatches = 3)
    assert(rows1.map(_.batch_id).sorted == Seq(0, 1, 2))
    assert(rows1.map(_.doc_count).sum == 200)
    val out1 = spark.read.parquet(s"$outPath/docs").orderBy("doc_id").collect()

    // simulate a crash after batch 0: drop batches 1,2 data AND their lineage
    rmrf(s"$outPath/docs/batch=1"); rmrf(s"$outPath/docs/batch=2")
    rmrf(s"$outPath/_lineage/batch=1"); rmrf(s"$outPath/_lineage/batch=2")

    val before = Files.getLastModifiedTime(Paths.get(s"$outPath/docs/batch=0"))
    val rows2 = Lineage.runBatched(spark, rawPath, outPath, numBatches = 3)
    assert(rows2.map(_.batch_id).sorted == Seq(0, 1, 2))
    // batch 0 not recomputed (identical lineage row, untouched directory)
    assert(rows2.find(_.batch_id == 0).get.committed_at ==
           rows1.find(_.batch_id == 0).get.committed_at)
    assert(Files.getLastModifiedTime(Paths.get(s"$outPath/docs/batch=0")) == before)

    val out2 = spark.read.parquet(s"$outPath/docs").orderBy("doc_id").collect()
    assert(out1.toSeq == out2.toSeq)
  }

  test("lineage rows carry real metrics (docs + spans + errors)") {
    val committed = Lineage.committedBatches(spark, "/tmp/graft_lineage_out")
    assert(committed.size == 3)
    assert(committed.values.map(_.doc_count).sum == 200)
    assert(committed.values.map(_.span_count).sum > 1000)
    assert(committed.values.forall(_.wall_ms > 0))
  }

  test("fingerprint is sensitive to mode and in-place file rewrites; empty _lineage does not kill resume") {
    val files = Lineage.inputBatches(spark, "/tmp/graft_lineage_raw", 1).head._2
    val expr = Lineage.fingerprint(spark, files, "expr")
    // a re-run under another extraction mode must NOT skip committed batches
    assert(expr != Lineage.fingerprint(spark, files, "typed"))
    // a file rewritten in place (same path, new bytes) must change identity
    val victim = Paths.get(new java.net.URI(files.head))
    val original = Files.readAllBytes(victim)
    try {
      Files.write(victim, original ++ original)
      assert(Lineage.fingerprint(spark, files, "expr") != expr)
    } finally Files.write(victim, original)
    // _lineage dir that exists but holds no readable parquet = nothing committed
    val ghost = "/tmp/graft_lineage_ghost"
    rmrf(ghost)
    Files.createDirectories(Paths.get(s"$ghost/_lineage/batch=0/_temporary"))
    assert(Lineage.committedBatches(spark, ghost).isEmpty)
  }
}
