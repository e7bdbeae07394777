package graft

import graft.core.Extract
import graft.model.RawDoc
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Diagnostic: split the extraction job into scan+extract (count) vs full
  * scan+extract+write, at both parallelism levels, to locate the scaling
  * bottleneck. Not part of the driver contract.
  */
/** Pure-core thread-scaling probe (no Spark): runs `Extractor.extract` over
  * an in-memory corpus with a fixed thread pool, at a given thread count.
  * Invoked per-level inside a pinned JVM (taskset + ActiveProcessorCount),
  * mirroring `bench/scaling.sh`'s protocol. If THIS shows the same 8→32
  * efficiency ceiling as the Spark job, the ceiling is the machine's memory
  * bus (string-churn bandwidth of parsing itself), not the Spark layer —
  * the "irreducible residual" evidence VERDICT r01 #4 asks for.
  *
  * Run: `runMain graft.PureScalingBench <threads> <nDocs> <rounds>`.
  */
object PureScalingBench {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nDocs = args.lift(1).map(_.toInt).getOrElse(400000)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val ids = (0 until nDocs).map(i => graft.corpus.SyntheticCorpus.docIdFor(i.toLong)).toArray
    // docs regenerate per round from ids (generation included identically in
    // every round and level; it is ~15% of extract cost and thread-local)
    def round(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = (nDocs + threads * 8 - 1) / (threads * 8)
      val t0 = System.nanoTime()
      val futs = ids.grouped(chunk).map { slice =>
        pool.submit(new Runnable {
          def run(): Unit = slice.foreach { id =>
            try graft.oracle.Extractor.extract(graft.corpus.SyntheticCorpus.rawDoc(id))
            catch { case _: Exception => }
          }
        })
      }.toArray
      futs.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    round(); round() // JIT warmup
    val times = (1 to rounds).map(_ => round())
    println(s"""GRAFT_PURE {"threads":$threads,"docs":$nDocs,"times":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
  }
}

/** Control probes for the on-box scaling analysis: `cpu` = zero-allocation
  * hashing of a thread-local buffer (pure ALU+L1); `alloc` = the same loop
  * but allocating/discarding strings (~the extractor's churn profile). If
  * `cpu` scales ~1.0 from 8→32 threads while `alloc` mirrors the extractor's
  * ~0.45, the ceiling is allocation/memory bandwidth, not CPU availability.
  * Run: `runMain graft.AllocProbe <cpu|alloc> <threads> [seconds]`; also
  * prints bytes allocated per op via ThreadMXBean.
  */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val threads = args(1).toInt
    val secs = args.lift(2).map(_.toDouble).getOrElse(3.0)
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ops = new java.util.concurrent.atomic.AtomicLong(0)
    val allocated = new java.util.concurrent.atomic.AtomicLong(0)
    def work(): Runnable = new Runnable {
      def run(): Unit = {
        val tid = Thread.currentThread().getId
        val a0 = mx.getThreadAllocatedBytes(tid)
        val buf = new Array[Byte](1024)
        scala.util.Random.nextBytes(buf)
        var h = 0L
        var n = 0L
        if (mode == "cpu") {
          while (!stop.get()) { h = graft.functions.HashUtil.xxhash64(buf, h); n += 1 }
        } else {
          val src = new String(buf.map(b => ('a' + (b & 15)).toChar))
          while (!stop.get()) {
            // build + copy + discard ~1KB of string, like the fold hot path
            val sb = new java.lang.StringBuilder
            var i = 0
            while (i < 8) { sb.append(src, i * 16, i * 16 + 128); i += 1 }
            h ^= sb.toString.strip().hashCode.toLong
            n += 1
          }
        }
        ops.addAndGet(n)
        allocated.addAndGet(mx.getThreadAllocatedBytes(tid) - a0)
        if (h == 42) println("") // keep h live
      }
    }
    def round(): (Double, Long, Long) = {
      stop.set(false); ops.set(0); allocated.set(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      (1 to threads).foreach(_ => pool.submit(work()))
      Thread.sleep((secs * 1000).toLong)
      stop.set(true); pool.shutdown()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      (ops.get() / secs, ops.get(), allocated.get())
    }
    round() // warmup
    val (rate, n, alloc) = round()
    println(f"""GRAFT_PROBE {"mode":"$mode","threads":$threads,"ops_per_sec":$rate%.0f,"bytes_per_op":${if (n > 0) alloc / n else 0}}""")
  }
}

object ScalingDiag {
  def main(args: Array[String]): Unit = {
    def sess(cores: Int) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    Seq(8, 32, 8, 32).foreach { cores =>
      val s = sess(cores)
      import s.implicits._
      def raw = s.read.schema(graft.model.Schemas.rawDocs).parquet(Bench.BenchRawPath).as[RawDoc]
      val scanOnly = t { raw.foreach(_ => ()) }
      val extractCount = t { Extract.good(Extract.run(raw)).foreach(_ => ()) }
      val full = t { Extract.good(Extract.run(raw)).write.mode(SaveMode.Overwrite)
        .parquet("/dev/shm/graft_diag_out.parquet") }
      println(f"DIAG cores=$cores%2d scan=$scanOnly%6.2f extract=$extractCount%6.2f full=$full%6.2f")
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession(); System.gc()
    }
  }
}
