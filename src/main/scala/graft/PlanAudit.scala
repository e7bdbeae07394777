package graft

import graft.corpus.SyntheticCorpus
import graft.core.Extract
import graft.model.RawDoc
import graft.oracle.Extractor
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan + hot-path audit (the ".explain and iterate" loop):
  *  1. measures the pure-Scala extraction rate (no Spark) against the Spark
  *     per-core rate — quantifies encoder ser/de overhead;
  *  2. dumps `explain("formatted")` for the load-bearing queries to
  *     PLANS.md so scan pruning / codegen spans / join strategies are
  *     reviewable.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- 1. pure-Scala rate vs Spark rate -------------------------------
    val docs = (0L until 20000L).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i))).toArray
    // warmup (poison docs throw by design — swallow)
    docs.take(2000).foreach(d => try Extractor.extract(d) catch { case _: Exception => })
    val t0 = System.nanoTime()
    var n = 0
    docs.foreach { d => try { Extractor.extract(d); n += 1 } catch { case _: Exception => } }
    val pureSec = (System.nanoTime() - t0) / 1e9
    val pureRate = n / pureSec

    val ds = docs.toSeq.toDS().repartition(8).persist()
    ds.count()
    def timeIt(f: => Unit): Double = { f; val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    // decomposition: input deserialization alone vs full pipeline
    val deserSec = timeIt { ds.foreach(_ => ()) }
    val runOnly = timeIt { Extract.run(ds).foreach(_ => ()) }
    val sparkSec = timeIt { Extract.good(Extract.run(ds)).foreach(_ => ()) }
    val exprSec = timeIt { Extract.runExpr(ds.toDF()).foreach(_ => ()) }
    val sparkRate = n / sparkSec / 8 // per-core
    println(f"DECOMP deser=$deserSec%.2fs run=$runOnly%.2fs run+good=$sparkSec%.2fs expr=$exprSec%.2fs (8 cores, ${docs.length} docs)")

    val exprRate = n / exprSec / 8
    val summary =
      f"""# PLANS — plan audit & hot-path profile (round 6)
         |
         |## Hot path: encoder overhead
         |
         || measure | rate |
         ||---|---|
         || pure Scala single-thread extraction | $pureRate%.0f docs/sec |
         || typed mapPartitions path per-core (local[8]) | $sparkRate%.0f docs/sec |
         || fused extract_spans expression per-core (local[8]) | $exprRate%.0f docs/sec |
         || typed-path encoder+framework overhead | ${100 * (1 - sparkRate / pureRate)}%.1f%% |
         |
         |(Single-shot probe on a shared box: host-steal bursts make absolute
         |rates swing 2-4x between runs — r03 observed 19.7k-50.8k docs/s pure
         |on identical code; see BASELINE.md "regression reconciliation". Use
         |the RATIO for the encoder-overhead reading, and BASELINE.md's
         |pinned min-of-reps protocol for absolute throughput claims.)
         |
         |PITFALL (verified, extended in r02): any predicate that ends up below
         |the project re-evaluates extract_spans per reference. `where(x.error
         |is null)` is pushed + alias-substituted (3 evals), and even a plain
         |posexplode triggers InferFiltersFromGenerate, whose size()/isnotnull
         |conditions sink below the project (5 evals). Remedy used by x5:
         |posexplode_outer (infers no filters) + a filter on the GENERATED pos
         |column, which cannot sink below its Generate — plan-audited to exactly
         |one extract_spans (SparkExtractSpec). Production jobs write the full
         |(doc_id, spans, error) output and split downstream, or persist before
         |splitting (Lineage does the latter).
         |
         |""".stripMargin

    // --- 2. explain dumps ----------------------------------------------
    def explainOf(name: String, df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      s"## $name\n\n```\n${qe.explainString(org.apache.spark.sql.execution.FormattedMode)}\n```\n\n"
    }
    val sb = new StringBuilder(summary)
    val fx = Fixtures.docs(spark)
    sb ++= explainOf("q_all_text (per-row HOF — expect: single scan, no exchange, one WholeStageCodegen)",
      graft.queries.SpanQueries.allText(fx))
    sb ++= explainOf("q_count_by_kind (explode + partial/final hash agg — expect: 1 exchange)",
      graft.queries.SpanQueries.countByKind(fx))
    sb ++= explainOf("q_section_text (zero-shuffle section slice)",
      graft.queries.SpanQueries.sectionText(fx, "shopping"))
    sb ++= explainOf("d_minhash (r04 rework + r05 — expect: exactly THREE minhash_with_shingles evals total, structurally (not reuse-dependent): ONE under the banding groupBy (candidate edges are synthesized IN-ROW per band bucket — exhaustive pairs within maxBandBucket, hub star edges past it — no band self-join at all), plus the two precomputed-array verify branches; banding shuffles (band_hash, id) pairs only; null-text rows excluded before banding. An intermediate window+self-join form re-evaluated the sketch 5x because column pruning de-canonicalized its three exchange consumers — caught in this dump, replaced by the aggregation)",
      graft.functions.Dedup.minHashNearDuplicates(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 0.5))
    locally {
      // r05 hot-band skew drill (VERDICT r04 #5): a planted near-identical
      // cluster lands in ONE band bucket per band; execute and dump the
      // final adaptive plan to show the capped star-edge route is what
      // actually ran (and the candidate count stayed linear in the cluster)
      val hot = spark.range(150).selectExpr("id AS doc_id",
        "concat('the quick brown fox jumps over the lazy dog and then runs far away into the deep forest v', id) AS text")
      val capped = graft.functions.Dedup.minHashNearDuplicates(hot, 0.5, maxBandBucket = 50)
      val n = capped.count()
      val fin = capped.queryExecution.executedPlan.toString
      val sweeps = "minhash_with_shingles".r.findAllIn(fin).length
      sb ++= s"## d_minhash EXECUTED adaptive plan under a planted 150-doc hot band (expect: the hot bucket emits hub star edges from the banding aggregation - candidate pairs verified = $n, linear in the cluster, vs ~11k uncapped; minhash_with_shingles eval sites in the executed plan = $sweeps - the structural bound is 3: one banding sweep + two verify branches)\n\n```\n$fin\n```\n\n"
    }
    locally {
      // r06 (VERDICT r05 #1): same drill for the SimHash path — 150
      // chunk-identical docs land in ONE (band, chunk) bucket per band; the
      // former band self-join emitted O(k²) candidates here, the capped
      // aggregation emits hub star edges with the 8-byte sigs carried
      // IN-ROW (no join back for the Hamming verify at all)
      val hot = spark.range(150).selectExpr("id AS doc_id",
        "'the quick brown fox jumps over the lazy dog and then runs far away into the deep forest' AS text")
      val capped = graft.functions.Dedup.simHashNearDuplicates(hot, 3, maxBandBucket = 50)
      val n = capped.collect().length
      val fin = capped.queryExecution.executedPlan.toString
      val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(fin).length
      val obs = capped.queryExecution.observedMetrics.collectFirst {
        case (k, r) if k.contains("simhash") => r.mkString("(", ", ", ")") }
      sb ++= s"## d_simhash EXECUTED adaptive plan under a planted 150-doc hot cluster (expect: candidate pairs = $n — LINEAR (k-1 = 149 star edges), vs 11,175 uncapped member pairs; join operators in the plan = $joins — ZERO, the Hamming verify reads sigs from the bucket row itself; observed hot-band metric (n_hot_buckets, max_bucket, n_buckets) = $obs)\n\n```\n$fin\n```\n\n"
    }
    locally {
      // r06 (VERDICT r05 #2): embedding-RHP path — 150 identical embeddings
      // share every sign band; capped bucket aggregation emits star edges,
      // then ONLY the O(k) candidate set joins back to the vectors for the
      // cosine verify
      val hot = spark.range(150).selectExpr("id AS vec_id",
        "transform(sequence(1, 16), i -> cast(i / 16.0 AS float)) AS embedding")
      val capped = graft.functions.Dedup.embeddingNearDuplicatesLsh(hot, 0.9, maxBandBucket = 50)
      val n = capped.collect().length
      val fin = capped.queryExecution.executedPlan.toString
      val obs = capped.queryExecution.observedMetrics.collectFirst {
        case (k, r) if k.contains("embed_lsh") => r.mkString("(", ", ", ")") }
      sb ++= s"## d_embed_neardup_lsh EXECUTED adaptive plan under a planted 150-vector hot cluster (expect: verified pairs = $n — LINEAR (149 hub star edges, every cosine 1.0), vs 11,175 uncapped; the banding aggregation ships (band, id) only and the two feature joins touch just the capped candidate set; observed hot-band metric = $obs)\n\n```\n$fin\n```\n\n"
    }
    sb ++= explainOf("s_ann_top1 (broadcast queries; window top-k)",
      graft.functions.Similarity.bruteForceTopK(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where($"vec_id" < 20),
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), 1))
    sb ++= explainOf("scan pruning check: q_doc_stats reads only needed struct fields",
      graft.queries.SpanQueries.docStats(fx))
    sb ++= explainOf("q_heading_paths via span_nav (r01 #1 fix — expect: scan + project + generate, NO Exchange)",
      graft.queries.SpanQueries.headingPaths(fx))
    sb ++= explainOf("x5_extract_expr_spans (r01 #2 fix — expect: exactly ONE extract_spans; filter on generated pos)",
      SparkEntry.queries("x5_extract_expr_spans")(spark, ""))
    sb ++= explainOf("extract_auto tiers (r01 #3 — expect: union of fused scan, fused+RoundRobin exchange of outliers, chunked residual; r02 #5 — n_spans tier filters in PushedFilters on every scan)",
      Extract.runAuto(spark.read.schema(graft.model.Schemas.rawDocsWithN).parquet(Fixtures.RawPath),
        spreadThreshold = 1024, hugeThreshold = 6000))
    locally {
      // one CC round via the SAME builders the production loop uses
      // (Dedup.ccEdges/ccSeed/ccRound — r03 self-review: the audit must not
      // drift from the shipped plan): seed-fused round 1, propagate + two
      // pointer jumps + the convergence flag, all materialized by a SINGLE
      // action per round (lazy localCheckpoint).
      val pairs = spark.range(100).selectExpr("id AS a", "id % 7 AS b")
      val edges = graft.functions.Dedup.ccEdges(pairs)
      sb ++= explainOf("d_cc_components one round (r02 #1 — expect: partial_min below the propagate exchange (the giant-star skew defense: a 10^4-degree hub combines map-side); the jump's self-join subtrees dedup via exchange/subquery reuse; each round is ONE action — the convergence flag `chg` rides in the round's own output and the lazy localCheckpoint materializes inside that count)",
        graft.functions.Dedup.ccRound(graft.functions.Dedup.ccSeed(edges), edges))
    }
    sb ++= explainOf("d_ngram_jaccard with df-cap (r04 rework — expect: hot set (df > cap) built by partial/final count agg then BroadcastExchange'd into a LEFT ANTI gate (the keep-set of r03 was near-vocabulary-sized and could never broadcast at scale); the self-join aggregates count(*) per pair = capped |A∩B|, so the no-hot branch computes Jaccard ARITHMETICALLY — no per-candidate re-shingling, no text re-join; only the both-hot branch touches the shingle arrays)",
      graft.functions.Dedup.ngramJaccardPairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 3, 0.5))
    sb ++= explainOf("t_top_terms (r04 rework — expect: explode + partial/final count agg absorbing Zipf skew map-side, then a window partitioned by (lang, salt) for the LOCAL top-k — no window partition ever holds a full language vocabulary — and a final window over only langs x salts x k survivors)",
      graft.functions.TextAnalysis.topTermsPerLang(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 5))
    sb ++= explainOf("t_sample_stratified (r03 — expect: single scan, md5 keep-predicate inside the scan's WholeStageCodegen filter, NO shuffle/state)",
      graft.functions.TextAnalysis.sampleStratified(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "lang", Map("en" -> 0.5, "zh" -> 0.25)))
    sb ++= explainOf("t_gopher_rules (r04 — expect: single scan + ONE project, NO exchange; the project sits just outside WholeStageCodegen because the token-level rules use HOFs (ArrayFilter is CodegenFallback — the same trade every HOF text op here makes: in-row, zero-shuffle, interpreted per row)",
      graft.functions.TextAnalysis.gopherRules(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")))
    sb ++= explainOf("d_drop_seen_approx (r04 — expect: corpus side is scan + Filter(bloom_filter_might_contain(...)) in WholeStageCodegen, ZERO corpus shuffle; the reference pass happened before planning, as a driver-held sketch like the IVF centroids)",
      graft.functions.Dedup.dropSeenApprox(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .where($"doc_id" % 25 === 0)))
    locally {
      val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val bench = d.where($"doc_id" % 50 === 0).select($"text")
      sb ++= explainOf("d_contamination (r03 — expect: benchmark shingle vocab BroadcastExchange'd; the training side is scan + generate + broadcast-hash-join + partial/final count — its ONLY Exchange is the final doc_id agg)",
        graft.functions.Dedup.contaminationReport(d, bench, 13))
      sb ++= explainOf("t_pack (r03 — expect: ONE corpus Exchange (hashpartitioning on bucket) feeding the fine window; the coarse prefix scan windows over the 256-row bucket aggregate only; offsets return via BroadcastHashJoin; integer div arithmetic)",
        graft.functions.Packing.packSequences(d, 2048))
      locally {
        // static explain can't show AQE stage reuse — the bucket-totals
        // branch is built from the SAME window subtree precisely so its
        // shuffle dedups against the fine window's at runtime (one corpus
        // scan, not two). Execute and dump the final adaptive plan as proof.
        val packed = graft.functions.Packing.packSequences(d, 2048)
        // collect() (500 rows at sf0.001) drives THIS QueryExecution to its
        // final adaptive plan — foreach would execute a derived one and leave
        // this plan un-finalized
        packed.collect()
        val fin = packed.queryExecution.executedPlan.toString
        val reused = "ReusedExchange".r.findAllIn(fin).length
        sb ++= s"## t_pack EXECUTED adaptive plan (expect: the bucket-totals branch rides a ReusedExchange of the fine window's shuffle — the corpus parquet is scanned and shuffled ONCE; any FileScan text under the ReusedExchange is the reused reference's printout, not a second execution; ReusedExchange count = $reused)\n\n```\n$fin\n```\n\n"
      }
      locally {
        // r06: the public qualityTopFraction eagerly checkpoints + unpersists
        // (ADVICE r05 cache-leak fix), which truncates its visible plan to a
        // LogicalRDD scan — audit the real route via the plan variant, and
        // clean up its persist exactly as the wrapper would
        val (qp, plan) = graft.functions.Packing.qualityTopFractionPlan(d, 0.8)
        sb ++= explainOf("t_quality_top SPREAD route (r05 histogram routing — expect: bucket-partitioned row_number window + BroadcastHashJoin against the ≤101-row LITERAL offsets table (LocalTableScan; the histogram collect replaced the coarse-window branch); no global-order Exchange of the corpus. r06: dumped via qualityTopFractionPlan — the shipped wrapper adds an eager localCheckpoint + unpersist around EXACTLY this plan)",
          plan)
        qp.unpersist(false)
      }
      locally {
        // r05 pathological fallback (VERDICT r04 #7): constant-quality corpus
        // → one bucket holds everything → the router must pick the
        // range-partitioned exact-rank plan (RangePartitioning on BOTH sort
        // keys, so the doc_id tie-break splits the single quality value)
        val const = spark.range(400).selectExpr("id AS doc_id",
          "'identical boilerplate line for every document here' AS text")
        val (qp, plan) = graft.functions.Packing.qualityTopFractionPlan(const, 0.8)
        sb ++= explainOf("t_quality_top CONCENTRATED route (expect: Exchange rangepartitioning(quality DESC, doc_id) — the corpus splits on the tie-break; window partitioned by pid; coarse prefix over ≤ shuffle-partitions rows; NO single-partition corpus window)",
          plan)
        qp.unpersist(false)
      }
      locally {
        // r06: domain frequency cap — a 150-doc viral domain plus small
        // domains; the EXECUTED plan must show the under-cap bulk passing
        // through a BroadcastHashJoin LEFT ANTI (never shuffled) and the
        // over-cap docs ranked across an Exchange rangepartitioning(k_dom,
        // k_pri, k_key) — the viral domain SPANS range partitions instead
        // of landing in one hot window partition
        val skew = spark.range(150).selectExpr("concat('v', id) AS doc_id",
          "'viral.example' AS dom")
          .unionAll(spark.range(6).selectExpr("concat('s', id) AS doc_id",
            "concat('small', id % 3, '.example') AS dom"))
        val capped = graft.functions.Domains.domainFrequencyCap(skew, "dom", 10)
        val n = capped.count()
        val fin = capped.queryExecution.executedPlan.toString
        val ranges = "rangepartitioning\\(k_dom".r.findAllIn(fin).length
        val ckpts = "Scan ExistingRDD".r.findAllIn(fin).length
        sb ++= s"## t_domain_cap EXECUTED adaptive plan on a planted viral domain (expect: kept = $n — 10 of the viral 150 by salted-hash priority + all 6 small-domain docs; the FINAL plan is just anti-join bulk + semi-join against the checkpointed kept keys: checkpoint scans = $ckpts (hot set ×2 + kept keys), rangepartitioning exchanges HERE = $ranges — the exact per-domain rank (range partition + per-(pid,domain) window + coarse offsets, no per-domain mega-partition) ran ONCE in the eager kept-key job over the persisted narrow projection, instead of re-executing under every consumer)\n\n```\n$fin\n```\n\n"
      }
      locally {
        // r06: token-budget mixers — the EXECUTED plans must show the
        // corpus never shuffles: the only hashpartitioning Exchange is the
        // |targets|-row token-mass aggregate whose thresholds come back via
        // BroadcastExchange; the keep predicate (and the epoch generator in
        // the epochs form) evaluate on the probe side of the broadcast join
        val mix = spark.range(300).selectExpr("concat('d', id) AS doc_id",
          "concat('dom', id % 3) AS dom", "'five plain tokens here now' AS text")
        val kept = graft.functions.Domains.tokenBudgetMix(
          mix, "dom", Map("dom0" -> 0.25, "dom1" -> 0.25), 200)
        val nKept = kept.count()
        val fin = kept.queryExecution.executedPlan.toString
        val hashEx = "Exchange hashpartitioning".r.findAllIn(fin).length
        val bcast = "BroadcastExchange".r.findAllIn(fin).length
        sb ++= s"## t_token_mix EXECUTED adaptive plan (expect: kept = $nKept of 200 targeted (untargeted dom2 dropped by the broadcast inner join); hashpartitioning Exchanges = $hashEx — the token-mass aggregate ONLY, the corpus itself never shuffles; BroadcastExchange = $bcast carrying the |targets|-row thresholds; the md5 keep predicate filters on the probe side)\n\n```\n$fin\n```\n\n"
        val ep = graft.functions.Domains.tokenBudgetMixEpochs(
          mix, "dom", Map("dom0" -> 0.5, "dom1" -> 0.5), 20000, maxEpochs = 4)
        val nEp = ep.count()
        val finE = ep.queryExecution.executedPlan.toString
        val hashExE = "Exchange hashpartitioning".r.findAllIn(finE).length
        val gen = "Generate explode".r.findAllIn(finE).length
        sb ++= s"## t_token_mix_epochs EXECUTED adaptive plan (expect: rows = $nEp — 100 docs/domain x 4 capped epochs (q = 50 and 50 >= maxEpochs=4 on both targeted domains); hashpartitioning Exchanges = $hashExE (token-mass aggregate only); epoch fan-out Generate(explode(sequence)) = $gen on the PROBE side — output-proportional, never a shuffle)\n\n```\n$finE\n```\n\n"
      }
      locally {
        val nll = graft.functions.TextAnalysis.unigramLogProb(d)
        nll.collect()
        val fin = nll.queryExecution.executedPlan.toString
        val reused = "ReusedExchange".r.findAllIn(fin).length
        sb ++= s"## t_unigram_nll EXECUTED adaptive plan (expect: the corpus-total branch (sum over token counts) reuses the vocab branch's token-count shuffle — ReusedExchange count = $reused; score pass joins the broadcast vocab + 1-row total, its only Exchange the per-doc agg)\n\n```\n$fin\n```\n\n"
      }
    }
    locally {
      // r06: exact-substring dedup — a 60-token block shared by two docs
      // (plus unique affixes on the copy) makes 51 overlapping removal
      // windows in doc 2; the shipped plan must (a) merge them into ONE
      // coverage interval before the rewrite (payload and in-row filter
      // scale with duplicated BLOCKS, not windows), and (b) keep the text
      // out of every shuffle — the canon aggregate ships 16-byte md5 keys
      // with partial/final (map-side combine absorbs hot boilerplate keys),
      // and the interval merge (window + block agg + per-doc collect) all
      // clusters on doc_id so it rides the removals' single exchange
      val block = (1 to 60).map(i => s"b$i").mkString(" ")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
      val dd = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, block),
        org.apache.spark.sql.Row(2L, "u1 u2 u3 " + block + " u4 u5")), schema)
      val out = graft.functions.Dedup.dropDuplicatedSubstrings(dd, 10)
      val got = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // the adaptive dump appends an "== Initial Plan ==" copy — count
      // operators in the FINAL plan only
      val fin = out.queryExecution.executedPlan.toString
      val finalOnly = fin.split("== Initial Plan ==").head
      val hashEx = "Exchange hashpartitioning".r.findAllIn(finalOnly).length
      val md5s = "md5\\(cast\\(concat_ws".r.findAllIn(finalOnly).length
      sb ++= s"## d_drop_substr EXECUTED adaptive plan on a planted shared 60-token block (expect: canonical doc 1 untouched = '${got(1L).take(9)}…'; doc 2 strips EXACTLY the block — kept = '${got.getOrElse(2L, "<dropped>")}' — because its 51 overlapping removal windows merged into ONE [3,63) coverage interval (boundary-spanning windows are unique to doc 2, hence not duplicated, hence kept); final-plan hashpartitioning Exchanges = $hashEx: the md5-key canon aggregate + ONE doc_id exchange under the removals merge (lag window, block window, (doc_id,blk) agg and per-doc collect ALL cluster on doc_id — no exchange between them), while the per-doc interval lists reach the rewrite via BroadcastExchange; in-row window-synthesis md5 sites = $md5s — the canon sweep and the removals re-derive, each a posexplode over the transform (tokens never under the generate), the third (rewrite) sweep tokenizes only)\n\n```\n$fin\n```\n\n"
    }
    locally {
      // r06 rework proof for the line/paragraph keep-first rewrites: the
      // corpus TEXT must never enter an exchange — every hashpartitioning
      // below operates on (hash, doc, pos) or per-doc position lists
      val nl = spark.range(200).selectExpr("id AS doc_id",
        "concat('join our newsletter', chr(10), 'unique line ', id, chr(10), 'copyright corp') AS text")
      val dl = graft.functions.Dedup.dropRepeatedLines(nl, 3)
      dl.collect()
      val finL = dl.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val textEx = "Exchange hashpartitioning[^\\n]*\\n[^\\n]*(line|text)#".r.findAllIn(finL).length
      val dp = graft.functions.Dedup.dropDuplicateParagraphs(nl)
      dp.collect()
      val finP = dp.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      sb ++= s"## d_drop_lines / d_drop_paras EXECUTED plans after the r06 in-row rework (expect: NO exchange whose child carries a line/text column — shuffles move only 8/16-byte hashes, doc ids, positions, and per-doc removal lists; the rewrite filters lines/paragraphs in-row on a second scan; crude text-exchange regex hits = $textEx)\n\n```\n$finL\n```\n\n```\n$finP\n```\n\n"
    }
    sb ++= explainOf("t_chunk (r06 — expect: ONE scan, ZERO exchange: chunk starts + slices synthesized in-row (transform over the start sequence) then a single posexplode_outer with the pos filter above its Generate; output is chunk-proportional)",
      graft.functions.Packing.chunkTokens(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 64, 48))
    sb ++= explainOf("t_split (r06 — expect: single scan + project, NO exchange; the salted-md5 cumulative-threshold CASE is a pure codegen expression inside the scan's WholeStageCodegen)",
      graft.functions.TextAnalysis.assignSplit(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)))
    sb ++= explainOf("s_ann_lsh (r01 #9 — expect: fused rhp_sig, band join ships ids only, norms per-row pre-join)",
      graft.functions.Similarity.lshTopK(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where($"vec_id" < 20),
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), 5))
    Files.write(Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(f"AUDIT pure=$pureRate%.0f/s spark_per_core=$sparkRate%.0f/s overhead=${100 * (1 - sparkRate / pureRate)}%.1f%%")
    spark.stop()
  }
}
