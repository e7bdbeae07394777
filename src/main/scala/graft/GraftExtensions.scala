package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native Catalyst expressions: registering
  * this class via `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) makes the
  * extraction and sketch primitives first-class SQL functions, so a SQL-only
  * consumer (spark-sql shell, Thrift server, a notebook cell) can run the
  * whole extraction without touching the Scala API:
  *
  * {{{
  * SELECT doc_id, graft_extract_spans(spans, meta) AS spans FROM raw_docs
  * SELECT graft_minhash_shingles(text, 32, 3).sig FROM documents
  * }}}
  *
  * Scalar config arguments (hash counts, n-gram size) must be foldable
  * integer literals — they parameterize codegen, not per-row data — and are
  * checked at resolution time with a clear error instead of a ClassCastException.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(fn: String, arg: String)(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, name), builder))

    inject("graft_extract_spans") { args =>
      require(args.length == 2, "graft_extract_spans(spans, meta)")
      ExtractSpansExpr(args(0), args(1), annotate = false)
    }
    inject("graft_extract_spans_annotated") { args =>
      require(args.length == 2, "graft_extract_spans_annotated(spans, meta)")
      ExtractSpansExpr(args(0), args(1), annotate = true)
    }
    inject("graft_span_nav") { args =>
      require(args.length == 1, "graft_span_nav(spans)")
      SpanNavExpr(args(0))
    }
    inject("graft_shingle_hashes") { args =>
      require(args.length == 2, "graft_shingle_hashes(text, ngram)")
      ShingleHashExpr(args(0), litInt("graft_shingle_hashes", "ngram")(args(1)))
    }
    inject("graft_minhash_sig") { args =>
      require(args.length == 2, "graft_minhash_sig(shingle_hashes, num_hashes)")
      MinHashSigExpr(args(0), litInt("graft_minhash_sig", "num_hashes")(args(1)))
    }
    inject("graft_minhash_shingles") { args =>
      require(args.length == 3, "graft_minhash_shingles(text, num_hashes, ngram)")
      MinHashWithShinglesExpr(args(0),
        litInt("graft_minhash_shingles", "num_hashes")(args(1)),
        litInt("graft_minhash_shingles", "ngram")(args(2)))
    }
    inject("graft_rolling_fp") { args =>
      require(args.length == 1, "graft_rolling_fp(text)")
      RollingHash64(args(0))
    }
    inject("graft_l2norm") { args =>
      require(args.length == 1, "graft_l2norm(vec)")
      L2NormExpr(args(0))
    }
    inject("graft_rhp_sig") { args =>
      require(args.length == 2, "graft_rhp_sig(vec, bits)")
      RhpSigExpr(args(0), litInt("graft_rhp_sig", "bits")(args(1)))
    }
  }
}
