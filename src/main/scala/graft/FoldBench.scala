package graft
import graft.corpus.SyntheticCorpus
import graft.oracle.Extractor
/** Microbench: pure extraction + isolated fold-stage comparison. */
object FoldBench {
  def oldFold(tokens: Seq[String]): String = {
    val sb = new java.lang.StringBuilder
    tokens.foreach { tok =>
      if (tok.startsWith("run:")) sb.append(tok.substring(4))
      else if (tok == "tab") sb.append('\t')
      else if (tok == "cr" || tok.startsWith("br:")) sb.append(' ')
      else ()
    }
    sb.toString.strip()
  }
  def main(args: Array[String]): Unit = {
    val docs = (0L until 20000L).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i))).toArray
    val payloads = docs.flatMap(_.spans.filter(_.kind == "p").map(_.text))
    println("payloads: " + payloads.length)
    def best(f: => Unit): Double = {
      var b = Double.MaxValue
      (1 to 5).foreach { _ => val t0 = System.nanoTime(); f; val dt = (System.nanoTime()-t0)/1e9; if (dt < b) b = dt }
      b
    }
    var bestE = Double.MaxValue
    (1 to 5).foreach { _ =>
      val t0 = System.nanoTime(); var n = 0
      docs.foreach { d => try { Extractor.extract(d); n += 1 } catch { case _: Exception => } }
      val dt = (System.nanoTime() - t0) / 1e9; if (dt < bestE) bestE = dt
    }
    println(f"FOLDBENCH best=${docs.length / bestE}%.0f docs/sec")
  }
}
object FamilyBench {
  def main(args: Array[String]): Unit = {
    val fams = graft.corpus.SyntheticCorpus.Families :+ "mega"
    fams.foreach { fam =>
      val n = if (fam == "mega") 20 else 1000
      val docs = (0 until n).map(i => graft.corpus.SyntheticCorpus.rawDoc(f"doc-$fam-$i%09d")).toArray
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        docs.foreach(d => try graft.oracle.Extractor.extract(d) catch { case _: Exception => })
        val dt = (System.nanoTime()-t0)/1e9; if (dt < best) best = dt
      }
      println(f"FAM $fam%-12s ${docs.length/best}%9.0f docs/sec")
    }
  }
}
