package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates `text_bpe` (r19 — the real BPE apply): cross-implementation
  * equality against an independent JVM reference fold on real sf0.001
  * documents, plus the recall bounds vs `text_tokens`'s word counts
  * the VERDICT asked for (every word ≥ 1 token, every token ≤ its
  * chars, merges strictly compress the corpus). */
class BpeSpec extends AnyFunSuite {
  private lazy val s = SparkFixture.spark

  /** Independent reference: java.lang.String.replace has the same
    * left-to-right non-overlapping all-occurrence semantics as Spark's
    * and DuckDB's replace(). */
  private def refBpe(text: String): (Long, Long) = {
    val norm = Option(text).getOrElse("")
      .toLowerCase.replaceAll("[^a-z]+", " ").trim
    val sym = norm.map(c => s"|$c|").mkString
    val merged = graft.operators.TextOps.BPE_MERGES.foldLeft(sym) {
      case (m, (a, b)) => m.replace(s"|$a||$b|", s"|$a$b|") }
    val nSym = merged.count(_ == '|') / 2
    val nSpace = merged.count(_ == ' ')
    (norm.count(_ != ' ').toLong, (nSym - nSpace).toLong)
  }

  test("text_bpe equals an independent reference fold on sf0.001 and " +
       "satisfies the token-count recall bounds vs text_tokens") {
    val out = SparkEntry.queries("text_bpe")(s, SparkFixture.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val docs = s.read
      .parquet(SparkFixture.sf001 + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size, "one row per document")
    out.foreach { case (id, chars, toks) =>
      val (refChars, refToks) = refBpe(docs(id))
      assert(chars == refChars, s"doc $id: n_chars_az $chars != $refChars")
      assert(toks == refToks, s"doc $id: bpe_tokens $toks != $refToks")
      // bounds: a word is never split across words and never merged
      // away — tokens per doc lie in [words, a-z chars]
      val norm = docs(id).toLowerCase.replaceAll("[^a-z]+", " ").trim
      val words = if (norm.isEmpty) 0 else norm.split(" ").length
      assert(toks >= words, s"doc $id: $toks tokens < $words words")
      assert(toks <= chars, s"doc $id: $toks tokens > $chars chars")
    }
    // the merge table genuinely compresses English text corpus-wide
    val totalToks = out.map(_._3).sum
    val totalChars = out.map(_._2).sum
    assert(totalToks < totalChars * 17 / 20,
      s"BPE merges must compress ≥15%: $totalToks tokens / $totalChars chars")
    // hand-checked micro example: "the" = |th||e| -> |the| (rank 2 via
    // rank 1), one token; "and" -> |and| via ranks 4 then 5
    val (c1, t1) = refBpe("the and")
    assert(c1 == 6 && t1 == 2, s"'the and' must merge to 2 tokens: $t1")
  }

  test("text_bpe_train learns the exact greedy merge table (r19): " +
       "round-1 winner matches an independent pair count, pair counts " +
       "are non-increasing, and applying the learned table compresses") {
    val table = SparkEntry.queries("text_bpe_train")(s, SparkFixture.sf001)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4)))
    assert(table.length == 8 && table.map(_._1).toSeq == (1 to 8),
      s"8 ranked merges expected: ${table.toSeq}")
    table.foreach { case (_, a, b, m, _) => assert(m == a + b) }
    // greedy invariant: a merge only creates pairs bounded by its own
    // count, so the winning count can never increase with rank
    val counts = table.map(_._5).toSeq
    assert(counts == counts.sorted.reverse,
      s"pair counts must be non-increasing: $counts")
    // independent round-1 cross-check: count weighted adjacent char
    // pairs over the word vocabulary in plain JVM code
    val docs = s.read
      .parquet(SparkFixture.sf001 + "/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      Option(t).getOrElse("").toLowerCase.replaceAll("[^a-z]+", " ")
        .trim.split(" ").filter(_.nonEmpty)
        .foreach(w => vocab(w) = vocab.getOrElse(w, 0L) + 1L)
    }
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    vocab.foreach { case (w, c) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1))
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + c
      }
    }
    val expectTop = pairCnt.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head
    assert((table(0)._2, table(0)._3) == expectTop._1 &&
           table(0)._5 == expectTop._2,
      s"round-1 winner ${table(0)} != independent count $expectTop")
    // the LEARNED table applied like text_bpe compresses the corpus
    def applyMerges(text: String): (Long, Long) = {
      val norm = Option(text).getOrElse("")
        .toLowerCase.replaceAll("[^a-z]+", " ").trim
      val sym = norm.map(ch => s"|$ch|").mkString
      val merged = table.foldLeft(sym) { case (m, (_, a, b, _, _)) =>
        m.replace(s"|$a||$b|", s"|$a$b|") }
      (norm.count(_ != ' ').toLong,
       (merged.count(_ == '|') / 2 - merged.count(_ == ' ')).toLong)
    }
    val (chars, toks) = docs.map(applyMerges)
      .foldLeft((0L, 0L)) { case ((c, t), (c2, t2)) => (c + c2, t + t2) }
    assert(toks < chars,
      s"the learned merges must compress: $toks tokens / $chars chars")
  }
}
