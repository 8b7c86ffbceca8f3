package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("skewSafeSelfPairs: salted branch fires on a hot block and equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // One hot block (60 rows in a single (lang, n_chars) cell — far over
    // cap=10, so ONLY the salted triangle branch can produce its pairs),
    // one small block, and a singleton block (no pairs).
    val rows =
      (1L to 60L).map(i => ("xx", 100, i, Seq("a", "b", s"w${rnd.nextInt(5)}"))) ++
      (61L to 70L).map(i => ("yy", 50, i, Seq("c", s"w${rnd.nextInt(5)}"))) ++
      Seq(("zz", 7, 71L, Seq("d")))
    val d = rows.toDF("lang", "n_chars", "doc_id", "feat")
    val expect = (for {
      (la, na, a, _) <- rows; (lb, nb, b, _) <- rows
      if la == lb && na == nb && a < b
    } yield (a, b)).toSet
    val pairs = operators.DedupOps.skewSafeSelfPairs(d, cap = 10, k = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size, "a pair was emitted more than once")
    assert(pairs.toSet == expect,
           s"missing=${expect -- pairs.toSet} extra=${pairs.toSet -- expect}")
  }

  test("dedup_substring: any duplicated passage of length >= W is detected, " +
       "alignment-free; W-1 is not") {
    import spark.implicits._
    val W = operators.DedupOps.SUB_W
    val rnd = new scala.util.Random(42)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    // a shared passage of EXACTLY W chars at different offsets in two
    // otherwise-random docs, and a W-1 passage in two other docs
    val passW = "Z" + filler(W - 2) + "Z"
    val passW1 = "Y" + filler(W - 3) + "Y"
    val docs = Seq(
      (1L, filler(13) + passW + filler(150)),
      (2L, filler(27) + passW + filler(90)),
      (3L, filler(10) + passW1 + filler(150)),
      (4L, filler(22) + passW1 + filler(90)),
      (5L, filler(200))).toDF("doc_id", "t")
    val got = operators.DedupOps.substringDupStats(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) >= 1 && got(2L) >= 1,
           s"W-length passage must be detected in both copies: $got")
    assert(got(3L) == 0 && got(4L) == 0 && got(5L) == 0,
           s"passages shorter than W must not produce shared spans: $got")
  }

  test("dedup_substring_prune: removed_chars is exactly the interval UNION " +
       "of duplicated spans (full-copy and partial-passage cases)") {
    import spark.implicits._
    val W = operators.DedupOps.SUB_W
    val rnd = new scala.util.Random(77)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val pass = "X" + filler(58) + "X" // 60-char shared passage
    val whole = filler(120)           // doc 3 = doc 4 (full copies)
    val docs = Seq(
      (1L, filler(37) + pass + filler(140)),
      (2L, filler(11) + pass + filler(90)),
      (3L, whole), (4L, whole),
      (5L, filler(200))).toDF("doc_id", "t")
      .withColumn("text", col("t")).withColumn("n_chars", length(col("t")))
    // route through the contract pipeline shape: spans at every
    // position, dup = >= 2 docs, union via the lead() arithmetic
    val out = {
      val d = docs.select(col("doc_id"), col("t"))
      val sh = d.filter(length(col("t")) >= W)
        .select(col("doc_id"), length(col("t")).as("t_len"),
          posexplode(org.apache.spark.sql.functions.expr(
            s"transform(sequence(1, length(t) - ${W - 1})," +
            s" i -> substring(t, i, $W))")))
        .select(col("doc_id"), col("t_len"),
                (col("pos") + 1).as("i"), col("col").as("sh"))
      val nd = sh.groupBy("sh")
        .agg(countDistinct("doc_id").as("ndocs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      sh.join(nd, "sh").filter(col("ndocs") >= 2)
        .withColumn("seg",
          least(coalesce(lead(col("i"), 1).over(w) - col("i"), lit(W)),
                lit(W)))
        .groupBy("doc_id")
        .agg(sum("seg").as("removed"),
             max(col("t_len").cast("long")).as("t_len"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    }
    // partial passage: the union of its spans is exactly the passage
    assert(out(1L)._1 == 60L && out(2L)._1 == 60L,
      s"shared 60-char passage must remove exactly 60 chars: $out")
    // full copies: every char is inside a duplicated span
    assert(out(3L) == (120L, 120L) && out(4L) == (120L, 120L),
      s"a full copy must remove its whole length: $out")
    assert(!out.contains(5L), "the unique doc must have nothing to remove")
  }

  test("dedup_winnow: content-defined anchors detect passages >= W + 2(S-1) " +
       "at adversarial offsets; density shrinks vs full enumeration") {
    import spark.implicits._
    val W = operators.DedupOps.SUB_W
    val S = operators.DedupOps.SUB_S
    val rnd = new scala.util.Random(1234)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val guaranteed = "Q" + filler(W + 2 * (S - 1) - 2) + "Q"
    // offsets 13 and 27 differ mod S (S=8: 5 vs 3) — exactly the case
    // a fixed-stride sample misses; winnowing must not
    val docs = Seq(
      (1L, filler(13) + guaranteed + filler(160)),
      (2L, filler(27) + guaranteed + filler(120)),
      (3L, filler(250))).toDF("doc_id", "t")
    val win = operators.DedupOps.winnowDupStats(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = win.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 >= 1 && byId(2L)._3 >= 1,
           s"winnow missed an adversarially-offset duplicated passage: ${win.toSeq}")
    assert(byId(3L)._3 == 0, s"false positive on the random doc: ${win.toSeq}")
    // sampling density: winnow selects ~2/(S+1) of positions
    val full = operators.DedupOps.substringDupStats(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    win.foreach { case (id, nSpans, _) =>
      assert(nSpans < full(id) / 2,
        s"doc $id: winnow kept $nSpans of ${full(id)} spans — not a sample")
    }
  }

  test("dedup_winnow selection equals an independent JVM winnowing reference " +
       "on seeded random docs (argmin-per-window, position tie-break)") {
    import spark.implicits._
    val W = operators.DedupOps.SUB_W
    val S = operators.DedupOps.SUB_S
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    // reference: for every window of S consecutive positions, select
    // the argmin of (md5(span) ++ zero-padded position); n_spans =
    // distinct selections — the exact contract pipeline, re-derived
    def refCount(t: String): Int = {
      val n = t.length - W + 1
      val hps = (1 to n).map(i =>
        md5hex(t.substring(i - 1, i - 1 + W)) + f"$i%012d")
      (1 to n).map(k => hps.slice(k - 1, math.min(k - 1 + S, n)).min)
        .distinct.size
    }
    // docs WITH repeated content (halves repeat), so identical spans
    // inside one doc exercise the md5-tie → position tie-break path
    val rnd = new scala.util.Random(9001)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    val texts = (1L to 6L).map { id =>
      val half = filler(60 + rnd.nextInt(120))
      (id, if (id % 2 == 0) half + half else half + filler(80))
    }
    val got = operators.DedupOps.winnowDupStats(
        texts.toDF("doc_id", "t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == refCount(t).toLong,
        s"doc $id: winnow selected ${got(id)} spans, reference says " +
        s"${refCount(t)}")
    }
  }

  test("dedup_winnow flags a subset of dedup_substring's dup docs on the fixture " +
       "(winnowed spans are a subset of all spans)") {
    val winDup = SparkEntry.queries("dedup_winnow")(spark, sf)
      .filter(col("dup_spans") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val fullDup = SparkEntry.queries("dedup_substring")(spark, sf)
      .filter(col("dup_spans") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(winDup.nonEmpty, "fixture boilerplate class must be flagged")
    assert(winDup.subsetOf(fullDup),
           s"winnow flagged docs full enumeration did not: ${winDup -- fullDup}")
    // the boilerplate class is fully detected by BOTH (its 119-char
    // tail is far over the winnow guarantee length W + 2(S-1))
    val boiler = SparkFixture.spark.read
      .parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(boiler.subsetOf(winDup),
           s"boilerplate docs missed by winnow: ${boiler -- winDup}")
  }

  test("dedup_substring_hashed equals the raw-string pipeline row-for-row " +
       "(the xxhash64 shuffle narrowing changes bytes moved, never results)") {
    val raw = SparkEntry.queries("dedup_substring_prune")(spark, sf)
    val hashed = SparkEntry.queries("dedup_substring_hashed")(spark, sf)
    assert(raw.exceptAll(hashed).isEmpty && hashed.exceptAll(raw).isEmpty,
      "hashed-span mode must be result-equivalent at fixture scale")
  }

  test("dedup_substring_rewrite spends exactly the prune budget: " +
       "kept/removed match per doc, untouched docs pass verbatim, and " +
       "the excised boilerplate never survives") {
    val rw = SparkEntry.queries("dedup_substring_rewrite")(spark, sf)
      .cache()
    val pr = SparkEntry.queries("dedup_substring_prune")(spark, sf)
    // every flagged doc's excision frees exactly the computed budget
    val mismatched = rw.as("r").join(pr.as("p"), "doc_id")
      .filter(col("r.kept_chars") =!= col("p.kept_chars") ||
              col("r.removed_chars") =!= col("p.removed_chars"))
    assert(mismatched.isEmpty,
      "rewrite and prune must agree on every flagged doc's byte budget")
    // docs the prune does not flag pass through with zero removal
    assert(rw.join(pr, Seq("doc_id"), "left_anti")
             .filter(col("removed_chars") =!= 0L).isEmpty,
      "an unflagged doc must pass through verbatim")
    // the declared kept budget IS the cleaned text's length
    assert(rw.filter(length(col("cleaned")) =!= col("kept_chars")).isEmpty)
    // the fixture's duplicated class (the boilerplate tail) is excised
    // from every carrier — no cleaned doc still contains it
    assert(rw.filter(col("cleaned")
             .contains(operators.DedupOps.SUB_BOILER)).isEmpty,
      "the shared boilerplate must not survive the rewrite")
    rw.unpersist()
    ()
  }

  test("connectedComponents converges on a 30-node chain (diameter >> fixed-round reach)") {
    // A transitive chain 1~2~...~30 is the shape a fixed round count
    // silently splits; the fixpoint loop must label the whole chain with
    // its minimum. Isolated nodes stay their own canonical.
    import spark.implicits._
    val docs = (1L to 35L).toDF("doc_id")
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = operators.DedupOps.connectedComponents(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 30L).foreach(i => assert(got(i) == 1L, s"node $i -> ${got(i)}"))
    (31L to 35L).foreach(i => assert(got(i) == i, s"isolated $i -> ${got(i)}"))
  }

  test("connectedComponents equals a union-find reference on seeded random graphs") {
    // Off-fixture coverage for the pointer-jumping fixpoint: 5 seeded
    // random pair sets over varying node counts and densities (below
    // and above the percolation threshold, so both many-small- and
    // one-giant-component shapes occur), checked against a driver-side
    // union-find relabelled to per-component minima.
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 104729)
      val n = 20 + rnd.nextInt(60)
      val nPairs = rnd.nextInt(n)
      val pairs = Seq.fill(nPairs)(
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter(p => p._1 != p._2)
      val got = operators.DedupOps.connectedComponents(
          (1L to n.toLong).toDF("doc_id"), pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long](
        (1L to n.toLong).map(v => v -> v): _*)
      def find(v: Long): Long =
        if (parent(v) == v) v
        else { val r = find(parent(v)); parent(v) = r; r }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val want = (1L to n.toLong).groupBy(find).toSeq
        .flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }.toMap
      assert(got == want,
        s"seed=$seed n=$n pairs=${pairs.size}: first diff ${
          got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
            .find(p => p._1 != p._2)}")
    }
  }

  test("dedup_near result is invariant to the skew cap (fallback = plain path)") {
    // Same query shape with a cap of 0 (every block goes through the
    // salted branch) must produce byte-identical pairs to the shipped
    // cap=2000 version (which routes everything through the plain branch
    // at this SF) — the two branches are interchangeable by construction.
    val feat = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"),
              array_distinct(split(col("text"), "")).as("feat"))
    def pairs(cap: Int) =
      operators.DedupOps.skewSafeSelfPairs(feat, cap, k = 4)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(0) == pairs(2000))
  }
}
