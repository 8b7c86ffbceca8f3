package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf001 = SparkFixture.sf001
  val sf01 = "/root/testdata/sf0.1" // exact dups exist only at sf0.1 (5000/4992)

  test("minhash LSH recalls every exact-duplicate pair (identical shingle sets)") {
    // Identical texts have identical MinHash signatures in every band, so
    // LSH must surface them — 100% recall on exact dups is the invariant.
    val docs = Tables.load(spark, sf01, "documents")
    val truth = docs.select(col("doc_id").as("id_a"), col("text"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("t2")),
            col("text") === col("t2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain exact duplicates at sf0.1")
    val candidates = SparkEntry.queries("dedup_minhash")(spark, sf01)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(candidates),
           s"LSH missed exact-dup pairs: ${truth -- candidates}")
  }

  test("sim_topk ranks are contiguous and cosine is non-increasing per probe") {
    val rows = SparkEntry.queries("sim_topk")(spark, sf001)
      .select("q_id", "rn", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.size).toSeq, s"probe $q")
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _           => true
      }, s"probe $q: cosine not non-increasing")
    }
  }

  test("dedup_exact is idempotent (SURVEY §5.3)") {
    val once = SparkEntry.queries("dedup_exact")(spark, sf001)
    assert(once.groupBy("h").count().filter(col("count") > 1).count() == 0)
  }
}
