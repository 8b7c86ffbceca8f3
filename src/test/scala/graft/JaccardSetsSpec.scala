package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JaccardSetsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("merge-count jaccard is bit-identical to the composed set-op form") {
    // Same pair population the dedup queries score: sorted distinct char
    // sets within (lang, n_chars) blocks of real documents.
    val cs = array_sort(array_distinct(split(col("text"), "")))
    val d = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"), cs.as("s"))
    val pairs = d.select(col("lang"), col("n_chars"),
                         col("doc_id").as("a_id"), col("s").as("a"))
      .join(d.select(col("lang").as("l2"), col("n_chars").as("n2"),
                     col("doc_id").as("b_id"), col("s").as("b")),
            col("lang") === col("l2") && col("n_chars") === col("n2") &&
              col("a_id") < col("b_id"))
    val diff = pairs
      .withColumn("composed",
        size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))))
      .withColumn("native", functions.JaccardSets.jac(spark, "a", "b"))
      .filter(col("composed") =!= col("native"))
      .count()
    assert(diff == 0, s"$diff pairs diverged between composed and native jaccard")
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val cs = array_sort(array_distinct(split(col("text"), "")))
    val plan = Tables.load(spark, sf, "documents")
      .select(cs.as("a"), cs.as("b"))
      .select(functions.JaccardSets.jac(spark, "a", "b").as("j"))
    val formatted = plan.queryExecution.executedPlan.toString
    assert(formatted.contains("WholeStageCodegen") ||
           formatted.contains("*(1)"),
           s"expected codegen span in plan:\n$formatted")
    // Self-jaccard is exactly 1.0 — and this evaluates doGenCode
    assert(plan.filter(col("j") === 1.0).count() ==
           Tables.load(spark, sf, "documents").count())
  }
}
