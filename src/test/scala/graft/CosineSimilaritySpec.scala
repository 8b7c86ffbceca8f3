package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("custom codegen expression is bit-identical to the interpreted HOF twin") {
    val e = Tables.load(spark, sf, "embeddings")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(500)
    val diff = pairs
      .withColumn("hof", operators.Similarity.cosine(col("a"), col("b")))
      .withColumn("native", functions.CosineSimilarity.cos4(spark, "a", "b"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0, s"$diff pairs diverged between HOF and native cosine")
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val e = Tables.load(spark, sf, "embeddings")
    val plan = e.select(functions.CosineSimilarity.cos4(spark, "embedding",
                                                        "embedding").as("c"))
    val formatted = plan.queryExecution.executedPlan.toString
    assert(formatted.contains("WholeStageCodegen") ||
           formatted.contains("*(1)"),
           s"expected codegen span in plan:\n$formatted")
    // And it must actually evaluate (exercises doGenCode, not just eval)
    assert(plan.filter(col("c") > 0.99).count() > 0)
  }
}
