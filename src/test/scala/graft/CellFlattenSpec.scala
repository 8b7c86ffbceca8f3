package graft

import graft.operators.CellFlatten
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CellFlattenSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("flatten: nested struct → dotted qualifiers, arrays → indexed") {
    val df = Seq(
      (1L, "a", Some(2.5), Seq(1.0f, 2.0f), (7, "x")),
      (2L, "b", None, Seq(3.0f), (8, "y")),
    ).toDF("id", "s", "d", "arr", "nested")
    val cells = CellFlatten.flatten(df, col("id"), "f", lit(100L),
                                    exclude = Set("id"))
    val got = cells.orderBy("rowkey", "qualifier")
      .select("rowkey", "qualifier", "value").as[(String, String, String)]
      .collect().toSeq
    assert(got.contains(("1", "s", "a")))
    assert(got.contains(("1", "d", "2.500000")))
    assert(got.contains(("1", "arr[0]", "1.000000")))
    assert(got.contains(("1", "arr[1]", "2.000000")))
    assert(got.contains(("1", "nested._1", "7")))
    assert(got.contains(("1", "nested._2", "x")))
    // null leaf dropped (HBase stores no nulls)
    assert(!got.exists { case (r, q, _) => r == "2" && q == "d" })
    assert(got.count(_._1 == "2") == 4)
    assert(cells.columns.toSeq ==
      Seq("rowkey", "family", "qualifier", "version", "value"))
  }

  test("entry smoke: flagship query returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getLong(2) > 0)) // n_cells
  }

  test("flatten is shuffle-free (scale: pure per-row projection)") {
    val df = Tables.load(spark, SparkFixture.sf001, "embeddings")
    val cells = CellFlatten.flatten(df, col("vec_id"), "e", lit(0L),
                                    exclude = Set("vec_id"))
    val plan = cells.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
