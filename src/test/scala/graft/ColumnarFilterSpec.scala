package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cell.GraftCell

/** Gates the r20 FILTERED VECTORIZED read path: every residual scan
  * shape (pushed range/point/IN filters, filters on non-projected
  * columns, fuzzy patterns, pushed TABLESAMPLE, pushed LIMIT over a
  * filter, NULL columns) must decode `batched: true` and return
  * byte-identical rows to the exact row reader
  * (`spark.graft.cell.vectorized=false` — the kill switch that is also
  * the A/B lever). The residual predicate itself is shared code
  * ([[graft.sources.cell.CellResidual]]), so this suite is the decode
  * equivalence gate, not a semantics re-derivation. */
class ColumnarFilterSpec extends AnyFunSuite {
  private lazy val s = SparkFixture.spark

  private lazy val store: String = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Files
      .createTempDirectory("graft_colfilter_spec_").toString + "/store"
    val rows = (0 until 30000).map { i =>
      org.apache.spark.sql.Row(
        if (i % 97 == 0) null else f"k$i%06d",
        s"f${i % 3}",
        s"q${i % 7}",
        if (i % 89 == 0) null else java.lang.Long.valueOf((i % 1000).toLong),
        if (i % 83 == 0) null else f"v$i%06d")
    }
    s.createDataFrame(rows.asJava, GraftCell.SCHEMA)
      .write.format("graftcell").option("maxRowsPerFile", 4000)
      .mode("overwrite").save(path)
    path
  }

  private def ab(shape: => org.apache.spark.sql.DataFrame,
                 expectBatched: Boolean = true): Unit = {
    s.conf.set("spark.graft.cell.vectorized", "true")
    val vec = shape
    if (expectBatched)
      assert(vec.queryExecution.executedPlan.toString
               .contains("batched: true"),
        s"expected a vectorized scan:\n${vec.queryExecution.executedPlan}")
    val vecRows = vec.collect().map(_.toSeq).toSeq
    s.conf.set("spark.graft.cell.vectorized", "false")
    try {
      val rowRows = shape.collect().map(_.toSeq).toSeq
      assert(vecRows == rowRows,
        s"vectorized and row decode must agree " +
        s"(${vecRows.size} vs ${rowRows.size} rows)")
      assert(vecRows.nonEmpty, "a shape that matches nothing proves nothing")
    } finally s.conf.set("spark.graft.cell.vectorized", "true")
  }

  private def load() = s.read.format("graftcell").load(store)

  test("pushed rowkey range filter decodes vectorized and equals the " +
       "row reader") {
    ab(load().filter(col("rowkey") >= "k010000" && col("rowkey") < "k012000")
         .orderBy("rowkey", "qualifier"))
  }

  test("pushed IN multiget (incl. a filter column outside the projection)") {
    ab(load()
         .filter(col("rowkey").isin("k000006", "k001002", "k029997") &&
                 col("family") === "f0")
         .select("qualifier", "version", "value")
         .orderBy("qualifier", "version"))
  }

  test("value point filter with NULL rowkeys/versions/values in-stream") {
    ab(load().filter(col("value") === "v000167")
         .orderBy("rowkey", "qualifier"))
    // NULL-matching semantics: IsNull is an accepted pushed filter
    ab(load().filter(col("rowkey").isNull && col("value").isNotNull)
         .orderBy("value"))
  }

  test("fuzzy rowkey pattern decodes vectorized") {
    ab(s.read.format("graftcell").option("fuzzy", "k??77??")
         .load(store).orderBy("rowkey", "qualifier"))
  }

  test("pushed TABLESAMPLE composes with a pushed filter") {
    ab(load().sample(0.23, 42L).filter(col("family") === "f1")
         .orderBy("rowkey", "qualifier"))
  }

  test("pushed LIMIT over a filter counts survivors (deterministic " +
       "when matches < limit)") {
    // 'q3' cells of one narrow band: ~40 matches, limit far above —
    // both paths must return exactly the full match set
    ab(load().filter(col("rowkey") >= "k005000" &&
                     col("rowkey") < "k005300" &&
                     col("qualifier") === "q3")
         .limit(5000).orderBy("rowkey"))
    // and a HARD limit returns exactly k rows on both paths
    s.conf.set("spark.graft.cell.vectorized", "true")
    val kVec = load().filter(col("family") === "f2").limit(123).count()
    s.conf.set("spark.graft.cell.vectorized", "false")
    val kRow = load().filter(col("family") === "f2").limit(123).count()
    s.conf.set("spark.graft.cell.vectorized", "true")
    assert(kVec == 123L && kRow == 123L)
  }

  test("runtime rowkey filter (broadcast-join DPP path) decodes " +
       "vectorized and equals the row reader") {
    import scala.jdk.CollectionConverters._
    val dim = s.createDataFrame(
      Seq("k000014", "k000700", "k021000")
        .map(k => org.apache.spark.sql.Row(k)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
    def joined = load().join(broadcast(dim), col("rowkey") === col("k"))
      .select("rowkey", "family", "qualifier", "version", "value")
      .orderBy("rowkey", "qualifier")
    ab(joined)
  }
}
