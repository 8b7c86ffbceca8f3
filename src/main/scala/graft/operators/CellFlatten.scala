package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** The reference's core semantic, re-expressed Spark-first: recursively
  * flatten a (possibly nested) row into the HBase cell model
  * `(rowkey, family, qualifier, version, value)`.
  *
  * Capability derives from pythian/json2hbase's flatten-and-store design
  * (SURVEY.md §0/§1.1 — /root/reference is empty on this host, so the
  * semantics are the publicly-known ones: nested keys joined with ".",
  * array elements indexed `path[i]`, map entries keyed `path.key`, JSON
  * primitives serialized to byte values; here serialized to deterministic
  * strings so the DuckDB oracle can compare). The recursion is FULL:
  * arrays of structs flatten to `arr[i].leaf`, arrays of arrays to
  * `arr[i][j]`, maps of anything to `m.key...` — arbitrary depth, so any
  * JSON document shape the reference ingests lands as per-leaf cells.
  *
  * Spark-first design notes (100 TB scale):
  *  - The flatten is a pure per-row projection: one `explode` over an
  *    array-of-struct column built from the static schema. No shuffle,
  *    no UDF — everything stays inside whole-stage codegen, and the
  *    explode is pipelined with the parquet scan.
  *  - Collections are flattened with `transform(..., (x, i) -> ...)` /
  *    `map_entries`, nested ones recursively via per-element `concat` +
  *    one `flatten` — variable-length/depth values never leave the row.
  *  - Null leaves are dropped after the explode (HBase stores no nulls),
  *    mirroring the reference's skip-null behavior; a null COLLECTION
  *    contributes zero cells without erasing its siblings' cells.
  */
object CellFlatten {

  private val CELLS_T = "array<struct<qualifier:string,value:string>>"

  /** Deterministic string serialization per leaf type (SURVEY §1.1).
    * Floating point goes through DECIMAL(28,6) — both engines render the
    * decimal as a plain fixed-point string, unlike raw double→string which
    * differs in scientific-notation thresholds between JVM and DuckDB. */
  private def ser(c: Column, dt: DataType): Column = dt match {
    case StringType                       => c
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      c.cast("string")
    case FloatType | DoubleType           => c.cast(DecimalType(28, 6)).cast("string")
    case _: DecimalType                   => c.cast("string")
    case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp")).cast("string")
    case DateType                         => c.cast("string")
    case _                                => c.cast("string")
  }

  /** Fold sibling cell-arrays into one (concat keeps element order). */
  private def cat(cs: Seq[Column]): Column =
    if (cs.sizeIs == 1) cs.head else concat(cs: _*)

  /** A null collection must yield ZERO cells — `concat` with a null array
    * is null, which would erase every sibling cell of the row. */
  private def nz(c: Column): Column =
    coalesce(c, expr(s"CAST(array() AS $CELLS_T)"))

  private def nested(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _                                         => false
  }

  /** One array<struct<qualifier,value>> column per leaf subtree. `path`
    * is a Column so array indices / map keys can extend it per element;
    * for purely-struct paths it constant-folds back to a literal. */
  private def leafCells(c: Column, dt: DataType, path: Column): Seq[Column] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap(f =>
        leafCells(c.getField(f.name), f.dataType, concat(path, lit("." + f.name))))
    case ArrayType(et, _) =>
      val idx = (i: Column) => concat(path, lit("["), i.cast("string"), lit("]"))
      val cells =
        if (nested(et))
          F.flatten(transform(c, (x, i) => cat(leafCells(x, et, idx(i)))))
        else
          transform(c, (x, i) =>
            struct(idx(i).as("qualifier"), ser(x, et).as("value")))
      Seq(nz(cells))
    case MapType(_, vt, _) =>
      // map key → qualifier component: the natural HBase mapping (the
      // reference stores JSON object members as qualifiers, and a map IS
      // a dynamic-membership object).
      val entries = map_entries(c)
      val q = (e: Column) => concat(path, lit("."), e.getField("key").cast("string"))
      val cells =
        if (nested(vt))
          F.flatten(transform(entries, e =>
            cat(leafCells(e.getField("value"), vt, q(e)))))
        else
          transform(entries, e =>
            struct(q(e).as("qualifier"), ser(e.getField("value"), vt).as("value")))
      Seq(nz(cells))
    case other =>
      Seq(array(struct(path.as("qualifier"), ser(c, other).as("value"))))
  }

  /** Per-level checkpoint blocks of the LAST dynamic-flatten build per
    * (session, tag): the result DataFrame reads from these, so they can
    * only be unpersisted when the same tag is REBUILT (or its session
    * stops) — bounding storage to one build per live (session, tag)
    * without paying an extra result-sized checkpoint pass (advisor r8). */
  private val lastDynamic =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String), Seq[DataFrame]]

  /** DYNAMIC (schema-less) flatten — json2hbase's true input mode: the
    * document structure is unknown until runtime, so it arrives as one
    * Spark 4 VARIANT column and is flattened by runtime inspection to
    * ARBITRARY depth (matching the static `flatten` above, which needs a
    * schema). `docs` must have columns `(rowkey string, version long,
    * v variant)` with every root a container (object/array).
    *
    * Algorithm: iterative fixpoint over the frontier of still-nested
    * values. Each level is ONE `variant_explode` lateral generator —
    * object member extends the qualifier with `.key`, array element with
    * `[pos]`, leaves (schema_of_variant not OBJECT/ARRAY) are serialized
    * via `variant_get(..., 'string')` — and is `localCheckpoint`ed so the
    * level is decoded exactly once (it feeds both the leaf slice and the
    * next frontier) and so the loop's emptiness probe is O(1). The loop
    * terminates when no nested values remain: NO depth cap, NO JSON-text
    * fallback cells (a 64-level guard throws rather than truncating).
    *
    * Scale notes: every level is a shuffle-free generator over the
    * checkpointed store of the level above; the only shuffle is the
    * initial hash-spread of the parse-once variant store on rowkey. Depth
    * is a property of the DOCUMENT SCHEMA, not the data — real corpora
    * are < 10 levels — so the number of jobs is tiny and independent of
    * row count; each job is a full-width scan only of the shrinking
    * frontier (rows leave the frontier the level they become leaves).
    * The final union is checkpointed and all per-level intermediates are
    * unpersisted, so the residue of one build is one result-sized store. */
  def flattenVariant(docs: DataFrame, family: String, tag: String): DataFrame = {
    val s = docs.sparkSession
    // drop entries of stopped sessions (their blocks are already gone)
    lastDynamic.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
    val isContainer =
      schema_of_variant(col("v")).like("OBJECT%") ||
      schema_of_variant(col("v")).like("ARRAY%")
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = docs
      .select(col("rowkey"), col("version"), lit("").as("q"), col("v"))
      .repartition(col("rowkey")).localCheckpoint()
    intermediates += frontier
    val leafSlices = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var depth = 0
    while (!frontier.isEmpty && depth < 64) {
      depth += 1
      // One lazy explode per level. Only the CONTAINER frontier is
      // checkpointed — it shrinks every level and is what the loop
      // probes and the next level scans; the (bulky) leaf mass is never
      // materialized, it streams from the checkpointed parent frontier
      // straight into the final union (the explode runs twice per
      // level — once into the next frontier, once under the leaf
      // slice — but always reading the parent checkpoint, so total
      // work stays linear in depth).
      val exploded = frontier
        .lateralJoin(s.tvf.variant_explode(col("v").outer()))
        .select(col("rowkey"), col("version"),
          when(col("key").isNotNull,
               concat(col("q"),
                      when(col("q") === lit(""), lit("")).otherwise(lit(".")),
                      col("key")))
            .otherwise(concat(col("q"), lit("["),
                              col("pos").cast("string"), lit("]"))).as("q"),
          col("value").as("v"))
      leafSlices += exploded.filter(!isContainer)
        .select(col("rowkey"), col("version"), col("q"),
                variant_get(col("v"), "$", "string").as("value"))
      frontier = exploded.filter(isContainer).localCheckpoint()
      intermediates += frontier
    }
    if (!frontier.isEmpty)
      throw new IllegalStateException(
        s"flattenVariant: document nesting exceeds 64 levels (tag=$tag)")
    lastDynamic.put((s, tag), intermediates.toSeq)
      .foreach(_.foreach(_.unpersist()))
    if (leafSlices.isEmpty)
      return docs.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType.fromDDL(
          "rowkey STRING, family STRING, qualifier STRING, version BIGINT, value STRING"))
    leafSlices.reduceLeft(_ unionByName _)
      .select(col("rowkey"), lit(family).as("family"),
              col("q").as("qualifier"), col("version"), col("value"))
      .filter(col("value").isNotNull) // JSON null leaf → no cell (HBase semantics)
  }

  /** Flatten `df` into cells. `rowkey` must be unique per input row;
    * `version` is the HBase cell timestamp. Columns used for rowkey or
    * version can be excluded from the payload via `exclude`. */
  def flatten(df: DataFrame, rowkey: Column, family: String, version: Column,
              exclude: Set[String] = Set.empty): DataFrame = {
    val payload = df.schema.fields.filterNot(f => exclude(f.name))
    val pieces = payload.toSeq.flatMap { f =>
      leafCells(col(f.name), f.dataType, lit(f.name))
    }
    val cellsCol = pieces.reduceLeft(concat(_, _))
    df.select(rowkey.cast("string").as("rowkey"), version.as("version"),
              explode(cellsCol).as("cell"))
      .select(col("rowkey"), lit(family).as("family"),
              col("cell.qualifier").as("qualifier"), col("version"),
              col("cell.value").as("value"))
      .filter(col("value").isNotNull)
  }
}
