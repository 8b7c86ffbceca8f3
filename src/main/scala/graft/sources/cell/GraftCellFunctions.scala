package graft.sources.cell

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}

/** The connector's one V2 catalog function: `bucket(n, rowkey)` — the
  * hash that BUCKETED cell stores cluster on (HBase's salted-rowkey
  * prefix made a declared, queryable property instead of a naming
  * convention baked into the key).
  *
  * Why a CATALOG function and not a private helper: Spark's
  * storage-partitioned-join machinery identifies co-partitioned scans
  * by resolving each side's reported `bucket` transform through the
  * table's `FunctionCatalog` and comparing the bound functions'
  * `canonicalName` — two [[GraftCellScan]]s report compatible
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * exactly when both resolve HERE. The same resolution path evaluates
  * the function row-by-row inside the write's clustered shuffle
  * (`RequiresDistributionAndOrdering` over `bucket(n, rowkey)`), so the
  * write-side placement and the read-side partition key are the same
  * arithmetic by construction, not by convention.
  *
  * The hash itself is Scala's MurmurHash3 over the rowkey's UTF-8
  * bytes, floor-mod n — stable across JVMs, platforms and Spark
  * versions (a bucketed store outlives any single cluster; a rehash on
  * upgrade would silently break co-partitioning). NULL rowkeys land in
  * bucket 0 (deterministic, matches the writer). */
object GraftBucket {
  val SEED = 0x67726166 // "graf" — fixed: the store layout depends on it

  def of(rowkeyUtf8: Array[Byte], n: Int): Int =
    if (rowkeyUtf8 == null) 0
    else java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.bytesHash(rowkeyUtf8, SEED), n)

  /** File-name tag of a bucket-pure region file: `-b<id>of<n>` before
    * the extension. The tag carries BOTH the bucket id and the bucket
    * COUNT it was hashed against — a file adopted (bulkload) from a
    * store bucketed differently, or left over from a changed layout,
    * must never pass for co-partitioned: `b3of4` under an 8-bucket
    * descriptor reads as "not bucketed for this table", so the scan
    * falls back to unkeyed partitioning (a shuffle, never a wrong
    * join). Tags live in names, not manifest fields, so they travel
    * verbatim through manifests, snapshots, clone, export and
    * bulkload with zero codec changes. */
  def tag(id: Int, n: Int): String = s"-b${id}of$n"

  private val TagRe = raw"-b(\d+)of(\d+)\.parquet$$".r

  /** (bucketId, bucketCount) parsed from a region-file name, or None
    * for an untagged (unbucketed or rewritten) file. */
  def parse(path: String): Option[(Int, Int)] =
    TagRe.findFirstMatchIn(path).map(m => (m.group(1).toInt, m.group(2).toInt))
}

/** `graftcat.bucket(n, rowkey)` — the UnboundFunction the catalog
  * serves. Bind accepts exactly (int, string): the literal bucket
  * count Spark folds from the transform, and the rowkey column. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, rowkey) — graftcell store bucket id: " +
    "floorMod(murmur3(utf8(rowkey)), n); NULL rowkeys map to 0"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == StringType,
      s"graftcell bucket(n, rowkey) binds to (int, string); got " +
      inputType.simpleString)
    BoundBucket
  }

  object BoundBucket extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    // SPJ compares transforms by this: one arithmetic, one name
    override def canonicalName(): String = "graftcell.bucket(int,string)"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val key = if (input.isNullAt(1)) null
                else input.getUTF8String(1).getBytes
      GraftBucket.of(key, n)
    }
  }
}
