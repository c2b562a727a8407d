package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's `bucket(numBuckets, col)` function — the partition
  * transform behind STORAGE-PARTITIONED JOINS on bucketed GraftTables.
  *
  * The bucket id is DEFINED as Spark's own shuffle assignment:
  * `pmod(murmur3_hash(key, seed=42) as int, numBuckets)` — exactly
  * `HashPartitioning.partitionIdExpression`. That identity is the whole
  * design: the write side buckets with a plain
  * `df.repartition(n, col(k))` (no custom partitioner, no extra
  * shuffle semantics), and because this function computes the same
  * number, Spark can also shuffle a NON-bucketed join side by it
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) and land rows in
  * the matching buckets.
  *
  * Both sides of a co-bucketed join resolve this same function through
  * [[GraftCatalog.loadFunction]], so
  * `KeyGroupedShuffleSpec.isCompatibleWith` sees one canonical name and
  * equal bucket counts → zero-Exchange joins.
  *
  * Reference analogue: Snowflake co-clusters transparently; the as-of
  * fact⋈fact join (`models/dwh/fact_order.sql:37-42`) is the shape
  * that stops paying a full shuffle at 100 TB. */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col…): shuffle-aligned murmur3 bucket id"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket expects (numBuckets, key…), got ${inputType.toDDL}")
    new GraftBoundBucket(inputType.fields.drop(1).map(_.dataType))
  }
}

private[graft] class GraftBoundBucket(keyTypes: Array[DataType])
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val keys = Array.tabulate[Any](keyTypes.length)(i =>
      if (input.isNullAt(i + 1)) null else input.get(i + 1, keyTypes(i)))
    GraftBoundBucket.bucketOf(keys, keyTypes, input.getInt(0))
  }
}

private[graft] object GraftBoundBucket {
  /** `pmod(murmur3(keys…), n)` with Spark's exact hash semantics: the
    * seed folds through the key columns as `Murmur3Hash(Seq(c1, c2, …))`
    * does — each step's 32-bit result seeds the next — and a NULL key
    * leaves the running seed untouched (exactly what `HashPartitioning`
    * does with a null expression value), so null rows land in — and
    * probe — the same bucket on every path. */
  def bucketOf(keys: Array[Any], dts: Array[DataType], n: Int): Int = {
    var h = 42
    var i = 0
    while (i < keys.length) {
      if (keys(i) != null) h = Murmur3HashFunction.hash(keys(i), dts(i), h.toLong).toInt
      i += 1
    }
    val m = h % n
    if (m < 0) m + n else m
  }
}
