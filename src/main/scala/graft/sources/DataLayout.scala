package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout maintenance — the ops a 100 TB lake runs continuously
  * even though no query references them:
  *
  *  - [[compact]]: small-file compaction. Streaming sinks and per-batch
  *    writes fragment a table into thousands of KB-sized files; scan
  *    cost then tracks file COUNT (open/footer/seek per file), not
  *    bytes. Compaction rewrites a directory into size-targeted files,
  *    range-clustered so per-file min/max stay selective.
  *  - [[writeZordered]]: multi-dimensional clustering. Range-sorting on
  *    ONE column makes parquet row-group min/max useless for every
  *    other predicate; interleaving the bits of two dimensions
  *    ([[zorderKey]]) gives a single sort key whose ranges stay tight
  *    in BOTH dimensions, so scans prune on either (the Z-ORDER of
  *    Delta/Iceberg, via plain deterministic bit arithmetic).
  *
  * Both write with `repartitionByRange`, whose sampling pass costs one
  * extra read of the sort keys — the standard price of range layout.
  * The z-key itself is oracle-checked (`zorder_key`): the SAME bit
  * formula is generated for Spark and DuckDB from one description, the
  * house dual-engine pattern.
  */
object DataLayout {

  /** Bits interleaved per dimension (16-bit z-key: fits an int and
    * gives 256 buckets per dimension — row-group-grained, not
    * row-grained, which is all min/max skipping can use anyway). */
  private val ZBits = 8

  /** Interleave the low [[ZBits]] bits of two non-negative dimensions:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Pure
    * integer arithmetic — no UDF, stays inside codegen. */
  def zorderKey(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** The identical formula as engine-portable SQL (DuckDB `>>`/`&` have
    * the same integer semantics), generated from the same loop so the
    * two engines cannot drift. */
  def zorderSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i + 1)} + (($b >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** Rewrite a parquet directory into ~`targetBytes` files, range-
    * clustered and internally sorted on `sortCols`. File count derives
    * from the INPUT's actual on-disk size — the only number that is
    * known without a second data pass. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      sortCols: Seq[String], targetBytes: Long = 128L << 20): Int = {
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val keys = sortCols.map(col)
    spark.read.parquet(inPath)
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Write `df` clustered on the z-interleave of two dimension columns:
    * range-partitioned AND sorted by the z-key, so every file's
    * (min, max) z-range is disjoint and parquet min/max skipping works
    * for predicates on EITHER dimension. The z-key column is dropped
    * from the output — it is layout, not data. */
  def writeZordered(df: DataFrame, path: String, files: Int,
      dimA: Column, dimB: Column): Unit =
    df.withColumn("__zkey", zorderKey(dimA, dimB))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
