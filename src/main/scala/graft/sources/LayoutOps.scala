package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the write path — the knobs that decide
  * whether a 100 TB table is scannable: file sizing (the small-files
  * problem) and multi-column locality (Z-order clustering for min/max
  * skipping).
  */
object LayoutOps {

  /** Morton (Z-order) curve value interleaving the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i, bit
    * i of `b` at 2i+1. Sorting by this column before writing clusters
    * rows so parquet row-group min/max statistics are tight on BOTH
    * dimensions — range predicates on either column skip row groups,
    * where a plain sort serves only its leading column.
    *
    * Pure Catalyst arithmetic (shifts, masks, adds) — constant-folded and
    * codegen'd; no UDF.
    */
  def zorder(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    // Widen to long BEFORE shifting: interleaved positions reach 2·bits−1,
    // which overflows into an INT's sign bit from bits=16 up.
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Z-order clustered layout: RANGE-partition by the curve value (each
    * output file covers a contiguous z range — that, not the in-file
    * sort, is what shrinks per-FILE min/max boxes) and sort within
    * partitions (tight row-group stats inside each file). */
  def zorderLayout(df: DataFrame, a: Column, b: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = zorder(a, b, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Rewrite a parquet directory into ~`targetBytes` files (the
    * compaction pass every streaming/incremental sink needs: thousands of
    * kilobyte files → a handful of scan-efficient ones). File count is
    * computed from the INPUT's on-disk size, so the pass is deterministic
    * for a given layout; round-robin repartition balances rows across
    * output files. Returns the output file count. */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    // Input sizing MUST go through the Hadoop FileSystem for the path's
    // own scheme: java.io.File silently returns null for hdfs://-/s3a://-
    // style URIs, which would make inputBytes 0 and rewrite the whole
    // directory into ONE file — the opposite of compaction, at exactly
    // the scale that needs it. listFiles(recursive) also picks up
    // hive-partitioned subdirectories.
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    var inputBytes = 0L
    // A nonexistent input routes through the same "no parquet data" error
    // as an empty one (listFiles on a missing path would instead surface a
    // raw FileNotFoundException).
    if (fs.exists(inPath)) {
      val it = fs.listFiles(inPath, /* recursive = */ true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet"))
          inputBytes += f.getLen
      }
    }
    require(inputBytes > 0,
      s"compact: no parquet data found under $inDir — refusing to guess " +
        "an output file count")
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    s.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
