package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located, shuffle-free joins (SURVEY §2 /
  * the 100 TB mandate's "pre-partitioning/bucketing" path).
  *
  * At cluster scale the dominant cost of a fact⋈fact equi join is the
  * pairwise shuffle. Writing both tables bucketed (and sorted) by the
  * join key moves that shuffle to WRITE time, once; every subsequent join
  * on the key reads co-located buckets and plans a SortMergeJoin with NO
  * Exchange on either side (asserted in BucketedLayoutSpec). This is the
  * standard Spark answer to "reuse a partitioning across stages/jobs" —
  * bucket metadata lives in the catalog, so it survives sessions,
  * unlike `repartition()` which is per-plan.
  */
object BucketedLayout {

  /** Write `df` as a bucketed, sorted table. With `path` the table is
    * external at that location (independent of `spark.sql.warehouse.dir`
    * — the declared query path, whose harness sessions don't configure a
    * warehouse); without, a managed table in the warehouse. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Drop `table` from the catalog AND clear its directory: the in-memory
    * catalog dies with the JVM but table directories persist, and a
    * create-from-scratch over a stale location fails or double-counts. */
  def dropWithLocation(s: SparkSession, table: String, dir: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Co-locate two frames on their join keys with the same bucket count
    * (equal bucket counts + same key hash ⇒ bucket i joins bucket i). */
  def colocate(s: SparkSession, left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, buckets: Int,
      leftTable: String, rightTable: String): (DataFrame, DataFrame) = {
    writeBucketed(left, leftTable, leftKey, buckets)
    writeBucketed(right, rightTable, rightKey, buckets)
    (s.table(leftTable), s.table(rightTable))
  }
}
