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

  /** Stage-once bucketed layout: ensure `table` is registered in the
    * catalog over a bucketed layout at `path`, (re)writing the DATA only
    * if the layout has never been staged for the current inputs.
    *
    * This is the production semantics the scaladoc above promises:
    * bucketing is an INGEST-time cost, paid once per dataset — the
    * steady-state read path re-registers the external table over the
    * existing bucket files (DDL only, no data pass; Spark recovers
    * bucket ids from the file names) when the catalog died with a
    * previous JVM. Staleness is guarded two ways: the `_GRAFT_STAGED`
    * marker is written LAST (a killed mid-write stage is restaged, never
    * reused) and it records a fingerprint (name, length, modtime) of the
    * source files plus the bucket spec — any input regeneration or spec
    * change forces a rewrite. Delete the layout dir to re-pay the write.
    */
  def ensureBucketed(s: SparkSession, df: => DataFrame, table: String,
      key: String, buckets: Int, path: String,
      sources: Seq[String]): Unit = {
    val spec = s"$key|$buckets|${Staging.fingerprint(s, sources)}"
    val current = Staging.readMarker(s, path).collect {
      case txt if txt.indexOf('\n') >= 0 =>
        val i = txt.indexOf('\n')
        (txt.take(i), txt.drop(i + 1))
    }
    current match {
      case Some((sp, _)) if sp == spec &&
          s.catalog.tableExists(table) => // hot: catalog + layout valid
      case Some((sp, ddl)) if sp == spec =>
        // layout staged by an earlier session: register the external
        // bucketed table over it — catalog entry only, no data pass.
        s.sql(s"DROP TABLE IF EXISTS $table")
        s.sql(s"CREATE TABLE $table ($ddl) USING parquet " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
          s"LOCATION '$path'")
      case _ =>
        dropWithLocation(s, table, path)
        writeBucketed(df, table, key, buckets, Some(path))
        Staging.markStaged(s, path,
          spec + "\n" + s.table(table).schema.toDDL)
    }
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
