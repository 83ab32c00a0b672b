package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §0.2 and §2.
  *
  * `queries` is the operator inventory: one declared query per implemented
  * SURVEY §2 row; `oracleSql` carries the DuckDB twin for every
  * hash-matchable query (column names aliased identically on both sides —
  * the driver's compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shape pricing summary, SURVEY §7.1 slice 0)
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++
      AggQueries.queries ++
      JoinQueries.queries ++
      WindowQueries.queries ++
      ScalarQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      StreamQueries.queries ++
      TopKQueries.queries ++
      PivotQueries.queries ++
      SqlQueries.queries ++
      StatsQueries.queries ++
      CurateQueries.queries ++
      GraphQueries.queries ++
      TimeSeriesQueries.queries ++
      VersionQueries.queries ++
      FeatureQueries.queries ++
      AuditQueries.queries ++
      graft.sources.SourceQueries.queries ++
      graft.multimodal.MediaQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approximate / algorithm-specific
    * / streaming ops) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++
      AggQueries.oracle ++
      JoinQueries.oracle ++
      WindowQueries.oracle ++
      ScalarQueries.oracle ++
      TextQueries.oracle ++
      SimilarityQueries.oracle ++
      StreamQueries.oracle ++
      TopKQueries.oracle ++
      PivotQueries.oracle ++
      SqlQueries.oracle ++
      StatsQueries.oracle ++
      CurateQueries.oracle ++
      GraphQueries.oracle ++
      TimeSeriesQueries.oracle ++
      VersionQueries.oracle ++
      FeatureQueries.oracle ++
      AuditQueries.oracle ++
      graft.sources.SourceQueries.oracle ++
      graft.multimodal.MediaQueries.oracle
}
