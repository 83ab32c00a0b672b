package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking (SURVEY §2.5/§2.6): the two-phase rank
  * that replaces single-partition `ORDER BY`-the-world windows.
  *
  * An unpartitioned window (`ntile`/`row_number` with no PARTITION BY)
  * requires `AllTuples` — Spark moves EVERY row to one task and sorts
  * there. Fine on a dimension-sized frame; a serial bottleneck the
  * moment the input scales with the corpus (the round-7 verdict's three
  * `ntile` flags). The classic distributed fix, as used by every
  * external-sort engine:
  *
  *   1. range-repartition on the rank order (each partition holds a
  *      contiguous key range, partitions ordered by id) and sort WITHIN
  *      partitions — an all-to-all exchange, but P parallel sorts of
  *      n/P rows instead of one sort of n;
  *   2. count rows per partition (tiny frame, ≤
  *      `spark.sql.shuffle.partitions` rows — bounded by config, not by
  *      data) and prefix-sum those counts into per-partition rank
  *      offsets;
  *   3. broadcast the offsets back: global rank = partition offset +
  *      local position + 1.
  *
  * Local positions ride `monotonically_increasing_id`'s bit layout
  * (partition id in the upper 31 bits, intra-partition record index in
  * the lower 33) — assigned ABOVE the within-partition sort, and the
  * expression's nondeterminism marker keeps Catalyst from reordering it
  * below. The result is exactly the rank the single-partition window
  * would emit whenever the ordering is a TOTAL order (callers pass a
  * unique tiebreak key — same contract the oracle SQL declares), so
  * DuckDB twins keep their plain `ntile()/row_number()` and still
  * hash-match: the two-phase plan changes the execution shape, not one
  * output value. */
object RankOps {

  /** `a div b` for non-negative longs as a Catalyst `IntegralDivide` —
    * exact integer division (a Column-API `/` would detour through
    * IEEE doubles). */
  private def idiv(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))

  /** Shared phase-1 prologue of every two-phase operator here: fail
    * fast on working-column collisions, range-repartition on the total
    * order, sort within partitions, stamp `__g_mid`
    * (`monotonically_increasing_id`: partition id in the upper 31 bits,
    * intra-partition record index in the lower 33 — assigned ABOVE the
    * within-partition sort; the expression's nondeterminism marker
    * keeps Catalyst from reordering it below), and materialize ONCE.
    *
    * The localCheckpoint is load-bearing, not a cache hint: the counts/
    * sums census and the main path must observe the SAME partitioning
    * and the same mid assignment. Left lazy, the two consumers are
    * separately column-pruned subtrees whose range exchanges no longer
    * canonicalize equal — no reuse, two independent boundary samplings
    * (RangePartitioner seeds by RDD id), and the offsets of one
    * partitioning get applied to the other's partition ids (measured:
    * 648/15000 wrong quartiles under Verify's coalesce(1) write).
    *
    * Returns the materialized frame plus the (pid, localIdx) column
    * pair derived from `__g_mid`. */
  private def rangeSortedWithMid(df: DataFrame, caller: String,
      outCols: Seq[String], sortCols: Seq[Column])
      : (DataFrame, Column, Column) = {
    val taken = Seq("__g_mid", "__g_pid", "__g_off", "__g_min",
      "__g_run", "__g_l") ++ outCols
    val clash = df.columns.intersect(taken)
    require(clash.isEmpty && outCols.distinct.size == outCols.size,
      s"$caller: column name collision on ${clash.mkString(",")} " +
        s"(input may not contain ${taken.mkString("/")}, and output " +
        "column names must be distinct)")
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt.max(1)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__g_mid", monotonically_increasing_id())
      .localCheckpoint()
    (sorted, shiftright(col("__g_mid"), 33),
      col("__g_mid").bitwiseAND(lit((1L << 33) - 1)))
  }

  /** Appends `rankCol` (1-based global rank under `order`, which MUST
    * be a total order) and `totalCol` (the global row count) via the
    * two-phase rank above. One range exchange over the data plus one
    * tiny counts aggregate; no single-partition stage anywhere. */
  def withGlobalRank(df: DataFrame, rankCol: String, totalCol: String,
      order: Column*): DataFrame = {
    val (sorted, pid, localIdx) = rangeSortedWithMid(df,
      "withGlobalRank", Seq(rankCol, totalCol), order)
    // Per-partition counts: ≤ `parts` rows by construction, so the
    // prefix-sum window below is bounded-input (PlanShapeSpec's
    // unpartitioned-window sweep verifies non-growth, not absence).
    val offs = sorted.groupBy(pid.as("__g_pid"))
      .agg(count(lit(1)).as("__g_cnt"))
      .select(col("__g_pid"),
        (sum("__g_cnt").over(Window.orderBy("__g_pid"))
          - col("__g_cnt")).as("__g_off"),
        sum("__g_cnt").over(Window.partitionBy()).as(totalCol))
    // Range partitions are assigned ascending key ranges in ascending
    // partition-id order, so offset(pid) counts exactly the rows
    // ordered strictly before this partition.
    sorted.withColumn("__g_pid", pid)
      .join(broadcast(offs), Seq("__g_pid"))
      .withColumn(rankCol, localIdx + col("__g_off") + lit(1L))
      .drop("__g_pid", "__g_mid", "__g_off")
  }

  /** Two-phase rank WITHIN each value of a small key column — N
    * independent global rankings for the price of ONE range exchange +
    * ONE checkpoint + ONE counts pass (q_search_rrf's round-10 trim:
    * its two corpus-scaled rank lists each paid the full
    * [[withGlobalRank]] materialization; unioned under a `src` tag they
    * pay it once).
    *
    * Identical phase structure: range-repartition on (key, order…) —
    * each partition holds a contiguous slice of the composite order, so
    * a key's rows span a contiguous partition run — then per-(partition,
    * key) counts/min-local-index (≤ parts × |keys| rows, bounded),
    * per-key prefix-sum offsets, broadcast back. Rank of a row = rows of
    * its key strictly before its partition + its position within the
    * key's run inside the partition. Equals the per-key window
    * `row_number` whenever (order…) is a total order within each key —
    * PropertySpec pins the law. */
  def withKeyedRank(df: DataFrame, keyCol: String, rankCol: String,
      order: Column*): DataFrame = {
    val (sorted, pid, localIdx) = rangeSortedWithMid(df,
      "withKeyedRank", Seq(rankCol), col(keyCol) +: order)
    // Per-(partition, key): row count and the key-run's first local
    // index. Offsets: rows of the same key in strictly-earlier
    // partitions (range partitions are assigned ascending (key, order)
    // slices in ascending pid order).
    val offs = sorted
      .groupBy(pid.as("__g_pid"), col(keyCol))
      .agg(count(lit(1)).as("__g_cnt"), min(localIdx).as("__g_min"))
      .select(col("__g_pid"), col(keyCol),
        (sum("__g_cnt").over(Window.partitionBy(keyCol)
          .orderBy("__g_pid")) - col("__g_cnt")).as("__g_off"),
        col("__g_min"))
    sorted.withColumn("__g_pid", pid)
      .join(broadcast(offs), Seq("__g_pid", keyCol))
      .withColumn(rankCol,
        localIdx - col("__g_min") + col("__g_off") + lit(1L))
      .drop("__g_pid", "__g_mid", "__g_off", "__g_min")
  }

  /** Two-phase per-key PREFIX SUM: appends `cumCol` (running total of
    * `valCol` in the (key, order…) total order, inclusive of the
    * current row, within each key) and `totalCol` (the key's grand
    * total) — the VOLUME analogue of [[withKeyedRank]], built for
    * q_select_head's round-11 swap: its per-lang cumulative-mass window
    * concentrated each language's entire corpus slice in ONE task (at
    * 100 TB a language is terabytes; `PARTITION BY lang` serializes
    * it).
    *
    * Phases: range-repartition on (key, order…) + sort within — P
    * parallel sorts of n/P rows, a key's rows spanning a contiguous
    * partition run; per-(partition, key) sums (≤ parts × |keys| rows,
    * bounded by config, not data) prefix-summed into per-key partition
    * offsets and key totals; the intra-partition running sum rides a
    * window partitioned by (partition, key) — its biggest partition is
    * capped at one range partition (~n/P rows; the composite order is
    * total, so the range partitioner splits freely), never a key's full
    * slice. cum = partition offset + intra-partition running sum.
    * Equals the per-key running-sum window whenever (order…) is a total
    * order within each key — PropertySpec pins the law; exact for
    * integral `valCol` (the sums never leave BIGINT).
    *
    * PRECONDITION: `valCol` must be non-null on every row. SQL `sum`
    * skips NULLs, but a key run whose leading rows in some partition
    * are all NULL makes the intra-partition running sum NULL where the
    * reference window would carry the prior partitions' total forward —
    * the equivalence law above silently breaks (round-11 review
    * finding). Callers today feed non-null counts/lengths; a nullable
    * caller must pre-coalesce with whatever zero means for it. */
  def withKeyedPrefixSum(df: DataFrame, keyCol: String, valCol: String,
      cumCol: String, totalCol: String, order: Column*): DataFrame = {
    val (sorted, pid, _) = rangeSortedWithMid(df,
      "withKeyedPrefixSum", Seq(cumCol, totalCol), col(keyCol) +: order)
    // Per-(partition, key) sums — the bounded census both the offsets
    // and the key totals derive from.
    val psums = sorted.groupBy(pid.as("__g_pid"), col(keyCol))
      .agg(sum(col(valCol)).as("__g_s"))
    val offs = psums.select(col("__g_pid"), col(keyCol),
      (sum("__g_s").over(Window.partitionBy(keyCol).orderBy("__g_pid"))
        - col("__g_s")).as("__g_off"),
      sum("__g_s").over(Window.partitionBy(keyCol)).as(totalCol))
    // Intra-partition running sum: ordered by the sort-time record
    // index, partition-capped by the range exchange above.
    val run = Window.partitionBy(col("__g_pid"), col(keyCol))
      .orderBy(col("__g_mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.withColumn("__g_pid", pid)
      .withColumn("__g_run", sum(col(valCol)).over(run))
      .join(broadcast(offs), Seq("__g_pid", keyCol))
      .withColumn(cumCol, col("__g_run") + col("__g_off"))
      .drop("__g_pid", "__g_mid", "__g_off", "__g_run")
  }

  /** SQL-standard `ntile(k)` from a 1-based global rank and total count
    * n, in pure integer arithmetic: the first n mod k buckets take
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋ — bit-identical to the window function
    * on a total order in every engine. Returns BIGINT; callers cast to
    * INT where the declared schema says so. */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val base = idiv(total, kL)          // ⌊n/k⌋
    val rem = total % kL                // buckets that take base+1 rows
    val bigSpan = rem * (base + lit(1L)) // rows living in the big buckets
    // n < k ⇒ base = 0 and every rank sits in a big bucket — the small
    // branch is untaken, but ANSI throws on its div-0 anyway
    // (subexpression elimination hoists divisions out of CASE arms — the
    // q_ab_test safeDen discipline), so floor the dead denominator to 1.
    val baseSafe = greatest(base, lit(1L))
    when(rank <= bigSpan, idiv(rank - 1, base + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(rank - lit(1L) - bigSpan, baseSafe) + lit(1L))
  }
}
