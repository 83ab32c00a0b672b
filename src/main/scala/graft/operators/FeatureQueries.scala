package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Feature-engineering / model-evaluation / private-release surface
  * (SURVEY §2.8): the tabular-ML prep steps between a curated corpus and
  * a training run — categorical encoding, probability-calibration audit,
  * curriculum sequencing, and differentially-private publication.
  *
  * Extension surface — the reference computes nothing (SURVEY §0.1);
  * these rows are the BASELINE.json training-data-pipeline mandate.
  *
  * Cross-engine float discipline (the repo invariant): every statistic
  * derives from EXACT integer sums (cents, basis points, counts); the
  * double arithmetic on top is the SAME expression tree in the Spark
  * code and the DuckDB twin, rounded once at the end. The calibration
  * scorer deliberately uses the libm-free rational squash
  * p = (x/(1+|x|)+1)/2 — correctly-rounded IEEE ops only, so even the
  * BINNING is bit-identical across engines (an `exp`-based sigmoid
  * could flip a boundary row between bins). The one libm use (`ln` in
  * the Laplace inverse CDF) is absorbed by the 4dp rounding barrier,
  * the `q_dq_drift_psi` precedent.
  */
object FeatureQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_feature_target_encode" -> featureTargetEncode _,
    "q_feature_onehot"        -> featureOnehot _,
    "q_eval_calibration"      -> evalCalibration _,
    "q_curriculum_order"      -> curriculumOrder _,
    "q_dp_laplace"            -> dpLaplace _
  )

  val oracle: Map[String, String] = Map(
    // Cell sums exact BIGINT cents; the global prior is one scalar agg;
    // encode = (sum + m·prior)/(n + m) as one exact-rational tree.
    "q_feature_target_encode" ->
      """WITH cells AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
        |      AS BIGINT) AS sum_cents
        |  FROM customer GROUP BY 1, 2),
        |g AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS gn,
        |    CAST(sum(sum_cents) AS BIGINT) AS gsum
        |  FROM cells)
        |SELECT c_nationkey, c_mktsegment, n,
        |  round(CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |    AS mean_cents,
        |  round((CAST(sum_cents AS DOUBLE)
        |      + 10.0 * (CAST(gsum AS DOUBLE) / CAST(gn AS DOUBLE)))
        |    / CAST(n + 10 AS DOUBLE), 4) AS enc_cents
        |FROM cells, g
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // Indicators are scan-stage CASEs over the DECLARED vocabulary;
    // the frequency encode is an exact rational over the ≤5-row
    // segment-count frame, rounded 6.
    "q_feature_onehot" ->
      """WITH freq AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(count(*)) OVER () AS BIGINT) AS tot
        |  FROM customer GROUP BY 1)
        |SELECT c.c_custkey,
        |  CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
        |    AS is_automobile,
        |  CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |    AS is_building,
        |  CASE WHEN c.c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END
        |    AS is_furniture,
        |  CASE WHEN c.c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END
        |    AS is_household,
        |  CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END
        |    AS is_machinery,
        |  CASE WHEN c.c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
        |    'FURNITURE', 'HOUSEHOLD', 'MACHINERY') THEN 1 ELSE 0 END
        |    AS is_other,
        |  round(CAST(f.n AS DOUBLE) / CAST(f.tot AS DOUBLE), 6)
        |    AS seg_freq
        |FROM customer c JOIN freq f ON f.c_mktsegment = c.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin,
    // The libm-free squash makes p bit-identical, so bin membership and
    // the basis-point floor are EXACT on both engines; per-bin sums are
    // integers and every emitted rate is an exact-rational round 6.
    "q_eval_calibration" ->
      """WITH scored AS (
        |  SELECT (CAST(embedding[1] AS DOUBLE)
        |      / (1.0 + abs(CAST(embedding[1] AS DOUBLE))) + 1.0) / 2.0
        |      AS p,
        |    CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |binned AS (
        |  SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
        |    CAST(floor(p * 10000) AS BIGINT) AS p_bp, y
        |  FROM scored),
        |b AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p_bp) AS BIGINT) AS sum_bp
        |  FROM binned GROUP BY bin)
        |SELECT bin, n, n_pos,
        |  round(CAST(sum_bp AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0), 6)
        |    AS mean_pred,
        |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  round(abs(CAST(sum_bp AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)
        |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap
        |FROM b ORDER BY bin""".stripMargin,
    // Same stage thresholds, md5 shuffle, stage-local rank + offset
    // arithmetic; the (stage, md5, doc_id) order is total.
    "q_curriculum_order" ->
      """WITH staged AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN n_chars < 150 THEN 1
        |         WHEN n_chars < 300 THEN 2 ELSE 3 END AS stage,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, n_chars, stage,
        |    CAST(row_number() OVER (PARTITION BY stage
        |      ORDER BY h, doc_id) AS BIGINT) AS rk
        |  FROM staged),
        |offs AS (
        |  SELECT stage, CAST(sum(count(*)) OVER (ORDER BY stage
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT) AS off
        |  FROM ranked GROUP BY stage)
        |SELECT ranked.rk + coalesce(offs.off, 0) AS pos,
        |  ranked.doc_id, ranked.stage, ranked.n_chars
        |FROM ranked JOIN offs ON offs.stage = ranked.stage
        |WHERE ranked.rk + coalesce(offs.off, 0) <= 100
        |ORDER BY pos""".stripMargin,
    // md5-uniform → Laplace inverse CDF; the one ln is inside the 4dp
    // rounding barrier; the u=1/2 singularity folds to zero noise via
    // the same CASE on both engines.
    "q_dp_laplace" ->
      """WITH cnt AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1),
        |u AS (
        |  SELECT c_nationkey, n,
        |    CAST(CAST(('0x' || substr(md5(c_nationkey::VARCHAR), 1, 8))
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 - 0.5 AS v
        |  FROM cnt)
        |SELECT c_nationkey, n,
        |  round(CASE WHEN v = 0.0 THEN 0.0
        |    ELSE -sign(v) * ln(1.0 - 2.0 * abs(v)) END, 4) AS noise,
        |  round(CAST(n AS DOUBLE) + (CASE WHEN v = 0.0 THEN 0.0
        |    ELSE -sign(v) * ln(1.0 - 2.0 * abs(v)) END), 4) AS released
        |FROM u ORDER BY c_nationkey""".stripMargin
  )

  /** Smoothed target (mean) encoding of the (nation × segment)
    * categorical cross against account balance — the
    * high-cardinality-categorical workhorse of tabular-ML prep: one-hot
    * explodes at 10⁵ categories, target encoding compresses each to one
    * informative number, and the additive-smoothing prior
    * (n·x̄ + m·global)/(n+m) with m=10 stops small cells from
    * memorizing noise.
    *
    * Scale: ONE keyed agg reduces the table to the cell frame (bounded
    * by the category domain); the global prior is a 1-row scalar agg
    * broadcast to it (PlanGuard-allowlisted cross). Cell sums are exact
    * BIGINT cents, the encode one exact-operand rational tree rounded
    * 4 — identical on both engines. */
  def featureTargetEncode(s: SparkSession, d: String): DataFrame = {
    val cells = customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val g = cells.agg(sum("n").as("gn"), sum("sum_cents").as("gsum"))
    cells.crossJoin(broadcast(g))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        round(col("sum_cents").cast("double") / col("n").cast("double"), 4)
          .as("mean_cents"),
        round((col("sum_cents").cast("double")
            + lit(10.0) * (col("gsum").cast("double")
              / col("gn").cast("double")))
          / (col("n") + 10).cast("double"), 4).as("enc_cents"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Fixed-vocabulary one-hot encoding of the market segment, plus an
    * exact-rational global frequency encode — the feature-matrix emit
    * step after `q_feature_target_encode`'s compression chooses which
    * categoricals stay wide. The vocabulary is DECLARED (the five known
    * segments): an unseen value fails loudly into `is_other` instead of
    * silently widening the schema.
    *
    * Scale: every indicator is a scan-stage CASE (codegen'd, zero
    * shuffle); the frequency join is a ≤5-row broadcast. */
  def featureOnehot(s: SparkSession, d: String): DataFrame = {
    val vocab =
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val freq = customer(s, d).groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(Window.partitionBy()))
    val ind = vocab.map { v =>
      when(col("c_mktsegment") === v, 1).otherwise(0)
        .as(s"is_${v.toLowerCase}")
    } :+ when(!col("c_mktsegment").isin(vocab: _*), 1).otherwise(0)
      .as("is_other")
    customer(s, d)
      .join(broadcast(freq), Seq("c_mktsegment"))
      .select(col("c_custkey") +: ind :+
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("seg_freq"): _*)
      .orderBy("c_custkey")
  }

  /** Calibration / reliability audit of a probability scorer (10-bin
    * ECE decomposition): per predicted-probability bin, the event rate
    * vs the mean prediction — the "is 0.8 actually 80%?" audit that
    * closes the eval family (`q_eval_confusion` = classification,
    * `q_eval_auc` = ranking separation, `q_eval_ndcg` = retrieval,
    * THIS = probability truthfulness).
    *
    * Determinism: the scorer is the libm-free rational squash
    * p = (x/(1+|x|)+1)/2 over embedding dim 1 — correctly-rounded IEEE
    * ops only, so p, the bin index, AND the basis-point floor are
    * bit-identical across engines (an exp-sigmoid could flip a
    * boundary row). Per-bin sums are exact integers; every emitted
    * rate is an exact-rational round 6. Scale: ONE map-side-combined
    * agg collapses the corpus to the 10-bin frame. */
  def evalCalibration(s: SparkSession, d: String): DataFrame = {
    val x = element_at(col("embedding"), 1).cast("double")
    val p = (x / (lit(1.0) + abs(x)) + lit(1.0)) / lit(2.0)
    val b = embeddings(s, d)
      .select(least(floor(p * 10), lit(9.0)).cast("long").as("bin"),
        floor(p * 10000).cast("long").as("p_bp"),
        when(col("label") % 2 === 1, 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p_bp").as("sum_bp"))
    val meanPred = col("sum_bp").cast("double") /
      (col("n").cast("double") * lit(10000.0))
    val rate = col("n_pos").cast("double") / col("n").cast("double")
    b.select(col("bin"), col("n"), col("n_pos"),
        round(meanPred, 6).as("mean_pred"),
        round(rate, 6).as("rate"),
        round(abs(meanPred - rate), 6).as("gap"))
      .orderBy("bin")
  }

  /** Deterministic curriculum scheduler: documents staged easy→hard by
    * declared length thresholds, hash-shuffled WITHIN each stage by md5
    * (the `q_domain_cap` unbiased stable shuffle — kills crawl-order
    * correlation inside a stage), global training position = stage
    * offset + within-stage rank, audited to the first 100 positions.
    * The consumption-ORDER twin of `q_interleave_mix` (languages
    * round-robin there; difficulty stages sequenced here).
    *
    * Scale: ranks are STAGE-LOCAL windows (never one global sort of
    * the corpus); the offsets that globalize them come from the 3-row
    * stage-count frame. Stage-partitioned windows concentrate a stage
    * per partition — the `q_interleave_mix` class; range-partitioned
    * sort-within is the 100 TB refinement. */
  def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    val staged = documents(s, d).select(
      col("doc_id"), col("n_chars"),
      when(col("n_chars") < 150, 1)
        .when(col("n_chars") < 300, 2).otherwise(3).as("stage"),
      md5(col("doc_id").cast("string").cast("binary")).as("h"))
    val ranked = staged.withColumn("rk",
      row_number().over(Window.partitionBy("stage")
        .orderBy("h", "doc_id")).cast("long"))
    val offs = ranked.groupBy("stage").agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum("cnt").over(Window.orderBy("stage")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stage"), col("off"))
    ranked.join(broadcast(offs), Seq("stage"))
      .select((col("rk") + col("off")).as("pos"), col("doc_id"),
        col("stage"), col("n_chars"))
      .filter(col("pos") <= 100)
      .orderBy("pos")
  }

  /** Differentially-private release of per-nation customer counts
    * (ε=1 Laplace mechanism) WITHOUT an RNG: the uniform draw is the
    * md5 of the nation key — identical hex on every engine, cluster
    * layout, and retry (`q_agg_bootstrap_ci`'s reproducibility argument
    * applied to DP; seeded RNG state is partition-order-dependent) —
    * inverse-CDF'd to Laplace noise and added to the EXACT count. True
    * counts stay alongside for the audit; a production release would
    * drop them. The publication step after the `q_dq_kanon` /
    * `q_dq_ldiversity` / `q_dq_tcloseness` triple audits.
    *
    * Determinism: the one `ln` sits inside the 4dp rounding barrier
    * (the `q_dq_drift_psi` precedent); the u=½ singularity (sign(0)·∞ =
    * NaN) folds to zero noise via the same CASE on both engines.
    * Scale: one keyed count agg; the noise is a scan-stage expression
    * over the 25-row frame. */
  def dpLaplace(s: SparkSession, d: String): DataFrame = {
    val cnt = customer(s, d).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"))
    val v = conv(substring(
        md5(col("c_nationkey").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long").cast("double") / lit(4294967296.0) - lit(0.5)
    val noise = when(v === 0.0, 0.0)
      .otherwise(-signum(v) * log(lit(1.0) - lit(2.0) * abs(v)))
    cnt.select(col("c_nationkey"), col("n"),
        round(noise, 4).as("noise"),
        round(col("n").cast("double") + noise, 4).as("released"))
      .orderBy("c_nationkey")
  }
}
