package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurateQueries, SimilarityQueries, StatsQueries}

/** Invariants for the corpus-curation rows (SURVEY §2.8) and the event
  * funnel — properties the DuckDB hash-match cannot express: partition
  * completeness, cap bounds, count conservation, and cross-checks against
  * independent formulations. */
class CurateSpec extends AnyFunSuite with SparkFixture {

  test("q_split_hash partitions the corpus: disjoint, complete, stable") {
    val out = CurateQueries.splitHash(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total,
      "split assignment must cover every doc exactly once")
    val splits = out.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // Stability: the assignment is a pure function of doc_id, so a rerun
    // is byte-identical (no sampling nondeterminism).
    assert(CurateQueries.splitHash(spark, sfDir).collect().toSeq ===
      out.toSeq)
  }

  test("q_domain_cap keeps at most 10 per source, exactly min(10, n)") {
    val out = CurateQueries.domainCap(spark, sfDir)
    assert(out.filter(col("rk") > 10).isEmpty)
    val kept = out.groupBy("source").agg(count(lit(1)).as("n_kept"))
    val expect = Tables.documents(spark, sfDir)
      .groupBy("source").agg(least(count(lit(1)), lit(10L)).as("n_exp"))
    val bad = kept.join(expect, "source")
      .filter(col("n_kept") =!= col("n_exp"))
    assert(bad.isEmpty, "per-source kept count must be min(cap, n)")
  }

  test("q_dedup_incremental conserves counts and matches a direct recount") {
    val out = CurateQueries.dedupIncremental(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup") + r.getAs[Long]("n_new") ===
        r.getAs[Long]("n_delta"), s"dup+new must equal delta in $r")
    }
    // Independent recount of the dup side via a LEFT SEMI join (different
    // join type, same semantics).
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"),
      md5(trim(regexp_replace(lower(col("text")), " +", " "))
        .cast("binary")).as("fp"))
    val nDupSemi = docs.filter(col("doc_id") % 4 === 0)
      .join(docs.filter(col("doc_id") % 4 =!= 0).select("fp"),
        Seq("fp"), "left_semi")
      .count()
    assert(out.map(_.getAs[Long]("n_dup")).sum === nDupSemi)
  }

  test("q_embed_stats norms are ordered and counts conserve") {
    val out = CurateQueries.embedStats(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum ===
      Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("avg_norm"), r.getAs[Double]("max_norm"))
      assert(mn > 0.0 && mn <= av && av <= mx,
        s"norm ordering violated in $r")
    }
  }

  test("q_event_funnel counts every user exactly once, stages ordered") {
    val out = StatsQueries.eventFunnel(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users,
      "every user lands in exactly one deepest-stage bucket")
    assert(out.map(_.getAs[String]("stage")).toSet
      .subsetOf(Set("0_none", "1_view", "2_click", "3_purchase")))
    // Funnel containment, recomputed independently: users with a
    // qualifying purchase chain must also have a qualifying click chain.
    val ev = Tables.events(spark, sfDir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") >= col("v_ts"))
      .select("user_id").distinct()
    val nClickPlus = c.count()
    val reached23 = out.filter(r => Set("2_click", "3_purchase")
      .contains(r.getAs[String]("stage")))
      .map(_.getAs[Long]("n_users")).sum
    assert(reached23 === nClickPlus,
      "stage>=click population must equal the independent recount")
  }

  test("q_dedup_semantic keep contract holds in both directions") {
    // Independent recompute: per vector, the MAX cosine to any lower-id
    // same-cluster vector (a different formulation than the query's
    // distinct-discard join). keep must be exactly (max < tau or none).
    val out = SimilarityQueries.dedupSemantic(spark, sfDir)
    val cl = out.select("vec_id", "cluster")
      .join(Tables.embeddings(spark, sfDir), "vec_id")
    val maxCos = cl.as("a")
      .join(cl.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("b.vec_id") < col("a.vec_id"))
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(max(graft.functions.VectorOps.cosine(
        col("a.embedding"), col("b.embedding"))).as("mx"))
    val check = out.join(maxCos, Seq("vec_id"), "left")
    val wrongKept = check.filter(col("keep") &&
      col("mx") >= SimilarityQueries.SemTau)
    val wrongDropped = check.filter(!col("keep") &&
      (col("mx").isNull || col("mx") < SimilarityQueries.SemTau))
    assert(wrongKept.isEmpty && wrongDropped.isEmpty,
      s"kept-with-dup=${wrongKept.count()} dropped-without-dup=${wrongDropped.count()}")
    // The fixture must actually exercise both branches.
    assert(out.filter(!col("keep")).count() > 0,
      "no vector was deduplicated — threshold/cluster regime too loose")
  }

  test("q_dq_kanon conserves rows and its class bounds are coherent") {
    val out = CurateQueries.dqKanon(spark, sfDir).collect()
    val total = Tables.customer(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === total,
      "every customer row must land in exactly one equivalence class")
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows_at_risk") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_at_risk_classes") <=
        r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("min_class") >= 1)
      val share = r.getAs[Double]("risk_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q_dq_ldiversity conserves rows; diversity is bounded by segments") {
    val out = CurateQueries.dqLdiversity(spark, sfDir).collect()
    val total = Tables.customer(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === total)
    out.foreach { r =>
      val l = r.getAs[Long]("min_l")
      assert(l >= 1 && l <= 5, s"min_l out of segment-domain bounds: $l")
      assert(r.getAs[Long]("n_low_diversity") <= r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("n_rows_at_risk") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q_dq_tcloseness: TV is a bounded distance; counts coherent") {
    val out = CurateQueries.dqTcloseness(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tv = r.getAs[Double]("worst_tv")
      assert(tv >= 0.0 && tv <= 1.0 + 1e-9,
        s"total-variation out of [0,1]: $tv")
      assert(r.getAs[Long]("n_fail") <= r.getAs[Long]("n_classes"))
    }
    // The fixture's tiny classes are far from the global distribution —
    // the audit must genuinely fire somewhere.
    assert(out.map(_.getAs[Long]("n_fail")).sum > 0,
      "no class failed t-closeness — fixture regime too loose")
  }

  test("q_filter_blocklist conserves docs; reasons come from the list") {
    val out = CurateQueries.filterBlocklist(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total,
      "kept + removed must cover the corpus exactly once")
    val reasons = out.filter(_.getAs[String]("verdict") == "removed")
      .map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("licensing", "spam", "optout")))
    assert(out.filter(_.getAs[String]("verdict") == "kept")
      .forall(_.getAs[String]("reason") == "-"))
  }

  test("q_interleave_mix is a round-robin: round r completes before r+1") {
    val out = CurateQueries.interleaveMix(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("position")).toSeq ===
      (1L to out.length.toLong).toSeq, "positions must be 1..n dense")
    // Every doc of round r precedes every doc of round r+1, and within
    // a round each language contributes at most one doc — the property
    // that kills contiguous same-source runs.
    val byRound = out.groupBy(_.getAs[Long]("rnd"))
    for ((r, docs) <- byRound; if byRound.contains(r + 1)) {
      assert(docs.map(_.getAs[Long]("position")).max <
        byRound(r + 1).map(_.getAs[Long]("position")).min,
        s"round $r must fully precede round ${r + 1}")
    }
    byRound.values.foreach { docs =>
      val langs = docs.map(_.getAs[String]("lang"))
      assert(langs.distinct.length === langs.length,
        "a language may send at most one doc per round")
    }
  }

  test("q_embed_kmeans partitions the cloud; census is coherent") {
    val out = SimilarityQueries.embedKmeans(spark, sfDir).collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === total,
      "every vector must be assigned to exactly one cluster")
    assert(out.map(_.getAs[Long]("cluster_id")).toSet
      .subsetOf(Set(0L, 1L, 2L, 3L)))
    out.foreach { r =>
      assert(r.getAs[Double]("inertia") >= 0.0)
      assert(r.getAs[Double]("centroid_norm") >= 0.0)
    }
  }

  test("q_eval_ndcg emits one bounded row per probe") {
    val out = SimilarityQueries.evalNdcg(spark, sfDir).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"),
        r.getAs[Double]("idcg"), r.getAs[Double]("ndcg"))
      assert(idcg > 0.0, "fixture labels guarantee ≥10 relevant docs")
      assert(dcg >= 0.0 && dcg <= idcg + 1e-9)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
  }

  test("q_select_maxcover matches a serial greedy replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)
        .filter(_.nonEmpty).toSet)
      .toMap
    val pool = docs.toSeq.map { case (id, t) => (id, t.size) }
      .sortBy { case (id, n) => (-n, id) }.take(8)
    var covered = Set.empty[String]
    var chosen = List.empty[(Long, Int, Int)]
    for (r <- 1 to 4) {
      val rem = pool.filterNot(p => chosen.exists(_._1 == p._1))
      val (id, gain) = rem.map { case (pid, _) =>
        (pid, (docs(pid) -- covered).size)
      }.minBy { case (pid, g) => (-g, pid) }
      covered = covered ++ docs(id)
      chosen = chosen :+ ((id, gain, covered.size))
    }
    val out = graft.operators.CurateQueries.selectMaxcover(spark, sfDir)
      .collect()
    assert(out.length == 4)
    for ((r, i) <- out.sortBy(_.getAs[Long]("rank")).zipWithIndex) {
      val (id, gain, tot) = chosen(i)
      assert(r.getAs[Long]("doc_id") == id, s"pick ${i + 1}")
      assert(r.getAs[Long]("gain") == gain.toLong)
      assert(r.getAs[Long]("covered_total") == tot.toLong)
      assert(r.getAs[Long]("n_tokens") == docs(id).size.toLong)
    }
    // Submodularity: gains are non-increasing along the greedy path.
    val gains = out.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
  }

  test("q_select_kcenter: greedy separation bound and census conservation") {
    val out = CurateQueries.selectKcenter(spark, sfDir).collect()
    assert(out.length === 4, "k=4 centers must all be chosen")
    assert(out.map(_.getAs[Int]("center_rank")).toSeq === Seq(1, 2, 3, 4))
    val ids = out.map(_.getAs[Long]("c_id"))
    assert(ids.distinct.length === 4, "centers must be distinct points")
    // Census covers the whole corpus exactly once.
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_points")).sum === n)
    // The greedy invariant: every center was, at selection time, at
    // least the final coverage radius away from all earlier centers —
    // so min pairwise center separation >= max coverage radius.
    val vecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val minSep = (for {
      i <- ids.indices; j <- ids.indices if i < j
    } yield d2(vecs(ids(i)), vecs(ids(j)))).min
    val maxCov = out.map(_.getAs[Double]("coverage_d2")).max
    assert(minSep >= maxCov - 1e-6,
      s"greedy separation violated: minSep=$minSep < maxCov=$maxCov")
  }

  test("q_dataset_card: conservation, dup-share bounds, driver replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val out = CurateQueries.datasetCard(spark, sfDir).collect()
    // One row per source; doc counts conserve the corpus.
    assert(out.map(_.getAs[String]("source")).distinct.length === out.length)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val bySource = docs.groupBy(_._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySource(src)
      assert(r.getAs[Long]("n_docs") === g.length.toLong)
      assert(r.getAs[Long]("n_langs") === g.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("tok_total") ===
        g.map(_._3.split(" ", -1).length.toLong).sum)
      val dup = r.getAs[Double]("dup_share")
      assert(dup >= 0.0 && dup <= 1.0)
      // Driver replay of the dup share off the same fingerprint.
      val counts = g.groupBy(_._3).view.mapValues(_.length)
      val nDup = g.count(d => counts(d._3) > 1)
      assert(math.abs(dup - nDup.toDouble / g.length) < 1e-6,
        s"dup_share mismatch for $src")
    }
  }

  test("q_ccnet_bucket: terciles balanced, ordered by quality, conserve") {
    val out = CurateQueries.ccnetBucket(spark, sfDir).collect()
    assert(out.nonEmpty)
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val byB = rows.map(r =>
        r.getAs[Long]("bucket") -> r.getAs[Long]("n_docs")).toMap
      // ntile(3): bucket sizes differ by at most one, buckets are 1..k.
      assert(byB.keySet.subsetOf(Set(1L, 2L, 3L)), s"$lang buckets")
      assert(byB.values.max - byB.values.min <= 1L,
        s"$lang tercile sizes unbalanced: $byB")
      // Head buckets carry higher chars-per-token than tail buckets.
      val cpt = rows.sortBy(_.getAs[Long]("bucket"))
        .map(_.getAs[Double]("cpt"))
      // Weighted bucket means inherit the per-doc ordering (bucket 1's
      // min per-doc score >= bucket 2's max), up to the 6dp rounding.
      assert(cpt.zip(cpt.tail).forall { case (a, b) => a >= b - 1e-6 },
        s"$lang cpt not non-increasing: ${cpt.toSeq}")
    }
  }

  test("q_split_temporal: conservation, leakage bounds, cutoff replay") {
    val out = CurateQueries.splitTemporal(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (mn, mx) = (ev.map(_._3).min, ev.map(_._3).max)
    val cut = mn + (mx - mn) * 8 / 10
    assert(out.map(_.getString(0)).toSet === ev.map(_._1).toSet)
    out.foreach { r =>
      val t = r.getString(0)
      val mine = ev.filter(_._1 == t)
      val (nTrain, nTest, uTrain, uTest, uBoth) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      // Conservation: the split partitions the type's events exactly.
      assert(nTrain + nTest === mine.length.toLong, s"$t events")
      // Independent cutoff replay.
      assert(nTrain === mine.count(_._3 <= cut).toLong, s"$t cutoff")
      // User accounting: both-side users bounded by each side; side
      // counts bounded by the type's distinct users.
      val users = mine.map(_._2).distinct.length.toLong
      assert(uBoth <= math.min(uTrain, uTest), s"$t both bound")
      assert(uTrain <= users && uTest <= users, s"$t user bound")
      // Train + test users cover every user (each user has >= 1 event
      // on some side) without double-counting beyond the overlap.
      assert(uTrain + uTest - uBoth === users, s"$t inclusion-exclusion")
      if (uTest > 0)
        assert(r.getDouble(6) ===
          graft.operators.IterOps.sparkRound(
            uBoth.toDouble / uTest.toDouble, 4), s"$t leak_frac")
    }
    // The 80% cutoff actually lands most events in train globally.
    val trainFrac = out.map(_.getLong(1)).sum.toDouble / ev.length
    assert(trainFrac > 0.5 && trainFrac < 1.0,
      s"global train fraction $trainFrac outside (0.5, 1)")
  }
}
