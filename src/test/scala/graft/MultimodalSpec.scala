package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal._

/** Multimodal plumbing invariants: schema, batch shape, determinism, and
  * partitioning-independence of the mapPartitions stages. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def media = {
    import spark.implicits._
    MediaOps.mediaTable(spark, sfDir).as[MediaRow]
  }

  test("media table schema: opaque binary payload + typed metadata struct") {
    val df = MediaOps.mediaTable(spark, sfDir)
    val f = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") === "binary")
    assert(f("meta").startsWith("struct<kind:string,width:int"))
  }

  test("frame sampling: every k-th frame, correct count per row") {
    import spark.implicits._
    val k = 4
    val frames = MediaOps.sampleFrames(media, everyK = k)
    val perRow = frames.groupByKey(_.media_id).count().collect().toMap
    val expected = media.collect()
      .map(m => m.media_id -> ((m.meta.nFrames + k - 1) / k).toLong).toMap
    assert(perRow === expected)
    assert(frames.collect().forall(_.frame.length === 64))
  }

  test("decode is deterministic and partitioning-independent") {
    import spark.implicits._
    val a = MediaOps.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val b = MediaOps.extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a === b, "features must not depend on physical partitioning")
  }

  test("features are a normalized histogram (sums to 1)") {
    val feats = MediaOps.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val s = f.features.map(_.toDouble).sum
      assert(math.abs(s - 1.0) < 1e-3, s"histogram sum $s for ${f.media_id}")
      assert(f.features.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("feature vectors feed the similarity operators (array<float>)") {
    import spark.implicits._
    val feats = MediaOps.extractFeatures(media).toDF()
    val df = feats.select(
      graft.functions.VectorOps.cosine(col("features"), col("features"))
        .as("self_cos"))
    // cos(x,x) = 1 — proves the multimodal output plugs into VectorOps.
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("resize rewrites metadata only, payload bytes untouched") {
    val before = MediaOps.mediaTable(spark, sfDir)
    val after = MediaOps.resize(before, 224, 224)
    val a = after.select(col("meta.width"), col("meta.height")).distinct()
      .collect()
    assert(a.length === 1 && a.head.getInt(0) === 224)
    val pb = before.select(md5(col("payload"))).collect().map(_.getString(0))
    val pa = after.select(md5(col("payload"))).collect().map(_.getString(0))
    assert(pb.toSeq === pa.toSeq)
  }

  test("multimodal ANN matches an independent driver-side recompute") {
    // Recompute the exact top-10 from the collected feature table with
    // plain Scala math (same rounded-score + id tiebreak ordering) —
    // the declared query's broadcast/codegen path must agree row for
    // row.
    val feats = MediaOps.extractFeatures(
      MediaOps.mediaTable(spark, sfDir)
        .as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow]),
      bins = 16).collect().map(f => f.media_id -> f.features).toMap
    val pf = feats(0L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = feats.toSeq.filter(_._1 != 0L)
      .map { case (id, f) =>
        (id, BigDecimal(cos(f, pf))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    val got = MediaQueries.multimodalAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("metadata predicates prune before payload work (plan check)") {
    val df = MediaQueries.multimodalMeta(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    // The width filter must sit below the md5 projection in the plan.
    assert(plan.contains("Filter"), plan)
    df.collect() // and the query actually runs
  }

  test("q_multimodal_pairs: census partitions all pairs; payload pruned") {
    val df = MediaQueries.multimodalPairs(spark, sfDir)
    val out = df.collect()
    assert(out.nonEmpty)
    // Every media row has its xor-1 caption partner when the id count is
    // even (the fixture's doc ids are dense from 0), so the census must
    // cover every document exactly once.
    val docs = Tables.documents(spark, sfDir).count()
    val covered = out.map(_.getAs[Long]("n_pairs")).sum
    assert(covered === docs - docs % 2 || covered === docs,
      s"census covered $covered of $docs")
    // Gate cascade: non-images carry only the not_image verdict; image
    // verdicts come from the declared reason set.
    out.foreach { r =>
      val (kind, verdict) = (r.getAs[String]("kind"),
        r.getAs[String]("verdict"))
      if (kind != "image") assert(verdict === "not_image")
      else assert(Set("accepted", "caption_too_short", "caption_lang")(
        verdict), s"unexpected image verdict $verdict")
    }
    // The payload column must be pruned out of the entire plan: the
    // metadata-grain contract this operator exists to demonstrate.
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"),
      "payload leaked into the pair-assembly plan")
  }

  test("q_multimodal_vad: segments re-derived independently per medium") {
    import spark.implicits._
    val out = MediaQueries.multimodalVad(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out.nonEmpty)
    // Audio subset only, one row per audio medium.
    val audio = media.filter(_.meta.kind == "audio").collect()
    assert(out.keySet === audio.map(_.media_id).toSet)
    // Brute-force replay with an INDEPENDENT transcription of the fake
    // kernel's rolling hash, driver-side: energy = unsigned-byte sum per
    // frame, active = strictly above mean, segments = maximal runs of
    // consecutive active frame indices.
    def frameEnergyRef(payload: Array[Byte], frameIdx: Int): Long = {
      var h = 1125899906842597L + frameIdx * 31L
      var e = 0L
      var i = 0
      while (i < 64) {
        h = 31 * h + (if (payload.isEmpty) 0 else payload(i % payload.length))
        e += (h >>> 24) & 0xff
        i += 1
      }
      e
    }
    audio.foreach { m =>
      val energies: Seq[Long] =
        (0 until m.meta.nFrames).map(f => frameEnergyRef(m.payload, f))
      val mean = energies.sum.toDouble / energies.size
      val active = energies.zipWithIndex.collect {
        case (e, i) if e > mean => i
      }
      val segs = active.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), i) if h.head == i - 1 => (i :: h) :: t
        case (acc, i) => List(i) :: acc
      }
      val (nf, na, ns, lg) = out(m.media_id)
      assert(nf === m.meta.nFrames.toLong)
      assert(na === active.size.toLong, s"media ${m.media_id} n_active")
      assert(ns === segs.size.toLong, s"media ${m.media_id} n_segments")
      assert(lg === (if (segs.isEmpty) 0L
                     else segs.map(_.size).max.toLong),
        s"media ${m.media_id} longest_seg")
    }
  }

  test("frameEnergy is partitioning-independent and frame-complete") {
    import spark.implicits._
    val a = MediaOps.frameEnergy(media).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = MediaOps.frameEnergy(media.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b, "energy must not depend on physical partitioning")
    // Every frame of every medium appears exactly once.
    val expected = media.collect()
      .flatMap(m => (0 until m.meta.nFrames).map(f => (m.media_id, f)))
      .toSet
    assert(a.keySet === expected)
    // Energies are sums of 64 unsigned bytes: [0, 64*255].
    assert(a.values.forall(e => e >= 0L && e <= 64L * 255))
  }
}
