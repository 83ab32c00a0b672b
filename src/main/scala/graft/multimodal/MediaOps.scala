package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata travelling next to an opaque media payload. */
case class MediaMeta(kind: String, width: Int, height: Int,
    sampleRate: Int, nFrames: Int)

/** One media row: opaque bytes + typed metadata (SURVEY §1.2 "multimodal
  * columns" — binary payload, schema'd sidecar). */
case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Decoded-frame batch produced by the decode stage. */
case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Per-media feature vector produced by the extract stage. */
case class MediaFeatures(media_id: Long, kind: String,
    features: Array[Float])

/** Multimodal column handling (north-star mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, decode / feature-extract /
  * resize / frame-sample as distributed batch operators.
  *
  * The real codec libraries are not in this container, so the DECODE KERNEL
  * IS A DETERMINISTIC FAKE (clearly marked below): it fabricates pixel
  * bytes from the payload via a rolling hash. Everything around it — the
  * binary column schema, the Dataset[T] encoders, the mapPartitions batch
  * shape (iterator-in/iterator-out, one codec init per partition, never
  * per row), partitioning, and the declared-query surface — is real Spark
  * plumbing, tested at both unit and query level, and is exactly what a
  * JNI/FFmpeg-backed kernel would drop into.
  *
  * Scale notes (100 TB): payloads stay opaque end-to-end — no shuffle ever
  * carries decoded frames unless the operator's output IS frames; decode
  * runs mapPartitions so per-partition codec state is amortized; metadata
  * predicates (kind/width/duration) are plain columns, so Catalyst pushes
  * them to the scan and whole partitions of oversized media are skipped
  * before a single byte of payload is decoded.
  */
object MediaOps {

  /** Fabricate a media table from the documents table: payload = the
    * document bytes, metadata derived deterministically. Stands in for a
    * real `binaryFile`/object-store read; at scale this is
    * `spark.read.format("binaryFile")` over the media lake. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(6)) * 64 + 64).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (pmod(col("n_chars"), lit(16)) + 1).cast("int").as("nFrames"))
        .as("meta"))

  // ------------------------------------------------------------------
  // ??? DECODE KERNEL — deterministic fake standing in for the codec ???
  // A real deployment replaces `fakeDecodeFrame` with the image/audio
  // library call; signature and batch shape stay identical.
  // ------------------------------------------------------------------
  private[multimodal] def fakeDecodeFrame(payload: Array[Byte],
      frameIdx: Int, frameLen: Int): Array[Byte] = {
    val out = new Array[Byte](frameLen)
    var h = 1125899906842597L + frameIdx * 31L
    var i = 0
    while (i < frameLen) {
      h = 31 * h + (if (payload.isEmpty) 0 else payload(i % payload.length))
      out(i) = (h >>> 24).toByte
      i += 1
    }
    out
  }

  /** Frame-sample: decode every k-th frame of each media row.
    * mapPartitions: iterator-in/iterator-out so a real codec is opened
    * once per partition (not per row), frames stream out without
    * materializing a whole partition in memory. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int,
      frameLen: Int = 64): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real kernel: open codec context here, once per partition)
      rows.flatMap { m =>
        (0 until m.meta.nFrames by everyK).iterator.map { f =>
          FrameRow(m.media_id, f, fakeDecodeFrame(m.payload, f, frameLen))
        }
      }
    }
  }

  /** Feature extraction: fixed-width byte histogram over the decoded
    * payload, normalized to [0,1] — the stand-in for an embedding model
    * forward pass. Output is an `Array[Float]` column compatible with
    * every §2.8 similarity operator (ANN over media features is exactly
    * feature-extract ∘ q_sim_topk). */
  def extractFeatures(media: Dataset[MediaRow],
      bins: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val hist = new Array[Float](bins)
        val decoded = fakeDecodeFrame(m.payload, 0,
          math.max(1, m.payload.length))
        var i = 0
        while (i < decoded.length) {
          hist((decoded(i) & 0xff) * bins / 256) += 1f
          i += 1
        }
        var b = 0
        while (b < bins) { hist(b) /= decoded.length; b += 1 }
        MediaFeatures(m.media_id, m.meta.kind, hist)
      }
    }
  }

  /** Per-frame energy: decode every frame and fold it to one Long (sum
    * of unsigned bytes) INSIDE the decode kernel — the envelope a VAD /
    * silence-trim stage consumes. The frame bytes never leave the
    * mapPartitions task: at 100 TB the shuffle carries (media_id,
    * frame_idx, energy) triples, three orders of magnitude smaller than
    * the decoded frames themselves. A real kernel computes RMS over PCM
    * samples here; the fold shape (iterator-in/iterator-out, one codec
    * init per partition, scalar out) is identical. */
  def frameEnergy(media: Dataset[MediaRow],
      frameLen: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real kernel: open codec context here, once per partition)
      rows.flatMap { m =>
        (0 until m.meta.nFrames).iterator.map { f =>
          val fr = fakeDecodeFrame(m.payload, f, frameLen)
          var e = 0L
          var i = 0
          while (i < fr.length) { e += fr(i) & 0xff; i += 1 }
          (m.media_id, f, e)
        }
      }
    }.toDF("media_id", "frame_idx", "energy")
  }

  /** Resize: pure metadata transform (target dims recorded; payload
    * untouched until a decode stage consumes it — lazy resize, the only
    * sane contract at 100 TB where most media is filtered out before any
    * pixel work). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.kind"), lit(w).cast("int").as("width"),
        lit(h).cast("int").as("height"), col("meta.sampleRate"),
        col("meta.nFrames")))
}

/** Declared-query surface for the multimodal path. */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta"     -> multimodalMeta _,
    "q_multimodal_features" -> multimodalFeatures _,
    "q_multimodal_frames"   -> multimodalFrames _,
    "q_multimodal_ann"      -> multimodalAnn _,
    "q_multimodal_dedup"    -> multimodalDedup _,
    "q_multimodal_pairs"    -> multimodalPairs _,
    "q_multimodal_vad"      -> multimodalVad _
  )

  /** Twin-SQL generator for the FAKE DECODE KERNEL: `fakeDecodeFrame`'s
    * rolling hash h ← 31·h + bᵢ (mod 2⁶⁴) is linear, so with 31 odd —
    * hence invertible mod 2⁶⁴ — the whole byte stream has the closed
    * form hᵢ = 31^{i+1}·h₀ + 31^i·Σ_{j≤i} 31^{−j}·bⱼ, and the inner sum
    * is ONE window cumsum over the exploded payload bytes instead of an
    * O(len²) term expansion (round 10; what flipped features/ann from
    * rows-only). Constants 31^t, 31^{−t}, and 31^{t+1}·h₀ ship as
    * HUGEINT literal lists sized [[MaxLen]] (≥ any fixture payload —
    * an overflow reads NULL and fails the hash compare loudly rather
    * than silently). ASCII payloads only, like [[XxHashSql]].
    * `q_multimodal_frames` (round 13) takes the RECURSIVE route
    * instead: its wraparound payload indexing (`i % len`) breaks the
    * single-cumsum closed form, so its twin replays the 64-step
    * recurrence directly — see [[MediaQueries.oracle]]. */
  private object MediaSql {
    private val M = BigInt(1) << 64
    private val H0 = BigInt(1125899906842597L)
    private val MaxLen = 704
    private def lst(xs: Seq[BigInt]): String =
      xs.map(x => s"$x::HUGEINT").mkString("[", ",", "]")
    private val pow31 = (0 to MaxLen).map(BigInt(31).modPow(_, M))
    private val inv31p = {
      val inv = BigInt(31).modInverse(M)
      (0 to MaxLen).map(inv.modPow(_, M))
    }
    private val hp = (0 until MaxLen).map(i =>
      (BigInt(31).modPow(i + 1, M) * H0).mod(M))

    /** (x·y) mod 2⁶⁴ for unsigned HUGEINTs < 2⁶⁴ (the XxHashSql split,
      * generalized to a variable second operand). */
    private def mul(x: String, y: String): String =
      s"((($x) % 4294967296) * ($y)" +
        s" + ((($x) // 4294967296) * ($y) % 4294967296) * 4294967296)" +
        " % 18446744073709551616"

    /** CTE chain documents → `feats(media_id, kind, f <16 FLOAT bins>)`
      * — the decoded-byte histogram features of `extractFeatures`
      * (frameIdx 0, frameLen = payload length), float-exact: counts are
      * exact ints, the single count/len float division replayed as
      * FLOAT on both engines. */
    def featPrefix: String =
      s"""consts AS (
        |  SELECT ${lst(pow31)} AS p31,
        |    ${lst(inv31p)} AS i31,
        |    ${lst(hp)} AS hp),
        |chars AS (
        |  SELECT doc_id, length(text) AS plen, i,
        |    ord(substr(text, CAST(i + 1 AS INT), 1))::HUGEINT AS b
        |  FROM (SELECT doc_id, text, unnest(range(0, length(text))) AS i
        |        FROM documents) u(doc_id, text, i)),
        |csum AS (
        |  SELECT doc_id, plen, i,
        |    sum(b * (SELECT i31 FROM consts)[CAST(i + 1 AS INT)])
        |      OVER (PARTITION BY doc_id ORDER BY i)
        |      % 18446744073709551616 AS s
        |  FROM chars),
        |dec AS (
        |  SELECT doc_id, plen, i,
        |    ((((SELECT hp FROM consts)[CAST(i + 1 AS INT)]
        |       + ${mul("s", "(SELECT p31 FROM consts)[CAST(i + 1 AS INT)]")})
        |      % 18446744073709551616) // 16777216) % 256 AS byte
        |  FROM csum),
        |bc AS (
        |  SELECT doc_id, plen, CAST(byte // 16 AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM dec GROUP BY 1, 2, 3),
        |farr AS (
        |  SELECT d.doc_id, d.plen,
        |    list(coalesce(bc.cnt, 0) ORDER BY g.b) AS cnts
        |  FROM (SELECT DISTINCT doc_id, plen FROM bc) d
        |  CROSS JOIN generate_series(0, 15) g(b)
        |  LEFT JOIN bc ON bc.doc_id = d.doc_id AND bc.bin = g.b
        |  GROUP BY d.doc_id, d.plen),
        |feats AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |      AS kind,
        |    list_transform(cnts, c ->
        |      CAST(CAST(c AS FLOAT) / CAST(plen AS FLOAT) AS FLOAT)) AS f
        |  FROM farr)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // Round-10 conversion from rows-only: the fake decode kernel's
    // rolling hash replayed in closed form (MediaSql) — f0/f_sum are the
    // same float-division histogram values, summed in bin order.
    "q_multimodal_features" -> (
      s"""WITH ${MediaSql.featPrefix}
        |SELECT media_id, kind,
        |  round(CAST(f[1] AS DOUBLE), 4) AS f0,
        |  round(list_sum(list_transform(f, x -> CAST(x AS DOUBLE))), 4)
        |    AS f_sum
        |FROM feats ORDER BY media_id""".stripMargin),
    // Round-13 conversion from rows-only: the fake kernel's 64-step
    // rolling hash replayed per frame as a recursive CTE (HUGEINT
    // mod-2⁶⁴; signed-byte semantics via the >127 case; payload bytes
    // addressed through hex(encode(text)) so UTF-8 and the i % len
    // wraparound are exact). The digest is md5 of the frame's uppercase
    // hex string — DuckDB md5 is VARCHAR-only, so the hex string IS the
    // comparable form; injective, so the check is as strong as raw md5.
    "q_multimodal_frames" ->
      """WITH RECURSIVE
        |media AS (
        |  SELECT doc_id AS media_id,
        |    hex(encode(text)) AS ph,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS plen,
        |    CAST((n_chars % 16) + 1 AS BIGINT) AS nframes
        |  FROM documents),
        |f AS (
        |  SELECT media_id, ph, plen,
        |    CAST(unnest(range(0, nframes, 4)) AS BIGINT) AS frame_idx
        |  FROM media),
        |step AS (
        |  SELECT media_id, frame_idx, ph, plen, CAST(0 AS BIGINT) AS i,
        |    CAST(1125899906842597 AS HUGEINT) + frame_idx * 31 AS h,
        |    '' AS hx
        |  FROM f
        |  UNION ALL
        |  SELECT media_id, frame_idx, ph, plen, i + 1 AS i, hn AS h,
        |    hx || printf('%02X',
        |      CAST((hn // 16777216) % 256 AS BIGINT)) AS hx
        |  FROM (
        |    SELECT *,
        |      (((CAST(31 AS HUGEINT) * h + bv)
        |          % CAST(18446744073709551616 AS HUGEINT))
        |        + CAST(18446744073709551616 AS HUGEINT))
        |        % CAST(18446744073709551616 AS HUGEINT) AS hn
        |    FROM (
        |      SELECT *, CASE WHEN plen = 0 THEN 0
        |                     WHEN ub > 127 THEN ub - 256 ELSE ub END AS bv
        |      FROM (
        |        SELECT *, CASE WHEN plen = 0 THEN 0
        |          ELSE CAST(('0x' || substr(ph,
        |            CAST((i % plen) * 2 + 1 AS BIGINT), 2)) AS BIGINT)
        |          END AS ub
        |        FROM step WHERE i < 64) a) b) c)
        |SELECT media_id, frame_idx, md5(hx) AS frame_digest
        |FROM step WHERE i = 64
        |ORDER BY media_id, frame_idx""".stripMargin,
    // Round-10 conversion: the same feature frame, FloatVecCosine's
    // in-order double accumulation replayed by list_sum, probe media 0.
    "q_multimodal_ann" -> (
      s"""WITH ${MediaSql.featPrefix},
        |probe AS (SELECT f AS pf FROM feats WHERE media_id = 0)
        |SELECT media_id, kind,
        |  round(
        |    list_sum(list_transform(range(1, 17),
        |      i -> CAST(f[i] AS DOUBLE) * CAST(pf[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(f,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(pf,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
        |    AS cos_sim
        |FROM feats, probe WHERE media_id <> 0
        |ORDER BY cos_sim DESC, media_id LIMIT 10""".stripMargin),
    // Payload stays opaque: byte length + md5 fingerprint + metadata
    // predicate, never decoded. DuckDB twin operates on the same bytes.
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST((doc_id % 8) * 64 + 64 AS INT) AS width,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents
        |WHERE (doc_id % 8) * 64 + 64 >= 256
        |ORDER BY media_id""".stripMargin,
    // The digest is the shuffle key — the twin derives the same (kind,
    // md5, byte length) triple from the documents table the fixture
    // fabricates from. octet_length(text::BLOB) = Spark
    // length(binary(payload)): both count UTF-8 bytes.
    "q_multimodal_dedup" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |    md5(text) AS digest,
        |    CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes
        |  FROM documents),
        |groups AS (
        |  SELECT kind, digest, CAST(count(*) AS BIGINT) AS n,
        |    min(n_bytes) AS n_bytes
        |  FROM m GROUP BY kind, digest)
        |SELECT kind,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(n) AS BIGINT) AS n_payloads,
        |  CAST(count(*) FILTER (n > 1) AS BIGINT) AS n_dup_groups,
        |  CAST(sum((n - 1) * n_bytes) AS BIGINT) AS bytes_reclaimable
        |FROM groups GROUP BY kind ORDER BY kind""".stripMargin,
    // Same xor-1 cross-reference and gate cascade; the payload never
    // appears in either engine's plan — metadata-grain only.
    "q_multimodal_pairs" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    xor(doc_id, 1) AS caption_id
        |  FROM documents),
        |paired AS (
        |  SELECT m.media_id, m.kind, m.caption_id,
        |    d.lang AS cap_lang, d.n_chars AS cap_chars,
        |    CASE WHEN m.kind <> 'image' THEN 'not_image'
        |         WHEN d.n_chars < 120 THEN 'caption_too_short'
        |         WHEN d.lang NOT IN ('en', 'de', 'fr')
        |           THEN 'caption_lang'
        |         ELSE 'accepted' END AS verdict
        |  FROM media m JOIN documents d ON d.doc_id = m.caption_id)
        |SELECT kind, verdict, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(min(media_id) AS BIGINT) AS first_media,
        |  CAST(sum(cap_chars) AS BIGINT) AS sum_cap_chars
        |FROM paired GROUP BY kind, verdict
        |ORDER BY kind, verdict""".stripMargin,
    // The q_multimodal_frames recursive kernel replay, audio subset,
    // EVERY frame, accumulating the unsigned-byte sum (the energy
    // envelope) instead of the hex digest; then mean-threshold activity
    // and islands-and-gaps segment stats — all exact integers after the
    // one avg() double division both engines compute identically from
    // exact long sums.
    "q_multimodal_vad" ->
      """WITH RECURSIVE
        |media AS (
        |  SELECT doc_id AS media_id,
        |    hex(encode(text)) AS ph,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS plen,
        |    CAST((n_chars % 16) + 1 AS BIGINT) AS nframes
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT media_id, ph, plen,
        |    CAST(unnest(range(0, nframes)) AS BIGINT) AS frame_idx
        |  FROM media),
        |step AS (
        |  SELECT media_id, frame_idx, ph, plen, CAST(0 AS BIGINT) AS i,
        |    CAST(1125899906842597 AS HUGEINT) + frame_idx * 31 AS h,
        |    CAST(0 AS BIGINT) AS es
        |  FROM f
        |  UNION ALL
        |  SELECT media_id, frame_idx, ph, plen, i + 1 AS i, hn AS h,
        |    es + CAST((hn // 16777216) % 256 AS BIGINT) AS es
        |  FROM (
        |    SELECT *,
        |      (((CAST(31 AS HUGEINT) * h + bv)
        |          % CAST(18446744073709551616 AS HUGEINT))
        |        + CAST(18446744073709551616 AS HUGEINT))
        |        % CAST(18446744073709551616 AS HUGEINT) AS hn
        |    FROM (
        |      SELECT *, CASE WHEN plen = 0 THEN 0
        |                     WHEN ub > 127 THEN ub - 256 ELSE ub END AS bv
        |      FROM (
        |        SELECT *, CASE WHEN plen = 0 THEN 0
        |          ELSE CAST(('0x' || substr(ph,
        |            CAST((i % plen) * 2 + 1 AS BIGINT), 2)) AS BIGINT)
        |          END AS ub
        |        FROM step WHERE i < 64) a) b) c),
        |fr AS (SELECT media_id, frame_idx, es AS energy
        |       FROM step WHERE i = 64),
        |stats AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
        |          avg(energy) AS me FROM fr GROUP BY 1),
        |act AS (SELECT f2.media_id, f2.frame_idx,
        |    f2.frame_idx - row_number()
        |      OVER (PARTITION BY f2.media_id ORDER BY f2.frame_idx)
        |      AS grp
        |  FROM fr f2 JOIN stats s USING (media_id)
        |  WHERE f2.energy > s.me),
        |segs AS (SELECT media_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM act GROUP BY 1, 2),
        |agg AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
        |    CAST(sum(len) AS BIGINT) AS n_active, max(len) AS longest_seg
        |  FROM segs GROUP BY 1)
        |SELECT s.media_id, s.n_frames,
        |  coalesce(a.n_active, CAST(0 AS BIGINT)) AS n_active,
        |  coalesce(a.n_segments, CAST(0 AS BIGINT)) AS n_segments,
        |  coalesce(a.longest_seg, CAST(0 AS BIGINT)) AS longest_seg
        |FROM stats s LEFT JOIN agg a USING (media_id)
        |ORDER BY media_id""".stripMargin
  )

  /** Metadata + fingerprint scan with a metadata predicate — demonstrates
    * that filtering media by sidecar columns never touches payload bytes
    * (the filter is on `meta.width`, pushed ahead of the md5 projection).
    */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    MediaOps.mediaTable(s, d)
      .filter(col("meta.width") >= 256)
      .select(col("media_id"), col("meta.kind").as("kind"),
        col("meta.width").as("width"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("media_id")

  /** Deterministic fake-decode feature extraction through the full typed
    * mapPartitions pipeline. Hash-matched oracle since round 10: the
    * kernel's rolling hash is linear, so [[MediaQueries.MediaSql]]
    * replays it in closed form; invariants additionally
    * property-tested in MultimodalSpec. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = MediaOps.mediaTable(s, d).as[MediaRow]
    MediaOps.extractFeatures(media, bins = 16)
      .toDF()
      .select(col("media_id"), col("kind"),
        round(element_at(col("features"), 1).cast("double"), 4)
          .as("f0"),
        round(aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x.cast("double")), 4).as("f_sum"))
      .orderBy("media_id")
  }

  /** Lazy resize → every-4th-frame sampling through the typed
    * mapPartitions decode stage: the full video-preprocessing shape
    * (filter on metadata upstream, decode only sampled frames). Emits one
    * row per sampled frame with a content digest — payload-derived but
    * deterministic (fake kernel).
    *
    * HASH-MATCHED since round 13 (formerly rows-only): the digest is
    * `md5(hex(frame))` — md5 of the frame's UPPERCASE HEX STRING, not of
    * the raw bytes — because DuckDB 1.0's md5 accepts VARCHAR only, and
    * the hex detour routes around that signature gap without weakening
    * the check (hex is injective; equal digests ⟺ equal frame bytes).
    * The twin replays the fake kernel's 64-step rolling hash per frame
    * as a recursive CTE over HUGEINT mod-2⁶⁴ arithmetic (the wraparound
    * payload indexing `i % len` breaks MediaSql's single-cumsum closed
    * form, so frames recurse where features cumsum — ≤ frames×64 ≈ 80 k
    * recursion rows at the sf0.01 gate). MultimodalSpec keeps the
    * byte-level invariants. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = MediaOps.resize(MediaOps.mediaTable(s, d), 224, 224)
      .as[MediaRow]
    MediaOps.sampleFrames(media, everyK = 4)
      .toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(hex(col("frame"))).as("frame_digest"))
      .orderBy("media_id", "frame_idx")
  }

  /** Media similarity search end-to-end: decode → feature-extract →
    * exact cosine top-10 vs a probe medium — the composition proof that
    * the multimodal path's output (an `Array[Float]` feature column) IS
    * a first-class citizen of the §2.8 similarity surface (swap the
    * fake kernel for a real embedding model and this is image search).
    * Same serving shape as `q_sim_topk`: 1-row probe broadcast, the
    * codegen'd `graft_vec_cosine` in the scan stage, TakeOrdered — the
    * feature table is scanned once and never shuffled. Rounded score +
    * id tiebreak keeps ordering deterministic. Hash-matched oracle since
    * round 10 (the closed-form kernel replay + FloatVecCosine's
    * in-order accumulation); MultimodalSpec additionally recomputes the
    * top-k independently and pins it. */
  def multimodalAnn(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val feats = MediaOps.extractFeatures(
      MediaOps.mediaTable(s, d).as[MediaRow](
        org.apache.spark.sql.Encoders.product[MediaRow]), bins = 16)
      .toDF()
    val probe = feats.filter(col("media_id") === 0)
      .select(col("features").as("pf"))
    feats.filter(col("media_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("media_id"), col("kind"),
        round(graft.functions.VectorOps.cosine(col("features"),
          col("pf")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("media_id"))
      .limit(10)
  }

  /** Exact media dedup by payload digest — the storage-dedup first pass
    * every multimodal lake runs (byte-identical re-crawls and re-uploads
    * dominate raw duplicate mass; content-level near-dup is
    * `q_multimodal_ann`'s job). Per-kind census of (kind, md5) groups:
    * distinct payloads, total payloads, duplicate groups, and the bytes
    * a dedup pass would reclaim (Σ(n−1)·payload_bytes per group).
    *
    * Scale shape: the payload reduces to its 16-byte digest + length in
    * the scan stage and the DIGEST is the shuffle key — payload bytes
    * never shuffle, the same fingerprint-not-content discipline as the
    * text dedup family. Both aggs are map-side combinable; the per-kind
    * summary runs on the groups frame, not the lake. */
  def multimodalDedup(s: SparkSession, d: String): DataFrame =
    MediaOps.mediaTable(s, d)
      .select(col("meta.kind").as("kind"),
        md5(col("payload")).as("digest"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("kind", "digest")
      .agg(count(lit(1)).as("n"), min("n_bytes").as("n_bytes"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_distinct"),
        sum("n").as("n_payloads"),
        count_if(col("n") > 1).as("n_dup_groups"),
        sum((col("n") - 1) * col("n_bytes")).as("bytes_reclaimable"))
      .orderBy("kind")

  /** Image–text training-pair assembly with quality gates — the
    * CLIP/LAION curation shape: media rows paired to their caption
    * documents by the declared xor-1 cross-reference, then gated
    * (images only, caption ≥ 120 chars, en/de/fr caption lang) with an
    * accept/reject reason on every pair and a per-(kind, verdict)
    * census — the decision every multimodal corpus build makes BEFORE
    * paying decode/embed cost on a single payload byte.
    *
    * Scale: the join is METADATA-GRAIN — neither side selects the
    * payload column, so column pruning keeps the heavy bytes out of the
    * entire plan (scan ReadSchema carries ids + metadata only); the
    * gates are scan-stage CASEs and the census one keyed agg over the
    * bounded (kind × verdict) domain. */
  def multimodalPairs(s: SparkSession, d: String): DataFrame = {
    val media = MediaOps.mediaTable(s, d)
      .select(col("media_id"), col("meta.kind").as("kind"),
        expr("media_id ^ 1").as("caption_id"))
    val caps = graft.Tables.documents(s, d)
      .select(col("doc_id").as("caption_id"),
        col("lang").as("cap_lang"), col("n_chars").as("cap_chars"))
    media.join(caps, Seq("caption_id"))
      .select(col("media_id"), col("kind"), col("cap_lang"),
        col("cap_chars"),
        when(col("kind") =!= "image", "not_image")
          .when(col("cap_chars") < 120, "caption_too_short")
          .when(!col("cap_lang").isin("en", "de", "fr"), "caption_lang")
          .otherwise("accepted").as("verdict"))
      .groupBy("kind", "verdict")
      .agg(count(lit(1)).as("n_pairs"),
        min("media_id").as("first_media"),
        sum("cap_chars").as("sum_cap_chars"))
      .orderBy("kind", "verdict")
  }

  /** Voice-activity detection over the audio subset: per-frame energy
    * envelope ([[MediaOps.frameEnergy]] — the fold runs INSIDE the
    * decode kernel, frame bytes never shuffle) → active = energy
    * strictly above the medium's mean → consecutive active frames
    * coalesce into segments (islands-and-gaps: frame_idx − row_number
    * per medium) → per-medium speech stats. The silence-trim /
    * speech-share audit an audio training pipeline runs before paying
    * for transcription; at 100 TB the shuffled rows are (media_id,
    * frame_idx, energy) triples — three orders smaller than PCM — and
    * the metadata predicate (kind='audio') prunes 2/3 of the corpus
    * BEFORE any decode. Exactness: energies are exact longs (sums of
    * unsigned bytes); the one per-medium mean is a single IEEE double
    * division the twin replays identically (both engines sum the ≤16
    * small longs exactly); comparisons strict; segment arithmetic is
    * all integers. The DuckDB twin replays the fake kernel's 64-step
    * rolling hash per frame as a recursive CTE (the
    * `q_multimodal_frames` route) and accumulates the byte sum instead
    * of the hex digest. */
  def multimodalVad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = MediaOps.mediaTable(s, d)
      .filter(col("meta.kind") === "audio")
      .as[MediaRow]
    val fr = MediaOps.frameEnergy(media)
    val act = fr
      .withColumn("mean_e", avg(col("energy")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("media_id")))
      .filter(col("energy") > col("mean_e"))
      .withColumn("grp", col("frame_idx") -
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("media_id").orderBy("frame_idx")))
    val segs = act.groupBy("media_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("len")).as("n_active"),
        max(col("len")).as("longest_seg"))
    fr.groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .join(segs, Seq("media_id"), "left")
      .select(col("media_id"), col("n_frames"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_seg"), lit(0L)).as("longest_seg"))
      .orderBy("media_id")
  }
}
