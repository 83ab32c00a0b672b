package graft.operators

/** DuckDB-SQL generator for Spark's `xxhash64` (seed 42) over SHORT
  * ASCII strings — the missing primitive that kept the MinHash/SimHash
  * dedup family rows-only for nine rounds.
  *
  * Spark's `xxhash64(string)` is XXH64 over the UTF-8 bytes. DuckDB has
  * no xxHash builtin, but every step of XXH64 is integer arithmetic a
  * single SQL statement can express once 64-bit WRAPPING ops are encoded
  * in HUGEINT: state lives as an unsigned 0 ≤ h < 2⁶⁴ HUGEINT; x·P mod
  * 2⁶⁴ splits x into 32-bit halves so no intermediate exceeds ~2⁹⁷
  * (HUGEINT max is 2¹²⁷−1); rotations are one multiply + one floor-div;
  * XOR is DuckDB's `xor`, bit-exact on non-negative HUGEINTs.
  *
  * Scope (declared preconditions, both pinned by the fixture and
  * checked empirically round 10 against PySpark byte-for-byte):
  *   - input < 32 bytes — the XXH64 stripe phase never runs, so the
  *     chain is: h = seed+P5+len → ≤3 8-byte word rounds → optional
  *     4-byte round → ≤3 tail-byte rounds → avalanche. Fixture tokens
  *     are ≤8 bytes and 3-token shingles ≤26 bytes (FIXTURES.md).
  *   - ASCII input — bytes are read as `ord(substr(tok, i, 1))`, which
  *     is the code point; DuckDB 1.0 cannot index BLOB bytes, so
  *     multi-byte UTF-8 would diverge. The fixture corpus is pure
  *     ASCII (`documents.text` ~ [a-z0-9 ]).
  *
  * The generated chain is a sequence of CTEs mapping a relation
  * `d(tok)` to `f3(tok, …, h)` with h = unsigned xxhash64. Each XXH64
  * step sits in its OWN CTE: the wrap/rot helpers reference their
  * operand 2–4×, so a fully nested expression would grow ~4^steps; the
  * staged form keeps every expression a few hundred chars. */
object XxHashSql {

  private val M64 = "18446744073709551616" // 2^64
  private val M32 = "4294967296" // 2^32
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261" // 0x27D4EB2F165667C5

  /** (x * p) mod 2⁶⁴, x unsigned HUGEINT < 2⁶⁴, p decimal-literal
    * constant < 2⁶⁴: split x into 32-bit halves so every intermediate
    * fits signed HUGEINT. */
  private def mul(x: String, p: String): String =
    s"((($x) % $M32) * $p::HUGEINT" +
      s" + ((($x) // $M32) * $p::HUGEINT % $M32) * $M32) % $M64"

  /** rotl64(x, r): the shifted-out high bits land in the (zeroed) low
    * bits, so the two parts are disjoint and + is |. */
  private def rotl(x: String, r: Int): String = {
    val hi = 1L << r
    val lo = BigInt(1) << (64 - r)
    s"((($x) * $hi::HUGEINT + ($x) // $lo::HUGEINT) % $M64)"
  }

  private def xor(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  private def shr(x: String, n: Int): String =
    s"(($x) // ${BigInt(1) << n}::HUGEINT)"

  private def add(a: String, b: String): String =
    s"((($a) + ($b)) % $M64)"

  /** One 8-byte-word XXH64 round: h ← rotl(h ⊕ rotl(w·P2,31)·P1, 27)·P1 + P4. */
  private def wordStep(h: String, w: String): String =
    add(mul(rotl(xor(h, mul(rotl(mul(w, P2), 31), P1)), 27), P1), P4)

  /** CTE chain `d(tok)` → `f3(tok, n, …, h)`; `h` is the UNSIGNED
    * xxhash64(tok, seed = 42) as HUGEINT. Verified byte-for-byte against
    * Spark on every fixture token and shingle (round 10). */
  def hashCtes: String = {
    val maxWords = 3
    val wcols = (0 until maxWords).map { k =>
      val terms = (0 until 8)
        .map(i => s"bs[${8 * k + i + 1}] * ${1L << (8 * i)}::HUGEINT")
        .mkString(" + ")
      s"CASE WHEN n >= ${8 * (k + 1)} THEN ($terms) ELSE 0::HUGEINT END AS w$k"
    }
    val fterms = (0 until 4)
      .map(i => s"bs[(n // 8) * 8 + ${i + 1}] * ${1L << (8 * i)}::HUGEINT")
      .mkString(" + ")
    val f4col =
      s"CASE WHEN n % 8 >= 4 THEN ($fterms) ELSE 0::HUGEINT END AS w4"
    // Tail bytes past the words and the optional 4-byte chunk; the tail
    // length is n%8−4 when a 4-byte chunk ran, n%8 otherwise — which is
    // n%4 in both regimes.
    val tcols = (0 until 3).map { i =>
      s"CASE WHEN n % 4 >= ${i + 1} THEN bs[(n // 8) * 8 + " +
        s"(CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + ${i + 1}] " +
        s"ELSE 0::HUGEINT END AS t$i"
    }
    val sb = new StringBuilder
    sb ++= s"""b AS (
      |  SELECT tok, n, ${(wcols :+ f4col).mkString(",\n    ")},
      |    ${tcols.mkString(",\n    ")}
      |  FROM (
      |    SELECT tok, octet_length(encode(tok)) AS n,
      |      list_transform(range(1, octet_length(encode(tok)) + 1),
      |        i -> ord(substr(tok, CAST(i AS INT), 1))::HUGEINT) AS bs
      |    FROM d)),
      |h0 AS (SELECT *, (42::HUGEINT + $P5 + n::HUGEINT) % $M64 AS h
      |  FROM b)""".stripMargin
    var prev = "h0"
    (0 until maxWords).foreach { k =>
      sb ++= s""",
        |hw$k AS (SELECT * REPLACE(
        |  CASE WHEN n >= ${8 * (k + 1)} THEN ${wordStep("h", s"w$k")}
        |  ELSE h END AS h) FROM $prev)""".stripMargin
      prev = s"hw$k"
    }
    val e4 = add(mul(rotl(xor("h", mul("w4", P1)), 23), P2), P3)
    sb ++= s""",
      |h4 AS (SELECT * REPLACE(
      |  CASE WHEN n % 8 >= 4 THEN $e4 ELSE h END AS h) FROM $prev)"""
      .stripMargin
    prev = "h4"
    (0 until 3).foreach { i =>
      val eb = mul(rotl(xor("h", mul(s"t$i", P5)), 11), P1)
      sb ++= s""",
        |hb$i AS (SELECT * REPLACE(
        |  CASE WHEN n % 4 >= ${i + 1} THEN $eb ELSE h END AS h)
        |  FROM $prev)""".stripMargin
      prev = s"hb$i"
    }
    sb ++= s""",
      |f1 AS (SELECT * REPLACE(${mul(xor("h", shr("h", 33)), P2)} AS h)
      |  FROM $prev),
      |f2 AS (SELECT * REPLACE(${mul(xor("h", shr("h", 29)), P3)} AS h)
      |  FROM f1),
      |f3 AS (SELECT * REPLACE(${xor("h", shr("h", 32))} AS h) FROM f2)"""
      .stripMargin
    sb.toString
  }

  /** Unsigned-HUGEINT → signed-BIGINT reinterpretation (two's
    * complement), for comparing against Spark's signed longs. */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808::HUGEINT " +
      s"THEN ($u) - $M64::HUGEINT ELSE ($u) END AS BIGINT)"

  /** Signed-BIGINT → unsigned-HUGEINT. */
  def toUnsigned(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN ($x)::HUGEINT + $M64::HUGEINT " +
      s"ELSE ($x)::HUGEINT END)"

  /** XXH64 of an EXACTLY-32-byte ASCII string (the md5-hex fingerprint
    * case, q_dedup_bloom): len = 32 triggers the STRIPE phase — one
    * 32-byte stripe through the four accumulators, merge, += 32,
    * avalanche; no tail. CTE chain `dfp(fp)` → `xf3(fp, h)`,
    * h unsigned. */
  def hash32ByteCtes: String = {
    val wcols = (0 until 4).map { k =>
      val terms = (0 until 8)
        .map(i => s"bs[${8 * k + i + 1}] * ${1L << (8 * i)}::HUGEINT")
        .mkString(" + ")
      s"($terms) AS w$k"
    }
    val inits = Seq(
      s"((42::HUGEINT + $P1 + $P2) % $M64)",
      s"((42::HUGEINT + $P2) % $M64)",
      "42::HUGEINT",
      s"((42::HUGEINT - $P1 + $M64) % $M64)")
    def vround(v: String, w: String) = mul(rotl(add(v, mul(w, P2)), 31), P1)
    val vcols = (0 until 4)
      .map(i => s"${vround(inits(i), s"w$i")} AS v$i").mkString(", ")
    val merged = add(add(add(rotl("v0", 1), rotl("v1", 7)),
      rotl("v2", 12)), rotl("v3", 18))
    val sb = new scala.collection.mutable.ListBuffer[String]
    sb += s"""xb AS (
      |  SELECT fp, ${wcols.mkString(",\n    ")} FROM (
      |    SELECT fp, list_transform(range(1, 33),
      |      i -> ord(substr(fp, CAST(i AS INT), 1))::HUGEINT) AS bs
      |    FROM dfp))""".stripMargin
    sb += s"xv AS (SELECT fp, $vcols FROM xb)"
    sb += s"xm0 AS (SELECT *, $merged AS h FROM xv)"
    var prev = "xm0"
    (0 until 4).foreach { i =>
      val k = mul(rotl(mul(s"v$i", P2), 31), P1)
      sb += s"xm${i + 1} AS (SELECT * REPLACE(" +
        s"${add(mul(xor("h", k), P1), P4)} AS h) FROM $prev)"
      prev = s"xm${i + 1}"
    }
    sb += s"xl AS (SELECT * REPLACE(${add("h", "32")} AS h) FROM $prev)"
    sb += s"xf1 AS (SELECT * REPLACE(" +
      s"${mul(xor("h", shr("h", 33)), P2)} AS h) FROM xl)"
    sb += s"xf2 AS (SELECT * REPLACE(" +
      s"${mul(xor("h", shr("h", 29)), P3)} AS h) FROM xf1)"
    sb += s"xf3 AS (SELECT fp, ${xor("h", shr("h", 32))} AS h FROM xf2)"
    sb.mkString(",\n")
  }

  /** XXH64 of a fixed sequence of fields from seed 42 — Spark's
    * multi-argument `xxhash64(lit(b), mh…)` chains the running hash as
    * the next field's seed, each field hashed with its width-specific
    * single-shot kernel (hashInt for a 4-byte int, hashLong for an
    * 8-byte long), avalanche included per field. Emitted as CTE stages
    * mapping a frame with state column `h` through one field each.
    *
    * `fields`: (columnExpr, isLong). Returns (ctes, lastCteName); the
    * input frame must be named by `prev` and carry all field columns
    * (stages propagate them with `* REPLACE`). */
  def chainCtes(tag: String, prev0: String,
      fields: Seq[(String, Boolean)]): (String, String) = {
    val sb = new scala.collection.mutable.ListBuffer[String]
    sb += s"${tag}s0 AS (SELECT *, 42::HUGEINT AS h FROM $prev0)"
    var prev = s"${tag}s0"
    fields.zipWithIndex.foreach { case ((field, isLong), idx) =>
      val t = s"$tag$idx"
      val e =
        if (isLong) {
          val k = mul(rotl(mul(s"($field)::HUGEINT", P2), 31), P1)
          add(mul(rotl(xor(add(add("h", P5), "8"), k), 27), P1), P4)
        } else
          add(mul(rotl(xor(add(add("h", P5), "4"),
            mul(s"($field)::HUGEINT", P1)), 23), P2), P3)
      sb += s"${t}a AS (SELECT * REPLACE($e AS h) FROM $prev)"
      sb += s"${t}f1 AS (SELECT * REPLACE(" +
        s"${mul(xor("h", shr("h", 33)), P2)} AS h) FROM ${t}a)"
      sb += s"${t}f2 AS (SELECT * REPLACE(" +
        s"${mul(xor("h", shr("h", 29)), P3)} AS h) FROM ${t}f1)"
      sb += s"${t}f3 AS (SELECT * REPLACE(" +
        s"${xor("h", shr("h", 32))} AS h) FROM ${t}f2)"
      prev = s"${t}f3"
    }
    (sb.mkString(",\n"), prev)
  }
}

/** DuckDB-SQL generator for the banded-MinHash pipeline's oracle twins —
  * the 3-token-shingle → xxhash64 → 16 permutation-minima → 4-band
  * signature chain of [[SimilarityQueries]]'s `bandRowsOf`, replayed in
  * exact integer arithmetic so the LSH dedup family hash-matches
  * (round 10; it was "rows-only by §2 design" for nine rounds, but the
  * pipeline is a DETERMINISTIC function of its fixed hash constants —
  * probabilistic RECALL is a property of the algorithm, not a barrier to
  * engine-exact replay).
  *
  * Heavy or multiply-referenced CTEs are declared MATERIALIZED: DuckDB
  * inlines plain CTEs per reference, which turns the label-propagation
  * rounds (two references to round k−1 each) into 2^k copies of the
  * whole pipeline — measured as a hang at sf0.01; materialization makes
  * the rounds linear. */
object LshSql {
  import XxHashSql.{hashCtes, toSigned, chainCtes}

  private val Prime = 2147483647L

  /** Shared CTE chain (no leading WITH): documents → `sarrs(doc_id,
    * sarr)` (distinct 3-shingle lists, ≥3-token docs) and
    * `sigs(doc_id, sig)` (4 band rows per doc, signed band signature) —
    * the exact frames Spark's staged LSH layout serves. */
  def prefix: String = {
    val (sigCtes, sigLast) = chainCtes("bs", "bandrows",
      ("band", false) +: (1 to 4).map(r => (s"m$r", true)))
    s"""docs0 AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sarrs AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sarr
      |  FROM docs0),
      |exp AS (SELECT doc_id, unnest(sarr) AS tok FROM sarrs),
      |d AS (SELECT DISTINCT tok FROM exp),
      |$hashCtes,
      |dochash AS (
      |  SELECT e.doc_id,
      |    ((${toSigned("f.h")} % $Prime) + $Prime) % $Prime AS hs
      |  FROM exp e JOIN f3 f USING (tok)),
      |mh AS (
      |  SELECT doc_id, g.i,
      |    min((hs * (2 * g.i + 1001) + (7919 * g.i + 131)) % $Prime) AS m
      |  FROM dochash, generate_series(0, 15) g(i)
      |  GROUP BY doc_id, g.i),
      |bandrows AS (
      |  SELECT doc_id, CAST(b.band AS INT) AS band,
      |    max(CASE WHEN i = b.band * 4 + 0 THEN m END) AS m1,
      |    max(CASE WHEN i = b.band * 4 + 1 THEN m END) AS m2,
      |    max(CASE WHEN i = b.band * 4 + 2 THEN m END) AS m3,
      |    max(CASE WHEN i = b.band * 4 + 3 THEN m END) AS m4
      |  FROM mh, generate_series(0, 3) b(band)
      |  WHERE i // 4 = b.band
      |  GROUP BY doc_id, b.band),
      |$sigCtes,
      |sigs AS MATERIALIZED (
      |  SELECT doc_id, ${toSigned("h")} AS sig FROM $sigLast)"""
      .stripMargin
  }

  /** Band-collision candidates verified by exact Jaccard (raw ≥ 0.5) —
    * `scored(d1, d2, common, jac)`, d1 < d2. */
  def scoredCtes: String =
    """cand AS (
      |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      |  FROM sigs x JOIN sigs y ON x.sig = y.sig AND x.doc_id < y.doc_id),
      |scored AS (
      |  SELECT c.d1, c.d2,
      |    CAST(len(list_intersect(a.sarr, b2.sarr)) AS BIGINT) AS common,
      |    CAST(len(list_intersect(a.sarr, b2.sarr)) AS DOUBLE)
      |      / (len(a.sarr) + len(b2.sarr)
      |         - len(list_intersect(a.sarr, b2.sarr))) AS jac
      |  FROM cand c
      |  JOIN sarrs a ON a.doc_id = c.d1
      |  JOIN sarrs b2 ON b2.doc_id = c.d2)""".stripMargin

  /** The ≥0.9 near-dup edge set (simPairsLsh's raw-0.5 prefilter + the
    * rounded 0.9 cut) plus `rounds` unrolled min-label-propagation
    * rounds over it: `l<rounds>(doc_id, lbl)` with lbl = min reachable
    * doc_id — GraphX connectedComponents' label contract. Convergence
    * needs rounds ≥ the min-id node's eccentricity per component; at the
    * 0.9-Jaccard regime components are near-cliques (measured: fixpoint
    * by round 3 at sf0.1), so 10 rounds is a wide margin.
    *
    * Convergence GUARD (round-10 advice): the unroll count is a
    * measured-fixpoint bet, and an unconverged run would otherwise
    * surface as an unattributed hash mismatch in whichever consumer
    * reads `l<rounds>`. So the consumer-facing `l<rounds>` CTE is a
    * guard over the raw final round: if ANY label still changed between
    * rounds `rounds−1` and `rounds` (i.e. the fixpoint was NOT reached
    * inside the unroll budget), every lbl is NULLed — the failure shows
    * up loudly as an all-NULL component column named by this guard, the
    * same fail-loud discipline as bloomTwinSql's NULL guard. */
  def ccCtes(rounds: Int): String = {
    require(rounds >= 1, s"ccCtes needs >= 1 round, got $rounds")
    val sb = new scala.collection.mutable.ListBuffer[String]
    sb += """edges AS (SELECT d1, d2 FROM scored
      |  WHERE jac >= 0.5 AND round(jac, 4) >= 0.9)""".stripMargin
    sb += """und AS MATERIALIZED (
      |  SELECT d1 AS a, d2 AS b FROM edges
      |  UNION ALL SELECT d2, d1 FROM edges)""".stripMargin
    sb += "l0 AS MATERIALIZED (SELECT doc_id, doc_id AS lbl FROM documents)"
    (1 to rounds).foreach { k =>
      val name = if (k == rounds) s"lraw$k" else s"l$k"
      sb += s"""$name AS MATERIALIZED (
        |  SELECT l.doc_id, least(l.lbl, coalesce(m.mn, l.lbl)) AS lbl
        |  FROM l${k - 1} l LEFT JOIN (
        |    SELECT u.a AS doc_id, min(p.lbl) AS mn
        |    FROM und u JOIN l${k - 1} p ON p.doc_id = u.b
        |    GROUP BY u.a) m ON m.doc_id = l.doc_id)""".stripMargin
    }
    sb += s"""l$rounds AS (
      |  SELECT l.doc_id,
      |    CASE WHEN chg.n > 0 THEN NULL ELSE l.lbl END AS lbl
      |  FROM lraw$rounds l CROSS JOIN (
      |    SELECT count(*) AS n
      |    FROM lraw$rounds a JOIN l${rounds - 1} b ON a.doc_id = b.doc_id
      |    WHERE a.lbl <> b.lbl) chg)""".stripMargin
    sb.mkString(",\n")
  }
}

/** Murmur3_x86_32 `hashLong` in DuckDB SQL — the hash behind Spark's
  * BloomFilterImplV2 bit scattering (q_dedup_bloom's twin, round 10).
  * All state is 32-bit wrapping: values carried as UNSIGNED 0..2³²−1
  * BIGINTs, multiplies through HUGEINT then mod 2³², rotations one
  * multiply + floor-div, XOR on BIGINT (sign-safe: operands < 2³²).
  * Position model verified against the real BloomFilterImplV2 via
  * reflection on its bit array (round 10): h1 = mm3(item, 0),
  * h2 = mm3(item, h1 signed), positions = (h1·(2³¹−1) + i·h2 flipped
  * non-negative) mod bitSize for i = 1..k — LONG arithmetic, bitSize
  * rounded up to a 64-bit word multiple. */
object Murmur3Sql {
  private val M32 = "4294967296"
  private val C1 = "3432918353" // 0xcc9e2d51
  private val C2 = "461845907" // 0x1b873593
  private val FA = "2246822507" // 0x85ebca6b
  private val FB = "3266489909" // 0xc2b2ae35
  private val AD = "3864292196" // 0xe6546b64

  private def m32(x: String, c: String): String =
    s"((($x)::HUGEINT * $c::HUGEINT) % $M32)"
  private def r32(x: String, r: Int): String =
    s"((($x) * ${1L << r} + ($x) // ${1L << (32 - r)}) % $M32)"
  private def x32(a: String, b: String): String =
    s"xor(CAST($a AS BIGINT), CAST($b AS BIGINT))"
  private def nn(x: String): String = s"((($x) % $M32 + $M32) % $M32)"

  /** Signed-int reinterpretation of an unsigned 32-bit BIGINT. */
  def toS32(u: String): String =
    s"(CASE WHEN ($u) >= 2147483648 THEN ($u) - $M32 ELSE ($u) END)"

  /** One `Murmur3_x86_32.hashLong(item, seed)` as staged CTEs over a
    * frame carrying `lo`/`hi` (the item's unsigned 32-bit halves).
    * `seedExpr` is the SIGNED seed; result lands unsigned in
    * `outCol`. */
  def hashLongCtes(tag: String, prev: String, seedExpr: String,
      outCol: String): (String, String) = {
    val o = new scala.collection.mutable.ListBuffer[String]
    o += s"${tag}a AS (SELECT *, CAST(" +
      s"${m32(r32(m32("lo", C1), 15), C2)} AS BIGINT) AS ${tag}k1 " +
      s"FROM $prev)"
    o += s"${tag}b AS (SELECT *, CAST(" +
      s"${r32(nn(x32(seedExpr, s"${tag}k1")), 13)} AS BIGINT) " +
      s"AS ${tag}hr FROM ${tag}a)"
    o += s"${tag}c AS (SELECT *, CAST(((${tag}hr * 5 + $AD) % $M32) " +
      s"AS BIGINT) AS ${tag}h1 FROM ${tag}b)"
    o += s"${tag}d AS (SELECT *, CAST(" +
      s"${m32(r32(m32("hi", C1), 15), C2)} AS BIGINT) AS ${tag}k2 " +
      s"FROM ${tag}c)"
    o += s"${tag}e AS (SELECT *, CAST(" +
      s"${r32(nn(x32(s"${tag}h1", s"${tag}k2")), 13)} AS BIGINT) " +
      s"AS ${tag}hr2 FROM ${tag}d)"
    o += s"${tag}f AS (SELECT *, CAST(((${tag}hr2 * 5 + $AD) % $M32) " +
      s"AS BIGINT) AS ${tag}hm FROM ${tag}e)"
    o += s"${tag}g AS (SELECT *, CAST(${nn(x32(s"${tag}hm", "8"))} " +
      s"AS BIGINT) AS ${tag}f0 FROM ${tag}f)"
    o += s"${tag}h AS (SELECT *, CAST(" +
      s"${m32(nn(x32(s"${tag}f0", s"${tag}f0 // 65536")), FA)} " +
      s"AS BIGINT) AS ${tag}fa FROM ${tag}g)"
    o += s"${tag}i AS (SELECT *, CAST(" +
      s"${m32(nn(x32(s"${tag}fa", s"${tag}fa // 8192")), FB)} " +
      s"AS BIGINT) AS ${tag}fb FROM ${tag}h)"
    o += s"${tag}j AS (SELECT *, CAST(" +
      s"${nn(x32(s"${tag}fb", s"${tag}fb // 65536"))} AS BIGINT) " +
      s"AS $outCol FROM ${tag}i)"
    (o.mkString(",\n"), s"${tag}j")
  }
}
