package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Batch source/sink format coverage (SURVEY §2.1 extension rows): CSV and
  * JSON round-trips, and a hive-partitioned parquet sink whose layout
  * enables partition pruning on read-back.
  *
  * The reference's only I/O is Kafka bytes in/out (/root/reference/
  * main.py:80-108); these are the BASELINE.json batch-source mandate. Each
  * query WRITES the format to a scratch dir and reads it back, so the
  * oracle (which reads the original parquet) certifies full round-trip
  * fidelity — schema, values, and doubles surviving text encoding
  * (Spark's shortest-round-trip double formatting).
  *
  * Scale notes: text formats are the interchange path, not the analytics
  * path — no column pruning, no predicate pushdown, no row-group skipping;
  * `q_sink_partitioned` is the pattern that matters at 100 TB (write
  * partitioned-by-key parquet; readers that filter on the key scan only
  * matching directories — assert in PlanShapeSpec).
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_csv"         -> scanCsv _,
    "q_scan_csv_corrupt" -> scanCsvCorrupt _,
    "q_scan_json"        -> scanJson _,
    "q_scan_orc"         -> scanOrc _,
    "q_scan_evolving"    -> scanEvolving _,
    "q_scan_jdbc"        -> scanJdbc _,
    "q_scan_xml"         -> scanXml _,
    "q_scan_binaryfile"  -> scanBinaryFile _,
    "q_scan_text"        -> scanText _,
    "q_sink_partitioned" -> sinkPartitioned _
  )

  val oracle: Map[String, String] = Map(
    "q_scan_csv" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_scan_json" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    // The twin never parses the CSV: it re-derives each row's verdict
    // from the planted doc_id % 37 rule over the clean table.
    "q_scan_csv_corrupt" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (doc_id % 37 = 0) AS BIGINT) AS n_bad,
        |  CAST(count(*) FILTER (doc_id % 37 <> 0) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN doc_id % 37 <> 0 THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS chars_good
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // The round-trip re-derives (length, md5) from the re-read text; the
    // oracle computes both from the source table directly, so any
    // corruption in the line encode/parse fails the hash.
    "q_scan_text" ->
      """SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars_rt,
        |  md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scan_orc" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scan_jdbc" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scan_xml" ->
      """SELECT p_partkey, p_name, p_type, p_size
        |FROM part ORDER BY p_partkey""".stripMargin,
    // Byte length via the encoding-explicit octet_length(encode(·)) —
    // equal to len(text) only while texts are ASCII, and still correct if
    // a non-ASCII document ever enters the fixture. md5 hashes the UTF-8
    // bytes in both engines.
    "q_scan_binaryfile" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // v1 (even ids) lacks n_chars; the merged read null-extends it.
    "q_scan_evolving" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE NULL END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sink_partitioned" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin
  )

  /** Scratch dir keyed by scale-factor dir name: warmup (sf0.001) and the
    * timed/verified run (sf0.01/0.1) never collide. Shared by every
    * query that stages files (stream replays, foreachBatch sink) so a
    * root/keying change happens in exactly one place. */
  private[graft] def scratch(d: String, name: String): String =
    s"/tmp/graft-io/${new java.io.File(d).getName}/$name"

  /** Scale-factor dir name as an identifier fragment — for artifacts
    * keyed by SF in namespaces that only accept [A-Za-z0-9_] (table
    * names; test miniDirs carry hyphens/timestamps, not just sf dots). */
  private[graft] def sfName(d: String): String =
    new java.io.File(d).getName.replaceAll("[^A-Za-z0-9_]", "_")

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  /** CSV round-trip of the nation table: write with header, read back with
    * an explicit schema (inference is a second full pass and can drift —
    * never used in declared queries). */
  def scanCsv(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "nation_csv")
    Tables.nation(s, d).write.mode("overwrite")
      .option("header", "true").csv(dir)
    s.read.schema(nationSchema).option("header", "true").csv(dir)
      .orderBy("n_nationkey")
  }

  /** Malformed-record ingestion policy: a CSV with deterministically
    * planted bad rows (every doc_id % 37 = 0 carries a non-numeric
    * count field) read back in PERMISSIVE mode with a
    * `_corrupt_record` capture column, audited per language —
    * [[scanCsv]] proves the happy path; production CSV is never clean,
    * and the operational question is "how much quarantines, what
    * survives?".
    *
    * The oracle never parses the CSV: it re-derives each row's verdict
    * from the SAME planted rule over the clean table, so the Spark side
    * genuinely exercises the PERMISSIVE parser (bad field → null
    * columns + raw line captured) while the twin certifies the
    * row-level outcome. Malformed rows keep a parseable doc_id/lang
    * (only the count field is broken), so the per-language attribution
    * of bad rows is well-defined in both engines. */
  def scanCsvCorrupt(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "documents_dirty_csv")
    Tables.documents(s, d)
      .select(concat(
        col("doc_id"), lit(","), col("lang"), lit(","),
        when(col("doc_id") % 37 === 0, concat(lit("x"), col("n_chars")))
          .otherwise(col("n_chars").cast("string"))).as("value"))
      .write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_rows"),
        count_if(col("_corrupt_record").isNotNull).as("n_bad"),
        count_if(col("_corrupt_record").isNull).as("n_good"),
        sum(when(col("_corrupt_record").isNull, col("n_chars"))
          .otherwise(lit(0L))).as("chars_good"))
      .orderBy("lang")
  }

  /** JSON-lines round-trip of the supplier table; doubles survive exactly
    * (shortest-round-trip formatting on write, exact parse on read). */
  def scanJson(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "supplier_json")
    Tables.supplier(s, d).write.mode("overwrite").json(dir)
    s.read.schema(supplierSchema).json(dir)
      .orderBy("s_suppkey")
  }

  /** Raw-text round-trip of the documents corpus — `spark.read.text`,
    * the rawest ingest format an LLM corpus arrives in (one record per
    * line). Each line is `id<TAB>text`; the read-back parses the id off
    * the first tab and re-derives (char length, md5) per document, which
    * the oracle computes from the source table directly — any encode or
    * parse corruption fails the hash compare. The fixture's texts are
    * single-line and tab-free (space-separated words); a corpus that is
    * not line-safe ships as JSONL instead (`q_scan_json` covers the
    * escaping path). That precondition is ASSERTED at write time: a text
    * containing tab/CR/LF raises in the write scan (codegen'd
    * `raise_error` branch, no extra pass), so a regenerated fixture that
    * breaks line-safety fails loudly with the offending doc_id instead
    * of surfacing as a downstream hash mismatch from silently split
    * lines / null ids. Write and read are both distributed — no driver
    * staging. */
  def scanText(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "docs_text")
    Tables.documents(s, d)
      .select(when(col("text").rlike("[\t\r\n]"),
          raise_error(concat(lit("q_scan_text: doc_id "),
            col("doc_id").cast("string"),
            lit(" contains tab/CR/LF — id<TAB>text lines are not " +
              "round-trip-safe for this corpus; ship it as JSONL"))))
        .otherwise(concat(col("doc_id").cast("string"), lit("\t"),
          col("text"))).as("value"))
      .write.mode("overwrite").text(dir)
    s.read.text(dir)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("text"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_rt"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** ORC round-trip of a part projection: the second columnar format
    * (built into Spark; predicate pushdown + column pruning work the same
    * way as parquet). The oracle reads the original parquet, so the
    * round-trip certifies value fidelity across the format boundary —
    * including doubles, which ORC stores natively (no text encoding). */
  def scanOrc(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "part_orc")
    Tables.part(s, d)
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir).orderBy("p_partkey")
  }

  /** JDBC round-trip through an embedded Derby database — the relational
    * source/sink family (the classic dimension-table ingest: operational
    * DB → lake). The write is Spark's JDBC sink; the read-back uses a
    * PARTITIONED JDBC read (partitionColumn/numPartitions/bounds), the
    * pattern that parallelizes a production ingest across executors —
    * each partition issues its own bounded query. Rows outside the
    * hardcoded bounds land in the edge partitions, so the bounds affect
    * only balance, never correctness. Doubles survive exactly (DOUBLE
    * PRECISION both ways). */
  def scanJdbc(s: SparkSession, d: String): DataFrame = {
    // Derby writes its log to user.dir unless redirected.
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val dbDir = scratch(d, "jdbc_derby")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    // Stage-once (fingerprint marker in a SIBLING dir — Derby owns its
    // own directory's contents): the operational DB is a fixture derived
    // from customer.parquet; the measured operator is the partitioned
    // read below. A previous JVM's unclean exit is fine — Derby replays
    // its transaction log on boot.
    val fp = Staging.fingerprint(s, Seq(s"$d/customer.parquet"))
    if (!Staging.readMarker(s, s"${dbDir}_mark").contains(fp)) {
      val p = new org.apache.hadoop.fs.Path(dbDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // Derby keeps a database BOOTED in the JVM after its connections
      // close; deleting the live instance's files (a rerun in the same
      // session) would leave writes landing in unlinked inodes. Shut it
      // down first — a successful shutdown always "fails" with SQLState
      // 08006, which is the expected handshake, and XJ004 means the
      // database was never booted in this JVM.
      try java.sql.DriverManager.getConnection(
        s"jdbc:derby:$dbDir;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      if (fs.exists(p)) fs.delete(p, true)
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").jdbc(url, "customer_jdbc", props)
      Staging.markStaged(s, s"${dbDir}_mark", fp)
    }
    s.read
      .option("partitionColumn", "c_custkey")
      .option("numPartitions", "4")
      .option("lowerBound", "0")
      .option("upperBound", "1000000")
      .jdbc(url, "customer_jdbc", props)
      .orderBy("c_custkey")
  }

  /** XML round-trip of a part projection (Spark 4's built-in XML source —
    * the fourth text/interchange format after CSV/JSON, the one document
    * feeds still arrive in). Explicit schema on read-back, like the
    * other text formats: inference is a second pass and can drift.
    * Integer/string columns only — XML is an interchange format here,
    * not a numeric-fidelity path. */
  def scanXml(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "part_xml")
    Tables.part(s, d)
      .select("p_partkey", "p_name", "p_type", "p_size")
      .write.mode("overwrite")
      .option("rootTag", "parts").option("rowTag", "part")
      .xml(dir)
    s.read.schema(StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_name", StringType),
        StructField("p_type", StringType),
        StructField("p_size", IntegerType))))
      .option("rowTag", "part")
      .xml(dir)
      .orderBy("p_partkey")
  }

  /** Raw-file ingest through the `binaryFile` source — the entry point of
    * every image/audio/video pipeline (MediaOps consumes the binary
    * column this produces): one row per file with (path, modTime,
    * length, content). The fixture stages the first 100 documents' texts
    * as .bin files; doc identity is recovered from the file name and the
    * payload certified by md5 against the source table. At 100 TB this
    * source partitions by file, so a million-object corpus scans
    * embarrassingly parallel; `pathGlobFilter`/`recursiveFileLookup`
    * prune at listing time. */
  def scanBinaryFile(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "docs_bin")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // Stage-once (fingerprint-guarded, marker written last): the .bin
    // corpus is a FIXTURE derived from documents.parquet — the measured
    // operator is the binaryFile read below, and a media corpus isn't
    // re-materialized per scan. A killed mid-stage run or a regenerated
    // source forces a restage.
    val fp = Staging.fingerprint(s, Seq(s"$d/documents.parquet"))
    if (!Staging.readMarker(s, dir).contains(fp)) {
      stageBinaryCorpus(s, d, dir, p, fs)
      Staging.markStaged(s, dir, fp)
    }
    readBinaryCorpus(s, d, dir)
  }

  private def stageBinaryCorpus(s: SparkSession, d: String, dir: String,
      p: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    // Executor-side fan-out is only correct when every executor and the
    // driver's listing see ONE filesystem. A `file:` scratch path on a
    // multi-node cluster would scatter the .bin files across executor
    // local disks where the binaryFile listing can't find them — fail
    // loudly instead of silently staging a partial corpus. (Object-store
    // and HDFS schemes are shared by construction.)
    val scheme = fs.getUri.getScheme
    require(s.sparkContext.isLocal || (scheme != null && scheme != "file"),
      s"binaryFile staging dir $dir resolves to the local filesystem; " +
        "on a cluster, point the scratch root at a shared scheme " +
        "(hdfs/s3a/...) so executor-written files are visible to the read")
    // Stage: one .bin per document, written FROM THE EXECUTORS — each
    // partition opens its own FileSystem and streams its rows out, so the
    // staging pattern is the one a real media ingest scales with (a
    // million objects fan out across the cluster; the driver never holds
    // a row). File names carry the doc identity, like any object-store
    // media corpus. The SESSION's Hadoop conf rides along in a broadcast
    // (spark.hadoop.* settings, filesystem credentials, fs.defaultFS) —
    // a fresh Configuration() on the executor would silently drop all of
    // them and resolve the path against executor-local defaults.
    val confBc = s.sparkContext.broadcast(
      new SerializableHadoopConf(s.sparkContext.hadoopConfiguration))
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select("doc_id", "text")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val base = new org.apache.hadoop.fs.Path(dir)
          val pfs = base.getFileSystem(confBc.value.conf)
          it.foreach { r =>
            val out = pfs.create(
              new org.apache.hadoop.fs.Path(base, s"${r.getLong(0)}.bin"))
            try out.write(r.getString(1).getBytes("UTF-8"))
            finally out.close()
          }
        }
      }
  }

  private def readBinaryCorpus(s: SparkSession, d: String,
      dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

  /** Schema evolution across file generations — the drift every long-lived
    * 100 TB table accumulates: generation v1 (even doc_ids) was written
    * before `n_chars` existed, v2 (odd doc_ids) carries it. A
    * `mergeSchema` read reconciles the generations into the union schema,
    * null-extending v1 — certified by the oracle's CASE twin. (mergeSchema
    * is a footer-only pass at planning time; per-file projection adapts
    * at scan, no data rewrite.) */
  def scanEvolving(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "documents_evolving")
    val docs = Tables.documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$base/v1")
    docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$base/v2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$base/v1", s"$base/v2")
      .orderBy("doc_id")
  }

  /** Hive-partitioned parquet sink: documents written partitioned by lang,
    * read back through the partition-discovery path and re-aggregated.
    * A reader filtering on `lang` scans only that directory (partition
    * pruning — PlanShapeSpec asserts PartitionFilters). */
  def sinkPartitioned(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "documents_by_lang")
    val docs = Tables.documents(s, d)
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    // Explicit schema on the read-back: an EMPTY corpus writes no data
    // files and schema inference would fail — a sink round-trip must
    // degrade to zero rows, not an AnalysisException (EmptyInputSpec).
    s.read.schema(docs.schema).parquet(dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .orderBy("lang", "source")
  }
}

/** Serializable carrier for a Hadoop `Configuration` (which is Writable
  * but not Serializable): the standard pattern for shipping the SESSION's
  * Hadoop conf — spark.hadoop.* overrides, filesystem credentials,
  * fs.defaultFS — into executor-side closures instead of losing them to a
  * fresh `new Configuration()`. Java-serialization hooks delegate to the
  * Writable round-trip. */
private[sources] class SerializableHadoopConf(
    @transient var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}
