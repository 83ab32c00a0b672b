package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Stage-once bookkeeping for derived fixture/layout directories.
  *
  * A staged dir is valid when its `_GRAFT_STAGED` marker exists and the
  * recorded payload matches — the marker is written LAST, so a stage
  * killed mid-write is restaged, never reused. The payload embeds a
  * fingerprint (name, length, modtime per file) of the SOURCE inputs the
  * staging was derived from, so regenerating an input invalidates every
  * layout staged off it. This is the cheap, scheme-portable version of a
  * warehouse's ingest watermark: listing metadata only, no data pass.
  */
object Staging {

  val MarkerName = "_GRAFT_STAGED"

  /** Listing fingerprint of `sources` (files or directories). */
  def fingerprint(s: SparkSession, sources: Seq[String]): String =
    sources.sorted.map { src =>
      val p = new Path(src)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.sortBy(_.getPath.getName)
        .map(f => s"${f.getPath.getName}:${f.getLen}:" +
          s"${f.getModificationTime}")
        .mkString(s"$src[", ",", "]")
    }.mkString(";")

  /** The marker payload for `dir`, if a complete stage exists. */
  def readMarker(s: SparkSession, dir: String): Option[String] = {
    val m = new Path(dir, MarkerName)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Write the marker LAST, after the staged payload is complete. */
  def markStaged(s: SparkSession, dir: String, payload: String): Unit = {
    val m = new Path(dir, MarkerName)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(m, true)
    try out.write(payload.getBytes("UTF-8"))
    finally out.close()
  }
}
