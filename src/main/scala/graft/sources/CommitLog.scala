package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The on-disk commit-log format shared by
  * [[graft.streaming.LayoutSink]] (its writer) and [[ZOrder.optimize]]
  * (which must respect the log when it rewrites a sink-managed lake —
  * an OPTIMIZE that read the plain directory would bake a crashed
  * ingest attempt's uncommitted orphans in as committed data, and the
  * replay of that batch would then land its rows twice).
  *
  * One manifest per committed batch at
  * `lakeDir/_graft_log/<batchId>.manifest`, each listing the data-file
  * names that batch added (newline-separated); bootstrap manifest `-1`
  * grandfathers files that predate the log. Manifests are IMMUTABLE
  * once published (write-then-atomic-rename, never rewritten in
  * place) — the property the parse cache below relies on. */
object CommitLog {

  def logDir(lakeDir: String): String = s"$lakeDir/_graft_log"

  def manifestPath(lakeDir: String, batchId: Long): Path =
    new Path(logDir(lakeDir), s"$batchId.manifest")

  /** Flat `*.parquet` names under the lake (the sink writes flat;
    * `_`/`.` prefixes — the log itself, Spark markers — excluded). */
  def dataFileNames(fs: FileSystem, lakeDir: String): Set[String] = {
    val dir = new Path(lakeDir)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith(".")).toSet
  }

  /** Manifest parse cache, keyed by (path, length, modTime): published
    * manifests never change, so a hit is always valid (a same-named
    * manifest recreated after an OPTIMIZE swap gets a fresh
    * length/modTime and misses). Without this, every micro-batch
    * re-opens every manifest ever written — O(batches) opens per
    * batch, quadratic I/O over an ingest's life (thousands of
    * object-store GET round-trips per batch by batch 10k). With it,
    * per batch = one log-dir listing + opens for only manifests added
    * since the last batch. The listing itself stays O(#manifests);
    * manifest compaction into a checkpoint file (what Delta does) is
    * the next step if that listing ever dominates. */
  private val manifestCache =
    new ConcurrentHashMap[(String, Long, Long), Seq[String]]()

  /** Union of every manifest's file list. */
  def committedNames(fs: FileSystem, lakeDir: String): Set[String] = {
    val log = new Path(logDir(lakeDir))
    if (!fs.exists(log)) return Set.empty
    fs.listStatus(log).iterator
      .filter(_.getPath.getName.endsWith(".manifest"))
      .flatMap { m =>
        val key = (m.getPath.toString, m.getLen, m.getModificationTime)
        var cached = manifestCache.get(key)
        if (cached == null) {
          val in = fs.open(m.getPath)
          try {
            val bytes = new Array[Byte](m.getLen.toInt)
            in.readFully(0, bytes)
            cached = new String(bytes, UTF_8).split("\n").iterator
              .map(_.trim).filter(_.nonEmpty).toSeq
          } finally in.close()
          manifestCache.put(key, cached)
        }
        cached
      }.toSet
  }

  /** Batch ids with a published manifest (includes bootstrap −1). */
  def batchIds(fs: FileSystem, lakeDir: String): Seq[Long] = {
    val log = new Path(logDir(lakeDir))
    if (!fs.exists(log)) return Seq.empty
    fs.listStatus(log).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong).toSeq.sorted
  }

  /** Write-then-rename commit: the manifest appears atomically or not
    * at all (a crashed half-written `.tmp-` never matches the
    * `.manifest` suffix readers look for). */
  def commit(fs: FileSystem, lakeDir: String, batchId: Long,
      files: Seq[String]): Unit = {
    val log = new Path(logDir(lakeDir))
    fs.mkdirs(log)
    val tmp = new Path(log,
      s".tmp-$batchId-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(UTF_8))
    finally out.close()
    val dst = manifestPath(lakeDir, batchId)
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      require(fs.exists(dst),
        s"commit: could not publish manifest for batch $batchId")
    }
  }
}
