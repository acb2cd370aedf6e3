package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration

/** The ONE vetted way to ship the session's Hadoop configuration to
  * executor-side metadata readers (the distributed parquet-footer
  * scans in [[StatsIndex]] and [[ColumnMapping]]). Executors opening
  * files directly through `ParquetFileReader` bypass Spark's own conf
  * propagation, and a fresh `new Configuration()` there would only
  * ever resolve local/default filesystems — so the filesystem-relevant
  * entries must travel with the task.
  *
  * FILTERED, not wholesale (ADVICE r13): the session conf also holds
  * scheduler/RPC/credential-provider entries that a footer probe has
  * no business broadcasting on every call; only the key families a
  * `FileSystem.get` + parquet footer read can consult are shipped —
  * filesystem bindings and credentials (`fs.*`, including every
  * object-store connector's `fs.s3a.* / fs.azure.* / fs.gs.*`
  * namespaces), HDFS client/HA settings (`dfs.*`), Hadoop security
  * and proxy plumbing (`hadoop.*`), IO codecs and buffer sizing
  * (`io.*`), parquet reader knobs (`parquet.*`), viewfs mount tables
  * (`viewfs.*`), and the GCS connector's legacy `google.*` keys.
  * Both call sites broadcast ONE array per job, so the filter also
  * bounds what a task-serialization capture could ever replay. */
private[sources] object FsConfShip {

  /** Prefix allowlist — the families a filesystem open / footer read
    * resolves. Deliberately conservative-inclusive: an unnecessary
    * `io.*` key costs bytes; a missing `fs.*` key costs correctness
    * (an executor that cannot resolve the store at all). */
  private val Shipped: Seq[String] = Seq(
    "fs.", "dfs.", "hadoop.", "io.", "parquet.", "viewfs.", "google.",
    // the HDFS client's RPC plumbing: connection/retry tuning and
    // payload caps (ipc.*) and NameNode-HA failover proxies (ha.*)
    // are consulted by DistributedFileSystem opens — dropping them
    // would silently revert executors to code defaults
    "ipc.", "ha.")

  /** The shippable entries of `conf` — broadcast this (plain strings,
    * small, kryo-friendly), then [[rebuild]] per partition. */
  def entries(conf: Configuration): Array[(String, String)] =
    conf.iterator().asScala.map(e => (e.getKey, e.getValue))
      .filter { case (k, _) => Shipped.exists(k.startsWith) }
      .toArray

  /** Executor side: a Configuration seeded ONLY from the shipped
    * entries (`loadDefaults = false` — the defaults that matter, e.g.
    * `fs.file.impl`, ride along in the entries themselves, captured
    * from the driver's fully-resolved view). */
  def rebuild(shipped: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    shipped.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
