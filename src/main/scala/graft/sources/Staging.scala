package graft.sources

/** Cross-process-safe one-time staging for the fingerprint-keyed
  * corpus dirs under java.io.tmpdir. The old pattern (`synchronized` +
  * `_SUCCESS` re-check, then write directly into the final path) is
  * sound per-JVM but two JVMs (driver + judge have raced this) could
  * both enter the overwrite write and interleave part files. Here each
  * writer builds under a process-unique sibling and atomically renames
  * into place; the loser of the race deletes its build — the corpora
  * are deterministic functions of the fingerprinted inputs, so
  * whichever rename wins is byte-equivalent.
  */
object Staging {

  private def hadoopConf =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** `_SUCCESS` completeness probe through the Hadoop FileSystem API —
    * the same resolver the parquet writers use, so the probe agrees
    * with the committer on any configured filesystem (a `java.io.File`
    * probe silently reports "missing" for every non-local path, which
    * would make [[stageOnce]] rebuild on every call). */
  def hasMarker(path: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    marker.getFileSystem(hadoopConf).isFile(marker)
  }

  /** Touch the `_SUCCESS` marker under `path` — for staging writers
    * whose last step is not a Spark committer (which writes its own). */
  def touchMarker(path: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    marker.getFileSystem(hadoopConf).create(marker, true).close()
  }

  /** Create a temp work dir that is deleted when this JVM exits.
    * Streaming query entries return lazy DataFrames over their output
    * dirs, so an eager `finally`-delete would break the caller's read;
    * a shutdown hook bounds /tmp accumulation to one JVM's lifetime
    * instead (bench/verify spawn a fresh JVM per run).
    */
  def sessionTempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.hadoop.fs.FileUtil.fullyDelete(dir)))
    dir.toString
  }

  /** Run `write(tmpDir)` and atomically publish the result as `path`,
    * unless `path` is already complete. `write` must leave a
    * `_SUCCESS` marker in its output (Spark's parquet committer does).
    */
  def stageOnce(path: String)(write: String => Unit): Unit = {
    if (hasMarker(path)) return
    val tmp = path + ".tmp-" + ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    write(tmp)
    try
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // another process published first (EEXIST/ENOTEMPTY surface as
      // these); its output is identical — drop ours. But the same
      // exception types also cover genuine failures (permissions, I/O,
      // ATOMIC_MOVE unsupported), so only swallow when the destination
      // was actually published by the winner.
      case e @ (_: java.nio.file.FileAlreadyExistsException
             | _: java.nio.file.DirectoryNotEmptyException
             | _: java.nio.file.FileSystemException) =>
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
        if (!hasMarker(path)) throw e
    }
  }
}
