package graft.operators

import org.apache.spark.sql.SparkSession

/** Filesystem-agnostic existence probe for persisted serving-state
  * directories (bm25 / dsir / overlap / hll sinks and their RTBF
  * tombstone + purge namespaces).
  *
  * At production scale the state dirs live on whatever Hadoop filesystem
  * the cluster mounts — HDFS, S3A, GCS, or local — and
  * `java.io.File.exists` answers a bare `false` for every non-local URI.
  * A serve path probing optional state that way would silently treat
  * EXISTING tombstones or purge epochs as absent and serve stale
  * (pre-purge) or empty results, with nothing thrown anywhere. Probes
  * therefore resolve the Path's own FileSystem from the session's Hadoop
  * configuration — the same resolution the `spark.read.parquet` call that
  * follows them uses, so probe and read can never disagree about what
  * filesystem they are looking at. */
object StatePath {
  def exists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }
}
