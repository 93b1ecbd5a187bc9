package graft.streaming

import org.apache.spark.sql.DataFrame

/** Scratch-directory hygiene for the self-contained streaming queries: each
  * run spools/checkpoints under a fresh java.io.tmpdir subdirectory, so
  * without cleanup repeated bench/verify runs accumulate unbounded temp
  * state. The result is eagerly materialized (localCheckpoint) BEFORE the
  * directory is deleted — the returned DataFrame reads block-manager
  * partitions, never the deleted files.
  */
object WorkDirs {

  /** Materialize `df` off its work directory, then delete the directory.
    * Partition order (and therefore a preceding orderBy) is preserved by
    * the checkpoint.
    */
  def materializeAndClean(df: DataFrame, workDir: String): DataFrame = {
    val out = df.localCheckpoint() // eager by default
    deleteRecursively(new java.io.File(workDir))
    out
  }

  def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)
}
