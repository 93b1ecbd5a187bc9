package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Bucketed (co-located) tables — the pre-shuffle join layout the 100-TB
  * design contract calls for ("bucketing for co-located joins"): writing
  * both join sides bucketed and sorted on the join key lets a sort-merge
  * join read bucket-aligned files with NO exchange on either side — at
  * cluster scale that removes the dominant shuffle of every fact-to-fact
  * join on the same key.
  */
object Bucketing {

  /** Write `table` as an external bucketed+sorted table (idempotent per
    * session) and return its catalog name.
    */
  def ensureBucketed(spark: SparkSession, dir: String, table: String,
      key: String, buckets: Int): String = {
    // table identity = source content fingerprint, so sf0.01/sf0.1 never
    // collide and a regenerated dataset gets a fresh layout
    val name = s"graft_b_${table}_${buckets}_${Tables.fingerprint(dir, table)}"
    if (!spark.catalog.tableExists(name)) {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-bucketed/$name").getAbsolutePath
      Tables.t(spark, dir, table)
        .write
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    }
    name
  }
}
