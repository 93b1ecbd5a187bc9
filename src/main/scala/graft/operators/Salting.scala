package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the salting pattern the 100-TB
  * design contract calls for (builder prompt: "skewed keys → salting or
  * AQE skew-join"). AQE's skew-join handles sort-merge skew adaptively;
  * explicit salting is the deterministic fallback when one key dominates a
  * hash-partitioned join (e.g. one coin with 90% of ticks).
  *
  * The large side gets a salt derived from a row-identifying column (NOT
  * rand() — results must be reproducible under retries, SURVEY §5); the
  * small side is exploded across all salt values, so (key, salt) spreads
  * the hot key over `saltFactor` reducers. Result set is provably equal to
  * the unsalted join (SaltingSpec).
  */
object Salting {

  /** Inner equi-join of `large` and `small` on `key`, with the large side
    * salted by `saltFactor` using `rowIdCol` as the deterministic salt
    * source.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      rowIdCol: String, saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(col(rowIdCol)), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-k heavy keys with their share — the diagnostic that decides
    * whether to salt (run it on a sample at scale).
    */
  def keySkewProfile(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(k)
  }
}
