package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]]) handles
  * most runtime skew; these operators are the PLANNED variants for when
  * key skew is known up front — e.g. a grouping key where one value holds
  * half of a 100 TB table, which otherwise funnels into one reducer task
  * exactly like the reference's single-reducer aggregation cliff
  * (SURVEY §4; `numReduceTasks` never set, src/Kmeans.java:137-160).
  */
object Skew {

  /** Two-phase salted aggregation: count/sum per (key, salt) first — the
    * heavy key fans out over `salt` reducer tasks — then re-aggregate by
    * key. The salt is derived from a unique column (deterministic, no
    * rand(): re-execution of a failed task must salt identically or
    * results double-count under speculative execution).
    */
  def saltedAgg(df: DataFrame, key: String, uniqueCol: String, salt: Int,
                aggs: (Column, String)*): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(salt)))
    val phase1 = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"),
        aggs.map { case (c, n) => sum(c).as(s"_sum_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(sum("_cnt").as("n"),
        aggs.map { case (_, n) => sum(s"_sum_$n").as(n) }: _*)
  }

  /** Salted count per key — the common case. */
  def saltedCount(df: DataFrame, key: String, uniqueCol: String,
                  salt: Int = 16): DataFrame =
    saltedAgg(df, key, uniqueCol, salt)
      .select(col(key), col("n"))
}
