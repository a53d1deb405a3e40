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

  /** Salted equi-join for a fact table with known heavy-hitter join
    * keys where the build side is too large to broadcast (AQE's skew
    * split only re-chunks the probe side of a sort-merge join; when one
    * key's build rows themselves overflow a task, salting is the
    * planned fix). Each fact row gets a deterministic salt in
    * [0, salt); the build side is replicated once per salt value; the
    * join key becomes (key, _salt), so a hot key's probe rows spread
    * over `salt` reducer tasks, each meeting a full copy of that key's
    * build rows. Row-for-row equivalent to `fact.join(dim, key,
    * joinType)`: a fact row lands in exactly one salt bucket and meets
    * each matching dim row exactly once there.
    *
    * The salt is derived from a unique fact column (never rand():
    * speculative re-execution must salt identically or rows
    * double-count). Build-side cost is salt× replication — size `salt`
    * to the skew factor, not the cluster.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 uniqueCol: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column")
    val f = fact.withColumn("_salt",
      pmod(xxhash64(col(uniqueCol)), lit(salt.toLong)))
    val d = dim.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
