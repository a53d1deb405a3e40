package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the t2 correctness corpus: one entry per operator declared
  * in SURVEY.md §2B; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible entry (hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.defs("q1_agg")(spark, "/root/testdata/sf0.001")

  private val defGroups: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(RelationalQueries.defs, SubqueryQueries.defs, JoinQueries.defs,
      FlagshipQueries.defs, TpchQueries.defs, AggQueries.defs,
      WindowQueries.defs, ScalarQueries.defs, StatsQueries.defs,
      TextMetricsQueries.defs, FuzzQueries.defs, KMeansQueries.defs,
      PipelineQueries.defs, DocStructQueries.defs, CurationQueries.defs,
      GraphQueries.defs, FunnelQueries.defs, StreamQueries.defs)

  /** Merge the group maps, REQUIRING disjoint names. The check is
    * load-bearing: `++` over maps is latest-wins, so a name accidentally
    * declared in two groups would silently REPLACE the earlier row — the
    * corpus would shrink by one and nothing would fail (round 15 caught
    * exactly this: a second `q_decontaminate` shadowed the existing
    * curation row until a count diff surfaced it). A duplicate now names
    * itself at first touch.
    */
  private def disjointUnion[V](groups: Seq[Map[String, V]],
                               what: String): Map[String, V] = {
    val dup = groups.flatMap(_.keys)
      .groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    require(dup.isEmpty,
      s"$what name(s) declared in more than one group: ${dup.mkString(", ")}")
    groups.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. lazy val:
    * every suite, Verify, and Bench read this — the 18-map merge and the
    * duplicate scan run once, not per call.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    disjointUnion(defGroups, "query")

  private val oracleGroups: Seq[Map[String, String]] =
    Seq(RelationalQueries.oracles, SubqueryQueries.oracles,
      JoinQueries.oracles, FlagshipQueries.oracles, TpchQueries.oracles,
      AggQueries.oracles, WindowQueries.oracles, ScalarQueries.oracles,
      StatsQueries.oracles, TextMetricsQueries.oracles, FuzzQueries.oracles,
      KMeansQueries.oracles, PipelineQueries.oracles, DocStructQueries.oracles,
      CurationQueries.oracles, GraphQueries.oracles, FunnelQueries.oracles,
      StreamQueries.oracles)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). Same
    * disjointness contract as [[queries]].
    */
  lazy val oracleSql: Map[String, String] =
    disjointUnion(oracleGroups, "oracle")
}
