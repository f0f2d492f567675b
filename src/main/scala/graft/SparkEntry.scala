package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is registered here as a named query with a DuckDB oracle.
  */
object SparkEntry {

  /** Query packs, one per operator family. */
  val packs: Seq[QueryPack] = Seq(
    CoreQueries, OpsQueries, SarPipelineQueries, LlmQueries, VectorQueries,
    GovernanceQueries, CorpusQueries)

  lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. (lazy val so
    * Bench's per-query lookups don't rebuild the map inside timing.) */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
