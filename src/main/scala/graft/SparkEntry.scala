package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** The single source of truth for the query families — `queries` and
    * `oracleSql` both fold over it, and the contract spec iterates the
    * SAME value, so a new family cannot be registered in one place and
    * silently missed in another.
    */
  val families: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (DedupQueries.queries, DedupQueries.oracle),
    (SimilarityQueries.queries, SimilarityQueries.oracle),
    (PreludeQueries.queries, PreludeQueries.oracle),
    (AudioQueries.queries, AudioQueries.oracle),
    (OpsQueries.queries, OpsQueries.oracle),
    (GraphQueries.queries, GraphQueries.oracle))
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_._1).reduce(_ ++ _)
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.map(_._2).reduce(_ ++ _)
}
