package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.Queries; the ER pipeline in graft.mdm.
  */
object SparkEntry {
  /** Flagship: full ER pipeline (standardize -> block -> pair -> score ->
    * cluster -> golden) on the deterministic generated web-page corpus at
    * reference-demo scale. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.er_pipeline_golden(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
