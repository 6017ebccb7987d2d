package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.apps.CurationIncremental
import graft.dedup.Dedup
import graft.io.JsonLines
import graft.ml.MlPipeline
import graft.multimodal.Multimodal
import graft.operators.{Relational, Sessionize, TextAnalysis, TextPipeline}
import graft.similarity.Similarity
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module contributes a `queries` map (operator name →
  * DataFrame builder over a testdata dir) and an `oracles` map
  * (equivalent ANSI SQL the driver runs in DuckDB on the same parquet
  * tables). Column names and ordering are aligned exactly between the
  * two — see the determinism notes in `graft.functions.Funcs`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextPipeline.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ MlPipeline.queries ++
      Multimodal.queries ++ EventStream.queries ++ Sessionize.queries ++
      JsonLines.queries ++ CurationIncremental.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextPipeline.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ MlPipeline.oracles ++
      Multimodal.oracles ++ EventStream.oracles ++ Sessionize.oracles ++
      JsonLines.oracles ++ CurationIncremental.oracles
}
