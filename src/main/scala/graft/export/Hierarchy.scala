package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D3 circle-packing hierarchy export (K5) — replaces the reference's
  * PHP post-processor (`exportJSON.php:9-54`) with pure Spark
  * `collect_list(struct(...))` nesting + `to_json`.
  *
  * Levels (`KmeansVirus.scala:32-40`, `www/html/data.json` shape):
  * Main Container → `Cluster #k` → {Clean, Virus} → sample → API leaf
  * (`{name, size}` where size = descending feature rank, P9
  * `KmeansVirus.scala:106-111`).
  *
  * Children are sorted at every level so the JSON is deterministic
  * (the PHP inherited file order; SURVEY §7.4.1).
  */
object Hierarchy {

  /** assignments: (cluster INT, label DOUBLE, sample_id STRING,
    * apis ARRAY<STRUCT<name STRING, size INT>>) → single-row
    * DataFrame (json STRING). */
  def d3Json(assignments: DataFrame): DataFrame = {
    val samples = assignments.select(
      col("cluster"),
      when(col("label") === 0.0, "Clean").otherwise("Virus").as("label_name"),
      struct(col("sample_id").as("name"), col("apis").as("children")).as("sample"))

    val labels = samples
      .groupBy("cluster", "label_name")
      .agg(sort_array(collect_list(col("sample"))).as("children"))
      .select(col("cluster"),
        struct(col("label_name").as("name"), col("children")).as("label_node"))

    val clusters = labels
      .groupBy("cluster")
      .agg(sort_array(collect_list(col("label_node"))).as("children"))
      .select(struct(concat(lit("Cluster #"), col("cluster")).as("name"),
        col("children")).as("cluster_node"))

    clusters
      .agg(sort_array(collect_list(col("cluster_node"))).as("children"))
      .select(to_json(struct(lit("Main Container").as("name"),
        col("children"))).as("json"))
  }
}
