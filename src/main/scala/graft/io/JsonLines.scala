package graft.io

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL source/sink round trip — the interchange format LLM data
  * pipelines actually exchange (one JSON object per line, splittable,
  * schema-on-read). Spark's `df.write.json` / `spark.read.json` are
  * the distributed writers/readers; the query proves the corpus
  * survives the round trip byte-correct by re-deriving per-document
  * facts from the re-read copy and hash-comparing them against the
  * DuckDB oracle computed on the ORIGINAL parquet.
  *
  * The read declares an explicit schema — on a 100 TB corpus schema
  * inference would be a full extra scan, and its inferred types can
  * drift with the sample (the classic JSONL pitfall).
  */
object JsonLines {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // io01: documents → JSONL (distributed write, one file per
    // partition) → schema-declared re-read → per-doc facts. Matching
    // the parquet-side oracle proves lossless round-trip incl. JSON
    // string escaping.
    "io01_jsonl_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_jsonl_").toString
      documents(s, d).select("doc_id", "lang", "source", "text")
        .write.mode("overwrite").json(out)
      s.read.schema("doc_id LONG, lang STRING, source STRING, text STRING")
        .json(out)
        .select(col("doc_id"), col("lang"), col("source"),
          length(col("text")).as("text_len"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // io02: the CSV twin of io01 — same lossless-round-trip proof for
    // the delimiter/quote/escape hazards JSON doesn't have. Explicit
    // schema and explicit quote-all on write: schema inference and
    // minimal quoting are the two CSV behaviors that silently corrupt
    // a corpus at scale.
    "io02_csv_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_csv_").toString
      documents(s, d).select("doc_id", "lang", "source", "text")
        .write.mode("overwrite")
        .option("header", "false").option("quoteAll", "true")
        .csv(out)
      s.read.schema("doc_id LONG, lang STRING, source STRING, text STRING")
        .option("header", "false")
        .csv(out)
        .select(col("doc_id"), col("lang"), col("source"),
          length(col("text")).as("text_len"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "io01_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, length(text) AS text_len,
        |  md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "io02_csv_roundtrip" ->
      """SELECT doc_id, lang, source, length(text) AS text_len,
        |  md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
