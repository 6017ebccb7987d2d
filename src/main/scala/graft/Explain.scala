package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of the
  * named queries (or a default set of scale-critical ones) so
  * pushdown / pruning / broadcast / codegen claims can be checked.
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {

  /** Internal (non-registered) plan surfaces whose shape is still
    * scale-critical: stages that a checkpoint erases from their
    * query's own executed plan. Named here so their formatted plans
    * can be dumped and committed like any registered query's. */
  private val internal
      : Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("ss18_candidates" ->
      ((s, d) => graft.similarity.Similarity.ss18Candidates(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_filter_project",
        "q03_revenue_by_nation", "q04_topk_parts", "vp04_vectorize",
        "dd03_lsh_pairs", "q16_asof_join", "q17_range_join",
        "ss03_knn_ivf",
        // round-3 scale-critical plans: argmax agg (no window/sort of
        // raw data), partition-pruned read, co-located bucketed join,
        // broadcast-centers assignment, vocab-sized rank window,
        // single-aggregate regression
        "q23_keep_latest", "io03_partitioned_parquet",
        "io05_bucketed_join", "ml11_kmeans_assign", "ta12_top_terms",
        "q27_linreg",
        // round-5 scale-critical plans: the partition-pruned serve
        // (PartitionFilters on the cell read), the fixed-size
        // calibration sample (TakeOrderedAndProject below the pair
        // join), the per-task top-k knn graph (WindowGroupLimit), and
        // the bucketed threshold sweep (aggregate below the join)
        "ss09_knn_ivfpq_served", "dd05_ngram_jaccard", "ss13_knn_graph",
        "ml16_pr_curve",
        // round-5 curation additions: linear span-dedup (no pair
        // join), broadcast-only contamination sweep, group-bounded
        // keeper argmax
        "dd15_dup_spans", "ta16_contamination", "dd16_canonical_docs",
        // round-5 third batch: zero-shuffle scrubbing projection and
        // the broadcast-quota resampling window
        "ta17_pii_redact", "q31_mix_apply",
        // round-6: vocabulary-free hashed vectorizer (one partial+
        // final agg, no vocab pass), lag-debounce (one user-keyed
        // window), canonical dedup (digest-only shuffle), z-order
        // box read (PartitionFilters on shard), changelog tail read
        "ta20_feature_hashing", "q33_debounce", "dd17_canonical_dedup",
        "io13_zorder_layout", "io14_changelog_consume",
        // round-6 second batch: Pregel-shaped power iteration (join+
        // agg per step, truncated lineage) and the 8-row closed-form
        // learning curve
        "ss21_knn_pagerank", "ml18_learning_curve")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      internal.getOrElse(n, SparkEntry.queries(n))(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
