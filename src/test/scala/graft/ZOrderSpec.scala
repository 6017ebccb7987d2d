package graft

import org.scalatest.funsuite.AnyFunSuite

/** io13's scale claim, asserted on the scan metric: the z-ordered
  * layout turns a two-dimensional box predicate into directory-level
  * partition pruning — the quarter-box read touches exactly the box's
  * shard set (1 of 16), not the whole table. Single-column
  * partitioning can only ever prune one of the two dimensions. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("io13's box read touches only the box's z-shards") {
    val df = SparkEntry.queries("io13_zorder_layout")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned row is inside the box and in shard 0
    assert(rows.forall(r => r.getLong(1) < graft.io.JsonLines.ZBoxMax &&
      r.getLong(2) < graft.io.JsonLines.ZBoxMax && r.getLong(4) == 0L))
    // the sort in the plan makes AQE wrap everything; unwrap adaptive
    // nodes (and their query-stage leaves) to reach the file scan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec => leaves(q.plan)
      case _ => p.collectLeaves().flatMap {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case q: QueryStageExec => leaves(q.plan)
        case l => Seq(l)
      }
    }
    val scans = leaves(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numPartitions").value
    }
    assert(scans.nonEmpty, "no file scan in the executed plan")
    assert(scans.min == 1,
      s"the box read must touch exactly 1 of 16 z-shards, got $scans")
  }
}
