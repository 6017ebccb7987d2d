package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc query runner: execute any declared query by name and print
  * its result — the quickest way to eyeball an operator's output.
  *
  * Usage: runMain graft.Run <queryName> [sfDir] [numRows]
  *        runMain graft.Run list          # print all query names
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args(0) == "list") {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — `runMain graft.Run list` for names"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fn(spark, sfDir).show(n, truncate = false)
    SparkEntry.oracleSql.get(name).foreach { sql =>
      println(s"-- DuckDB oracle:\n$sql")
    }
    spark.stop()
  }
}
