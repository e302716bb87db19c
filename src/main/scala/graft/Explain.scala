package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-inspection harness: prints the formatted physical plan of one or all
  * registered queries. Usage: runMain graft.Explain <query|ALL> [sfDir] [mode]
  *
  * This is the perf feedback loop's other half next to Bench: after every
  * operator change, check the plan IS the plan you want (joins stayed
  * equi-joins, filters reached the scan, codegen spans are wide) — not just
  * that the first plan passed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "ALL"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = ExplainMode.fromString(if (args.length > 2) args(2) else "formatted")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (name == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else name.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { n =>
      println(s"===== $n =====")
      try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(mode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
