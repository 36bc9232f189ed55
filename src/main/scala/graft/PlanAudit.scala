package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("sim_bruteforce_topk", "sim_lsh_topk", "sim_ivf_topk", "win_top3_native")) {
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val topk = plan.linesIterator.filter(l =>
        l.contains("TopKPerKey") || l.contains("Exchange") || l.contains("Window")).mkString("\n")
      println(s"=== $name ===\n$topk\n")
    }
    spark.stop()
  }
}
