package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape audit over the whole query inventory: per query, the counts
  * that matter at 100× scale — shuffle exchanges, broadcasts, nested-loop /
  * cartesian joins, window operators — plus the custom-operator markers.
  * Run with a query-name substring to dump those plans in full.
  *
  * This is a dev tool (the CI-shaped assertions live in PlanSpec); it exists
  * to eyeball NEW queries for accidental shuffles before they ship.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val filter = args.headOption
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(n.contains))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, d)
        val plan = df.queryExecution.executedPlan.toString
        if (filter.isDefined) println(s"=== $name ===\n$plan\n")
        else {
          def c(m: String) = plan.linesIterator.count(_.contains(m))
          val flags = Seq(
            "shuffle=" + c("Exchange hashpartitioning"),
            "rangeEx=" + c("Exchange rangepartitioning"),
            "bcast=" + c("BroadcastExchange"),
            "bnlj=" + c("BroadcastNestedLoopJoin"),
            "smj=" + c("SortMergeJoin"),
            "cart=" + c("CartesianProduct"),
            "win=" + c("Window ["),
            "topk=" + c("TopKPerKey"))
          println(f"$name%-34s ${flags.mkString(" ")}")
        }
      } catch { case e: Throwable =>
        println(s"$name AUDIT-ERROR: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
