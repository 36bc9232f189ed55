package graft.ops

import org.apache.spark.sql.DataFrame

/** CPU-bound row-local stages (interpreted-HOF shingling, media decode)
  * inherit the scan's partitioning, and a single small parquet file is ONE
  * partition — one core does all the work while 31 idle. Spreading to the
  * session's parallelism first costs a round-robin exchange of the (small)
  * input and buys back the full machine; on a real many-split scan at
  * scale the condition never fires and the exchange never appears.
  *
  * The "is the input under-split?" probe uses the LOGICAL plan's size
  * statistics (bytes ÷ `spark.sql.files.maxPartitionBytes`, the same split
  * arithmetic the file scan uses) rather than `df.rdd.getNumPartitions` —
  * building the RDD lineage forces a full physical plan per call, which is
  * wasted work repeated at every one of the ~40 call sites. Logical stats
  * are already computed for join planning, so the probe is free. */
object Spread {
  def toCores(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val cores = sess.sparkContext.defaultParallelism
    val maxPartBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        sess.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      catch { case _: NumberFormatException => 128L << 20 }
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (estBytes / maxPartBytes).toLong + 1
    if (estSplits < cores) df.repartition(cores) else df
  }
}
