package graft.ops

import org.apache.spark.sql.DataFrame

/** CPU-bound row-local stages (interpreted-HOF shingling, media decode)
  * inherit the scan's partitioning, and a single small parquet file is ONE
  * partition — one core does all the work while 31 idle. Spreading to the
  * session's parallelism first costs a round-robin exchange of the (small)
  * input and buys back the full machine; on a real many-split scan at
  * scale the condition never fires and the exchange never appears. */
object Spread {
  def toCores(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
