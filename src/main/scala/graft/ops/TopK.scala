package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import graft.plans.{GraftExtensions, TopKPerKeyPlan}

/** Public API over the custom per-key top-k operator
  * (graft.plans.TopKPerKeyPlan / TopKPerKeyExec) — the heap-based
  * replacement for `row_number().over(...)` + `rn <= k`. */
object TopK {

  /** Top `k` rows per key group, ranked 1..k by `orderSpec`
    * ((column, descending) pairs — include a unique tiebreaker column for
    * deterministic output). Appends an integer rank column `rankName`. */
  def perKey(df: DataFrame, keys: Seq[String], orderSpec: Seq[(String, Boolean)],
      k: Int, rankName: String = "rn"): DataFrame = {
    GraftExtensions.ensureRegistered(df.sparkSession)
    val session = GraftBridge.classicSession(df.sparkSession)
    GraftBridge.ofRows(session,
      TopKPerKeyPlan(keys, orderSpec, k, rankName, GraftBridge.analyzedPlan(df)))
  }
}
