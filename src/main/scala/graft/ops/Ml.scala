package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over the embedding corpus — the codebook
  * trainer behind IVF indexing (SimSearch) and embedding-space corpus
  * analysis. Structured exactly like the cluster-scale algorithm:
  *
  *   - centroids live on the driver (k·dim values — METADATA, like MLlib's
  *     implementation; never the corpus);
  *   - assignment is a per-row argmin over broadcast centroid literals —
  *     zero shuffle, the same inlined-codebook trick as SimSearch.ivfTopK;
  *   - the centroid update is posexplode → partial-agg'd groupBy (cid, dim):
  *     the map-side combine reduces each task's shuffle output to k·dim
  *     rows, so the exchange carries O(k·dim·partitions), not O(corpus).
  *
  * Numeric design (cross-engine exactness): embeddings are quantized to an
  * integer grid (`round(x·1000)` — the same int8/int16-style quantization
  * the ANN path uses), distances are exact int64 sums of squares, and the
  * centroid update rounds half-up on the SAME grid via
  * `floor((2·sum + n) / (2·n))`. Every iteration is therefore integer-exact
  * and the DuckDB oracle replays the whole trajectory — a float k-means
  * would drift across engines in the first reduce. Ties (equidistant
  * centroids) break to the lowest cluster id by struct ordering. */
object Ml {

  /** Returns one row per cluster: (cluster, n_points, inertia) after `iters`
    * assignment rounds from a deterministic seed (the k lowest vec_ids) —
    * centroid updates run BETWEEN rounds, so the reported clustering is the
    * round-`iters` assignment against the (iters−1)-times-updated codebook
    * (exactly the trajectory the oracle's unrolled CTEs replay).
    *
    * Iteration does NOT grow lineage: every round re-plans from the
    * once-checkpointed quantized scan with the new centroids as plan
    * LITERALS, so the plan shape at round 100 is the plan shape at round 1
    * and the driver never holds more than k·dim longs between rounds
    * (plan-flatness asserted at iters=8 in Round6Spec). The loop is
    * driver-sequenced by nature — each round's argmin needs the previous
    * round's centroid sums — so `iters` bounds wall-clock (one zero-shuffle
    * pass + one k·dim-bounded aggregate per round), not memory. */
  def kmeansClusters(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    // k = 0 on a non-empty corpus would take the empty-corpus early return
    // (silent empty clustering); iters = 0 would silently behave as iters=1
    require(k >= 1, s"kmeansClusters: k must be >= 1, got $k")
    require(iters >= 1, s"kmeansClusters: iters must be >= 1, got $iters")
    val q = quantized(embeddings).transform(Materialize.once) // scanned once per round
    // deterministic seed: the k lowest vec_ids, cluster id = rank order.
    // k rows of metadata — the only collect in the loop.
    var centroids: Seq[(Int, Seq[Long])] = q.orderBy("vec_id").limit(k).collect()
      .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](1)) }
    if (centroids.isEmpty) // empty corpus: no clusters (array() of zero
      return q.select(lit(0).as("cluster"), lit(0L).as("n_points"), // structs
        lit(0L).as("inertia")).limit(0) // would type as VOID downstream
    for (_ <- 1 until iters) {
      val sums = assign(q, centroids)
        .select(col("cid"), posexplode(col("qv")).as(Seq("i", "v")))
        .groupBy("cid", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        // round-half-up back onto the integer grid; (2s+n)/(2n) stays well
        // under 2^53, so the double division is exact enough for floor
        .select(col("cid"), col("i"),
          floor((col("s") * 2 + col("n")) / (col("n") * 2)).cast("long").as("cv"))
        .collect()
      // empty clusters drop out (matches the oracle's relational replay,
      // where a cid with no members simply vanishes from the centroid CTE)
      centroids = sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
      }
    }
    assign(q, centroids)
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_points"), sum("d").as("inertia"))
      .orderBy("cluster")
  }

  /** SemDeDup (semantic dedup, Abbas et al. 2023 shape): cluster the
    * embedding space, then inside each cluster drop members whose cosine
    * similarity to the cluster representative clears a threshold — the
    * "same meaning, different words" pruning pass exact-text dedup misses.
    *
    * This implementation: one assignment round against the deterministic
    * seed codebook (the clustering quality is [[kmeansClusters]]'s job;
    * the pruning mechanism is the point here), representative = lowest
    * vec_id per cluster, and the cosine test is EXACT integer
    * cross-multiplication on the quantized grid:
    *   keep  iff  dot ≤ 0  or  den·dot² < num·|a|²·|b|²   (cos² < num/den)
    * so no square root, no float, no cross-engine drift. Per-cluster
    * census out: (cluster, n_members, n_dropped).
    *
    * Scale: assignment is the zero-shuffle argmin; representatives are k
    * rows (broadcast); the dot products are per-row column math against
    * the broadcast representative vectors. One shuffle total (the census
    * groupBy). */
  def semDedup(embeddings: DataFrame, k: Int = 8,
      thrNum: Long = 49, thrDen: Long = 400): DataFrame = {
    // thrDen = 0 makes the threshold test vacuously false (nothing ever
    // drops — a silently useless dedup); negative thresholds flip the
    // inequality's meaning
    require(k >= 1, s"semDedup: k must be >= 1, got $k")
    require(thrDen >= 1 && thrNum >= 0,
      s"semDedup: need thrDen >= 1 and thrNum >= 0, got $thrNum/$thrDen")
    // the coarser round(x·100) grid keeps den·dot² inside int64 for
    // 64-dim vectors with |x| ≤ ~40 (dot ≤ 64·160e3 ⇒ den·dot² ≤ ~1e16)
    val q = quantized(embeddings, 100d).transform(Materialize.once)
    val seed = q.orderBy("vec_id").limit(k).collect()
      .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](1)) }
    if (seed.isEmpty) // same empty-corpus guard as kmeansClusters
      return q.select(lit(0).as("cluster"), lit(0L).as("n_members"),
        lit(0L).as("n_dropped")).limit(0)
    // Loud overflow guard: with ANSI off Spark wraps silently on int64
    // overflow while DuckDB raises, so an out-of-bound magnitude would
    // surface as a confusing oracle mismatch instead of an error. Both
    // sides of the threshold test are bounded by d²·m⁴·max(thrNum,thrDen)
    // (Cauchy–Schwarz: dot ≤ √(na·nb) ≤ d·m²), so require the max
    // quantized magnitude m to keep that product inside Long.MaxValue.
    // One cheap aggregate over the already-checkpointed grid.
    val bounds = q.agg(
      max(array_max(transform(col("qv"), x => abs(x)))).as("m"),
      max(size(col("qv"))).as("d")).head()
    if (!bounds.isNullAt(0)) {
      val m = bounds.getLong(0)
      val d = bounds.getInt(1).toDouble
      val mMax = math.pow(
        Long.MaxValue.toDouble / (d * d * math.max(thrNum, thrDen)), 0.25)
      require(m <= mMax,
        s"semDedup: quantized magnitude $m exceeds the int64-safe bound " +
        f"$mMax%.0f for dim ${d.toInt} — shrink the grid or the threshold")
    }
    val assigned = assign(q, seed)
    // rep_cid rename: reps derives from `assigned`, so keeping the name
    // `cid` through the join back would be a self-lineage ambiguity
    val reps = assigned.groupBy(col("cid").as("rep_cid"))
      .agg(min("vec_id").as("rep_id"))
    val repVecs = assigned
      .join(broadcast(reps), col("vec_id") === col("rep_id"))
      .select(col("rep_cid").as("cid"), col("rep_id"), col("qv").as("rep_qv"))
    val dot = aggregate(zip_with(col("qv"), col("rep_qv"), _ * _),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(zip_with(col("qv"), col("qv"), _ * _),
      lit(0L), (acc, x) => acc + x)
    val nb = aggregate(zip_with(col("rep_qv"), col("rep_qv"), _ * _),
      lit(0L), (acc, x) => acc + x)
    assigned
      .join(broadcast(repVecs), "cid")
      .select(col("cid"), col("vec_id"), col("rep_id"),
        dot.as("dot"), na.as("na"), nb.as("nb"))
      .select(col("cid"),
        when(col("vec_id") =!= col("rep_id")
          && col("dot") > 0
          && col("dot") * col("dot") * thrDen >= col("na") * col("nb") * thrNum,
          1L).otherwise(0L).as("dropped"))
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_members"), sum("dropped").as("n_dropped"))
      .orderBy("cluster")
  }

  /** (vec_id, qv): embeddings on the round(x·scale) integer grid. Spread
    * first: the interpreted-HOF quantization AND every downstream per-row
    * centroid argmin (plus the localCheckpoint that pins this partitioning
    * for all k-means rounds) inherit the scan's splits, and the single-file
    * embeddings table is ONE split at any replica scale — un-spread, the
    * whole clustering pipeline runs on one core. */
  private def quantized(embeddings: DataFrame, scale: Double = 1000d): DataFrame =
    Spread.toCores(embeddings).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * scale).cast("long")).as("qv"))

  /** Per-row nearest centroid over inlined literals: array_min over
    * struct(distance, cid) — lexicographic struct order gives min distance,
    * ties to lowest cid. No shuffle, no explode. */
  private def assign(q: DataFrame, centroids: Seq[(Int, Seq[Long])]): DataFrame = {
    val best = array_min(array(centroids.map { case (cid, cv) =>
      struct(sqDist(col("qv"), cv).as("d"), lit(cid).as("c"))
    }: _*))
    q.select(col("vec_id"), col("qv"),
      best.getField("c").as("cid"), best.getField("d").as("d"))
  }

  /** Exact int64 squared distance between a quantized column vector and a
    * literal centroid. */
  private def sqDist(qv: Column, cv: Seq[Long]): Column =
    aggregate(
      zip_with(qv, array(cv.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Per-label mean embedding (class centroids / prototypes) — the building
    * block for prototype classifiers, per-class drift monitors, and the
    * class-balanced variant of SemDeDup. Exact on the integer grid: each
    * element is quantized to micro-units, summed per (label, dim), and the
    * mean is floor integer division — no float accumulation order to
    * disagree on cross-engine.
    *
    * Shape at 100 TB: posexplode fans each vector into dim rows, but the
    * per-(label, dim) sums partial-aggregate map-side, so the exchange
    * carries O(|labels| · dim · partitions) — never corpus-sized. The output
    * itself is |labels| · dim rows: centroid metadata, not data. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    // spread before the per-row micro-quantize + dim-way posexplode
    // (single-split scan would serialize the fan-out; the per-(label,dim)
    // partial aggregate then combines map-side per spread partition)
    Spread.toCores(embeddings)
      .select(col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000d).cast("long")).as("qv"))
      .select(col("label"), posexplode(col("qv")).as(Seq("dim", "qval")))
      // NULL elements survive posexplode as NULL qval rows: count() would
      // include them while sum() skips them — a silently deflated mean.
      // Fail loudly like cosine_sim's NULL-element contract (whole-NULL
      // embeddings are dropped by posexplode itself, which is fine: the
      // row carries no coordinates to average).
      .where(assert_true(col("qval").isNotNull,
        concat(lit("labelCentroids: NULL embedding element at dim "),
          col("dim"))).isNull)
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("qval").as("sum_micro"))
      .withColumn("mean_micro", expr("sum_micro div n"))
      .select("label", "dim", "n", "mean_micro")
      .orderBy("label", "dim")
}
