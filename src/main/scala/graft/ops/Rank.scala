package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed within-group ranking for UNBOUNDED group sizes.
  *
  * `Window.partitionBy(group)` sends every row of a group through ONE task —
  * fine when the key bounds the partition (per-customer, per-user windows),
  * a straggler when a group is a constant fraction of the data (five order
  * priorities at 100 TB = 20 % of the corpus in one reducer). This operator
  * computes the same `row_number`-style rank in two bounded passes:
  *
  *   1. range-repartition by (group ++ order) — Spark's scalable global-sort
  *      partitioner, so each physical partition holds ≈ n/P contiguous rows
  *      and, within a group, partition index order == order-column order;
  *   2. rank locally per (partition, group) — the window keys include the
  *      partition id, so every window slice is bounded by the partition
  *      size, never the group size;
  *   3. add per-(partition, group) row-count offsets — a P × groups
  *      metadata table, broadcast back onto the slices.
  *
  * Requires a TOTAL order (include a unique tiebreaker in `orderCols`): with
  * ties-free order, `rank == row_number`, and `percent_rank`/`cume_dist`/
  * `ntile` are pure arithmetic over (rank, n) — emitted here exactly as the
  * single-window form would.
  *
  * Cardinality precondition: the offsets metadata is P × |groups| rows and
  * is BROADCAST back onto the slices — `groupCols` must be broadcast-sized
  * (categories, priorities, flags; up to ~millions of rows). For
  * high-cardinality keys (per-customer, per-document) a plain
  * `Window.partitionBy` is the right tool: the key itself bounds the
  * partition there, which is exactly the regime this operator is NOT for.
  */
object Rank {

  /** Materialization guard for the two-pass rankers: the offsets pass and
    * the data pass each reference the local-rank frame, and correctness
    * requires BOTH to observe the SAME range-partition bounds. Normally
    * one plan + ReuseExchange/AQE stage reuse guarantees it; two known
    * conditions break that and must force a one-time materialization
    * (eager `localCheckpoint`) instead:
    *
    *   - empty `groupCols`: the P-row offsets collect is a SEPARATE
    *     execution from the final join (documented in [[groupRanks]]);
    *   - an `InMemoryRelation` anywhere in the input plan: cache-state
    *     transitions between the two stage compilations defeat reuse
    *     canonicalization, so each side re-runs the range exchange with
    *     its own RangePartitioner sample (seeded by rdd id) — offsets
    *     computed under bounds A join ranks computed under bounds B, and
    *     the ranks come out silently, NONDETERMINISTICALLY wrong
    *     (caught round 10: persisting a frame upstream of a grouped
    *     ranking flipped median-absolute-deviation values run to run);
    *   - `hasPayload` (an input column the sort keys do not reference):
    *     column pruning narrows the payload out of the offsets side's
    *     subplan BELOW the range exchange while the data side keeps it,
    *     the two exchange subtrees no longer canonicalize equal, and
    *     reuse misses — same bounds-divergence failure as the cache case
    *     (plan-verified on the round-22 codegen local pass: the
    *     lengthBatches offsets exchange lost `n_tokens`). */
  private def stableLocal(df: DataFrame, localPlan: DataFrame,
      groupCols: Seq[String], hasPayload: Boolean): DataFrame = {
    // collectWithSubqueries, not collectFirst: a cached relation referenced
    // only inside a subquery expression is invisible to the plain child
    // traversal, and would re-expose the bounds mismatch
    val cachedInput = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => ()
    }.nonEmpty
    // with exchange reuse disabled there is NO mechanism making the two
    // references observe one range exchange — always materialize
    val reuseOff = !df.sparkSession.sessionState.conf.exchangeReuseEnabled
    // the eager materialization trades a failure mode for bounds
    // consistency; [[Materialize.once]] picks local (executor-local,
    // unreplicated — the one-shot analytics posture) or reliable
    // (checkpoint-dir, survives executor loss) blocks per session config
    if (groupCols.isEmpty || cachedInput || reuseOff || hasPayload)
      Materialize.once(localPlan)
    else localPlan
  }

  /** True when `df` carries a column the sort keys do not reference — the
    * [[stableLocal]] payload condition. Compared by exprId on the analyzed
    * plans (names can collide; ids cannot): `sorted` is built over `df`'s
    * own logical plan, so its Sort order references resolve to `df`'s
    * output ids. */
  private def payloadBeyondKeys(df: DataFrame, sorted: DataFrame): Boolean = {
    val keyIds = sorted.queryExecution.analyzed.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
        s.order.flatMap(_.references).map(_.exprId).toSet
    }.getOrElse(Set.empty)
    df.queryExecution.analyzed.output.exists(a => !keyIds.contains(a.exprId))
  }

  /** Group-key normalization for the per-partition stateful scan in
    * [[groupRunningSums]] (the only remaining external-row pass — prefix
    * sums need real accumulation; [[rankedParts]] is pure codegen
    * arithmetic now): `row.get` yields `Array[Byte]` for BinaryType
    * columns, whose `equals` is reference identity — every row would look
    * like a new group and local sums would reset per row. Wrap to a
    * value-equality Seq. */
  private def keyOf(row: org.apache.spark.sql.Row,
      idx: Seq[Int]): Seq[Any] =
    idx.map { i =>
      row.get(i) match {
        case b: Array[Byte] => b.toSeq
        case x => x
      }
    }

  /** Offsets join shared by the two rankers. The group-key equality must be
    * NULL-SAFE: `Window.partitionBy` ranks a NULL group like any other, and
    * a plain using-column join would silently drop those rows. Offsets-side
    * key columns get collision-proof names so `<=>` can reference both
    * sides. */
  private def joinOffsets(local: DataFrame, offsets: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    if (groupCols.isEmpty) local.join(broadcast(offsets), Seq("_pid"))
    else {
      val renamed = offsets.select(
        (col("_pid").as("_rk_pid") +:
          groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"_rk_g$i") }) ++:
          offsets.columns.filterNot(c => c == "_pid" || groupCols.contains(c))
            .toSeq.map(col): _*)
      val cond = groupCols.indices
        .map(i => col(groupCols(i)) <=> col(s"_rk_g$i"))
        .foldLeft(col("_pid") === col("_rk_pid"))(_ && _)
      local.join(broadcast(renamed), cond)
        .drop(("_rk_pid" +: groupCols.indices.map(i => s"_rk_g$i")): _*)
    }
  }

  /** The two-pass rankers add internal and output columns by these names;
    * a same-named input column would be silently overwritten or make the
    * offsets join ambiguous. Fail loudly instead. */
  private def requireFreeNames(df: DataFrame, names: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Rank's " +
        s"internal/output columns (${names.mkString(", ")}); rename them first")
  }

  /** Shared core of the rank-based operators: range-shuffle + local rank,
    * plus the P × |groups| offsets metadata. Returns `(local, offsets)`
    * where `local` = input columns + (`_pid`, `_mid`) and `offsets` =
    * `_pid` ++ groupCols ++ (`_cnt`, `_offset`, `n`, `_min`) —
    * per-(partition, group) row count, cumulative offset in partition
    * order, group total, and the slice's minimum `_mid`. The local rank of
    * a row within its (partition, group) slice is `_mid − _min + 1`.
    * Consumers either join offsets back onto every row ([[groupRanks]]) or
    * address specific order statistics on the metadata alone
    * ([[discPercentiles]]).
    *
    * The local pass is pure codegen arithmetic: `monotonically_increasing_
    * id()` evaluates in partition row order as (pid << 33) + row index
    * (0-based, CONSECUTIVE within the partition), so within a (pid, group)
    * slice — contiguous because the local sort leads with groupCols — the
    * ids are consecutive and `_mid − min(_mid)` IS the 0-based local rank.
    * min(_mid) rides the same tiny offsets aggregate the counts already
    * need. This replaced an `Encoders.row` mapPartitions stateful scan
    * (round 22): the external-row round trip (DeserializeToObject /
    * MapPartitions / SerializeFromObject) cost ~60 µs/row and ran once per
    * consumer of the shared plan — the dominant task time of every
    * rank-based query. Rank-identity argument: row order inside a sorted
    * partition is deterministic up to ties in the sort key, permutable rows
    * are value-identical, and slice boundaries (hence `_cnt`, `_min`,
    * `_offset`) depend only on per-slice row counts — so the emitted
    * (row, rank) pairs match the stateful scan's exactly.
    *
    * The nondeterministic marker on the id expression is load-bearing:
    * EliminateSorts cannot recurse through a nondeterministic projection
    * (the offsets aggregate would otherwise license removing the local
    * sort the ids' row order rides on). It does NOT stop column pruning —
    * pruning narrows payload columns out of the offsets side BELOW the
    * exchange (plan-verified), which breaks ReuseExchange's subtree
    * equality and with it the bounds-consistency contract; the
    * `hasPayload` condition in [[stableLocal]] materializes exactly those
    * inputs once instead. */
  private def rankedParts(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], extraNames: Seq[String]): (DataFrame, DataFrame) = {
    requireFreeNames(df, Seq("_pid", "_mid", "_min", "_cnt", "_offset", "n") ++
      extraNames ++ groupCols.indices.map(i => s"_rk_g$i"))
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // no second full-data exchange (a Window keyed by (pid, group) would
    // hash-shuffle everything again just to regroup what the range
    // partitioner already co-located). AQE's contiguous partition
    // coalescing preserves the pid-order == value-order invariant the
    // offsets below rely on (both _pid and the id's partition index are the
    // post-coalesce TaskContext partition id).
    val localPlan = sorted.select(
      (df.columns.toIndexedSeq.map(col) :+ spark_partition_id().as("_pid") :+
        monotonically_increasing_id().as("_mid")): _*)
    // empty groupCols (global rank): the offsets collect and the final join
    // are SEPARATE executions — and RangePartitioner's sample seed includes
    // the (per-execution) rdd id, so two runs of the range exchange may cut
    // different bounds and shift rows across pids, corrupting the offset
    // join. Materialize ONCE (the zipWithIndex discipline: both jobs must
    // read the same physical partitions). The grouped path keeps one lazy
    // plan: its offsets ride the SAME query, and ReuseExchange makes the
    // twice-referenced range exchange one exchange — except over cached
    // inputs or payload-carrying inputs, where reuse breaks (see
    // [[stableLocal]]).
    val local =
      stableLocal(df, localPlan, groupCols, payloadBeyondKeys(df, sorted))
    // offsets: counts + min id per (pid, group) — P × |groups| rows, tiny —
    // cumulated in pid order (range partitioning makes pid order == value
    // order). empty groupCols: exactly P rows of per-partition counts —
    // cumulate on the DRIVER instead of through a declared-single-partition
    // window, which Spark 4's EliminateWindowPartitions strips back to an
    // empty partition spec (constant keys, foldable or not) and then warns
    // on.
    val offsets = if (groupCols.isEmpty) {
      val cnts = local.groupBy(col("_pid"))
        .agg(count(lit(1)).as("_cnt"), min(col("_mid")).as("_min"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val total = cnts.map(_._2).sum
      var acc = 0L
      val rows = cnts.map { case (pid, cnt, mn) =>
        val off = acc; acc += cnt; (pid, cnt, off, total, mn)
      }
      spark.createDataFrame(rows.toIndexedSeq)
        .toDF("_pid", "_cnt", "_offset", "n", "_min")
    } else {
      val cntW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_pid"))
      val nW = Window.partitionBy(groupCols.map(col): _*)
      local.groupBy(("_pid" +: groupCols).map(col): _*)
        .agg(count(lit(1)).as("_cnt"), min(col("_mid")).as("_min"))
        .withColumn("_offset", sum(col("_cnt")).over(cntW) - col("_cnt"))
        .withColumn("n", sum(col("_cnt")).over(nW))
        .select(("_pid" +: groupCols).map(col) :+ col("_cnt") :+
          col("_offset") :+ col("n") :+ col("_min"): _*)
    }
    (local, offsets)
  }

  /** Adds `rank` (1-based within group), `n` (group size) to `df`.
    * Row-identical to
    * `row_number().over(Window.partitionBy(groupCols).orderBy(orderCols))`
    * plus `count(*) over (partition by groupCols)`, with no unbounded
    * window partition anywhere in the plan.
    *
    * `groupCols` may be EMPTY: then this is a scalable global contiguous
    * index (`row_number` over the whole dataset — the ordered, gap-free id
    * assignment `monotonically_increasing_id` does not give and a global
    * window computes on one reducer), and the offset metadata is exactly P
    * rows. */
  def groupRanks(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val (local, offsets) =
      rankedParts(df, groupCols, orderCols, Seq("rank"))
    // local rank = _mid − _min + 1 (consecutive ids within the slice); the
    // pid prefix baked into both _mid and _min cancels in the difference
    joinOffsets(local, offsets.drop("_cnt"), groupCols)
      .withColumn("rank",
        (col("_offset") + col("_mid") - col("_min") + lit(1L)).cast("long"))
      .drop("_pid", "_mid", "_offset", "_min")
  }

  /** Distributed within-group PREFIX SUM over a long column — same two-pass
    * shape as [[groupRanks]]: local running sums per sorted partition, plus
    * broadcast per-(partition, group) totals cumulated in partition order.
    * Adds `running` (inclusive prefix sum of `valueCol` in `orderCols`
    * order within each group). `Window.partitionBy(group)` + running-frame
    * `sum` computes the same thing through ONE reducer per group; this never
    * holds more than a partition in one task. `groupCols` may be empty
    * (global scan order). */
  def groupRunningSums(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], valueCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    requireFreeNames(df, Seq("_pid", "_lsum", "_offset", "running") ++
      groupCols.indices.map(i => s"_rk_g$i"))
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val groupIdx = groupCols.map(df.schema.fieldIndex)
    val valueIdx = df.schema.fieldIndex(valueCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("_pid", IntegerType, nullable = false) :+
      StructField("_lsum", LongType, nullable = false))
    val localPlan = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var prevKey: Seq[Any] = null
      var s = 0L
      it.map { row =>
        val key = keyOf(row, groupIdx)
        if (prevKey == null || key != prevKey) { s = 0L; prevKey = key }
        // NULL contributes nothing, like the window-frame sum it replaces
        // (the running sum holds its value on a NULL row)
        val v = row.get(valueIdx)
        if (v != null) s += v.asInstanceOf[Number].longValue()
        Row.fromSeq(row.toSeq :+ pid :+ s)
      }
    }(Encoders.row(outSchema))
    // materialize once when the two passes could see different range
    // bounds — the consistency discipline explained in [[stableLocal]].
    // hasPayload = false: this pass is still the opaque external-row scan,
    // whose deserializer references EVERY input column — nothing prunes
    // below the exchange, so the two subtrees stay canonical-equal with or
    // without payload columns
    val local = stableLocal(df, localPlan, groupCols, hasPayload = false)
    // empty groupCols: P-row metadata cumulated on the driver — see groupRanks
    // coalesce(sum, 0): a (partition, group) slice whose values are ALL
    // NULL sums to NULL, which would poison every later offset in the
    // cumulation — the window-sum equivalent treats it as contributing 0
    val offsets = if (groupCols.isEmpty) {
      val sums = local.groupBy(col("_pid"))
        .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("_psum"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val rows = sums.map { case (pid, s) => val off = acc; acc += s; (pid, off) }
      spark.createDataFrame(rows.toIndexedSeq).toDF("_pid", "_offset")
    } else {
      val cntW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_pid"))
      local.groupBy(("_pid" +: groupCols).map(col): _*)
        .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("_psum"))
        .withColumn("_offset", sum(col("_psum")).over(cntW) - col("_psum"))
        .select(("_pid" +: groupCols).map(col) :+ col("_offset"): _*)
    }
    joinOffsets(local, offsets, groupCols)
      .withColumn("running", (col("_offset") + col("_lsum")).cast("long"))
      .drop("_pid", "_lsum", "_offset")
  }

  /** Exact DISCRETE percentiles (order statistics) per group WITHOUT a
    * per-group value buffer — the scale-safe form of
    * `percentile_disc(q) WITHIN GROUP (ORDER BY valueCol)`, whose
    * sort-aggregate buffers every value of a group in one task (an
    * executor OOM when a group is a constant fraction of 100 TB; Spark's
    * partial aggregation does not bound it, the partials ARE the values).
    *
    * percentile_disc(q) is the value at in-group sorted position
    * ceil(q·n). Each requested q is a RATIONAL (num, den) so the position
    * is exact integer arithmetic — `(n·num + den − 1) div den` — with no
    * float-threshold edge at q·n boundaries. One range shuffle + local
    * rank pass ([[rankedParts]]) orders the values; ties get arbitrary
    * distinct positions, which cannot change the value AT a position. The
    * positions are then resolved to (partition, local rank) ADDRESSES on
    * the P×groups offsets metadata and broadcast back as a filter — the
    * ranked rows are scanned once, emit ≤ |groups|·|qs| hits, and a tiny
    * aggregate folds them into one row of named boundary columns.
    *
    * NULL values are ignored, exactly as `percentile_disc` ignores them
    * (they would otherwise shift every position). One deliberate
    * divergence: a group whose values are ALL NULL is absent from the
    * output, where the SQL aggregate emits the group with NULL
    * percentiles — callers needing that form left-join the group list
    * back (none of this library's do).
    *
    * Output: one row per group — groupCols ++ outNames (empty groupCols →
    * a single global row, same as the global aggregate form). */
  def discPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(Int, Int)],
      outNames: Seq[String]): DataFrame = {
    require(qs.length == outNames.length, "one output name per percentile")
    require(outNames.distinct.length == outNames.length,
      s"output names must be distinct, got $outNames")
    require(qs.forall { case (num, den) => num > 0 && num < den },
      s"percentiles must be proper fractions, got $qs")
    val (local, offsets) = rankedParts(
      df.select(groupCols.map(col) :+ col(valueCol): _*)
        .where(col(valueCol).isNotNull),
      groupCols, Seq(col(valueCol)),
      Seq("_q", "_t", "_rk_mid") ++ outNames)
    // address each order statistic on the P × |groups| METADATA alone:
    // position ceil(q·n) = (n·num + den−1) div den falls inside the one
    // (partition, group) slice whose cumulative span covers it, at local
    // rank pos − _offset, i.e. at id _min + (pos − _offset) − 1. The join
    // back onto the ranked rows is then a broadcast FILTER producing
    // ≤ |groups|·|qs| rows — no global rank needs to be attached to every
    // row and no full-data aggregation follows (the previous form joined
    // offsets onto all rows and scanned them with max-when; same answer,
    // one full-width pass more).
    val qArr = array(qs.zip(outNames).map { case ((num, den), name) =>
      struct(lit(name).as("_q"),
        expr(s"(n * $num + ${den - 1}) div $den").as("_pos"))
    }: _*)
    // _mid is globally unique (the id's partition prefix), so equality on
    // it alone addresses the row — the pid/group equalities the _lrank form
    // needed are implied and dropped
    val targets = offsets
      .select(col("_cnt"), col("_offset"), col("_min"),
        explode(qArr).as("_t"))
      .where(col("_t._pos") > col("_offset") &&
        col("_t._pos") <= col("_offset") + col("_cnt"))
      .select((col("_min") + col("_t._pos") - col("_offset") - lit(1L))
        .as("_rk_mid"), col("_t._q").as("_q"))
    val hits = local.join(broadcast(targets), col("_mid") === col("_rk_mid"))
      .select(groupCols.map(col) :+ col(valueCol) :+ col("_q"): _*)
    val aggs = qs.zip(outNames).map { case (_, name) =>
      max(when(col("_q") === name, col(valueCol))).as(name)
    }
    if (groupCols.isEmpty) hits.agg(aggs.head, aggs.tail: _*)
    else hits.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Spark's `ntile(k)` from (rank, n): the first `n mod k` buckets take
    * `ceil(n/k)` rows, the rest `floor(n/k)` — bit-identical to the window
    * function under a total order. */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    val base = (n / k).cast("long")          // floor for non-negative longs
    val rem = n % k
    val bigSpan = rem * (base + 1)
    when(base === 0, rank) // fewer rows than buckets: bucket == rank
      .when(rank <= bigSpan, ceil(rank / (base + 1)))
      .otherwise(rem + ceil((rank - bigSpan) / base))
      .cast("int")
  }

  /** `percent_rank` from (rank, n) under a total order: (rank-1)/(n-1). */
  def percentRankOf(rank: Column, n: Column): Column =
    when(n === 1, lit(0.0))
      .otherwise((rank - lit(1)).cast("double") / (n - lit(1)).cast("double"))

  /** `cume_dist` from (rank, n) under a total order: rank/n. */
  def cumeDistOf(rank: Column, n: Column): Column =
    rank.cast("double") / n.cast("double")
}
