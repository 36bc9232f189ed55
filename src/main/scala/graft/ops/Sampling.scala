package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, splitting, and corpus mixing — the stage of a
  * training-data pipeline that runs after dedup/quality filtering (SURVEY
  * §2.6 family). Everything is keyed on a multiplicative hash rather than an
  * RNG, so results are reproducible across runs, partitionings, AND engines:
  * no seed state, no partition-order dependence, pure per-row column
  * arithmetic (codegen'd, pushes down to the scan, zero shuffle). The same
  * expression is ANSI-SQL-expressible, which is what lets the DuckDB oracle
  * hash-match these ops — `rand(seed)`-based sampling could never be
  * cross-engine checked.
  */
object Sampling {

  /** Mersenne prime 2^31−1 and the classic LCG multiplier (shared with
    * Corpus.shuffleEpoch's permutation key). */
  private[ops] val P = 2147483647L
  private[ops] val A = 1103515245L

  /** Percent bucket in [0,100) of an integer key:
    * (((key pmod P) · A) mod P) mod 100. The product is bounded by
    * (2^31)·(2^30.04) < 2^62, so ANSI-mode long arithmetic cannot overflow
    * — the reason for mod-P-first instead of a raw 64-bit multiply.
    *
    * `pmod` (not `%`) for the first reduction: Spark's `%` keeps the
    * dividend's sign, so a NEGATIVE key used to produce a negative bucket
    * that passed every `< pct` filter — silent 100% over-sampling of
    * negative keys. pmod == % on non-negative keys (bit-identical results
    * there), and the oracle SQL spells the same sign-safe form
    * `((key % P + P) % P)`. The later `% P` / `% 100` operate on
    * non-negative values, so plain `%` is already sign-safe for them. */
  def hashBucket(key: Column): Column =
    (pmod(key, lit(P)) * A % P) % 100

  /** Deterministic pct% subsample by key — the scale-safe `LIMIT`-free
    * downsampling of a 100 TB corpus (each executor decides per row; no
    * coordination, no count pass). */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(hashBucket(col(keyCol)) < pct)

  /** Reproducible train/val/test split: adds a `split` column from the key
    * bucket. Membership is a pure function of the key, so reruns, late
    * data, and other engines agree on every row's assignment. */
  def hashSplit(df: DataFrame, keyCol: String, pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0,
      s"split percents must be >= 0, got train=$pctTrain val=$pctVal")
    require(pctTrain + pctVal <= 100, "train+val must be <= 100")
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < pctTrain, "train")
        .when(b < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  /** Per-stratum deterministic rates (language/domain rebalancing): strata
    * listed in `rates` sample at their percent, all others at `defaultPct`.
    * One scan, no join — the rate is a when-chain on the stratum column. */
  def stratifiedSampleByHash(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (value, p)) => when(col(strataCol) === value, p).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < pct)
  }

  /** Deterministic fixed-size per-group sample ("reservoir" semantics
    * without an RNG): rank rows inside each group by the multiplicative
    * hash of their key and keep the `n` smallest — a uniform-looking,
    * rerun-stable, engine-agnostic choice of exactly min(n, |group|) rows.
    * The rank runs per group partition (one shuffle on the group column,
    * same cost class as any per-group top-k); ties cannot happen because
    * the hash is injective on keys below P. */
  def sampleNPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      // pmod for the same negative-key reason as hashBucket (here a wrong
      // ORDER, so the chosen sample rows — not just a rate — would skew)
      .orderBy(pmod(col(keyCol), lit(P)) * A % P, col(keyCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= n).drop("rn")
  }

  /** Micro-unit bucket in [0, 10⁶) — the fine-grained sibling of
    * [[hashBucket]] for probability-proportional decisions. */
  def hashMicro(key: Column): Column =
    (pmod(key, lit(P)) * A % P) % 1000000L

  /** Probability-proportional-to-size sampling, RNG-free: keep a row iff
    * `hashMicro(key) · cap < value · 10⁶`, i.e. with probability
    * min(1, value/cap) — the importance-sampling step that overweights
    * high-value rows (big orders, long documents) without an RNG, so
    * reruns, late data, and other engines agree row-by-row. Pure integer
    * comparisons (value in cents, caps bounded so products stay far inside
    * int64), zero shuffle, pushes to the scan. */
  def sampleProportional(df: DataFrame, keyCol: String, valueCents: Column,
      capCents: Long): DataFrame = {
    require(capCents > 0 && capCents <= 1000000000L,
      s"capCents must be in (0, 1e9], got $capCents") // 1e9·1e6 << int64 max
    df.where(hashMicro(col(keyCol)) * capCents < valueCents * 1000000L)
  }

  /** [[sampleProportional]] exercised end-to-end: orders kept with
    * probability min(1, price/200000), rolled up by priority. */
  def weightedOrderSample(orders: DataFrame): DataFrame =
    sampleProportional(
        orders.select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(12,2)").as("price")),
        "o_orderkey", (col("price") * 100).cast("long"), 20000000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_kept"),
        sum("price").cast("decimal(18,2)").cast("double").as("sum_kept"))
      .orderBy("o_orderpriority")

  /** Weighted corpus mixing: each named corpus sampled at its percent, then
    * unioned with a `corpus` tag — the blend step that builds a training
    * mixture from heterogeneous sources. A union of deterministic
    * subsamples is itself deterministic; each leg keeps its own pushed-down
    * filter, so nothing is scanned beyond the sampled sources. */
  def mixCorpora(corpora: Seq[(String, DataFrame, Int)], keyCol: String): DataFrame = {
    require(corpora.nonEmpty, "mixCorpora: need at least one corpus")
    corpora.map { case (tag, df, pct) =>
      sampleByHash(df, keyCol, pct).withColumn("corpus", lit(tag))
    }.reduce(_ unionByName _)
  }
}
