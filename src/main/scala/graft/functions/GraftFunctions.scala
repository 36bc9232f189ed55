package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the engine. Everything here is composed
  * from `org.apache.spark.sql.functions._` built-ins (all codegen'd inside
  * whole-stage codegen) — no Scala UDFs, so filters/projections around these
  * stay push-down- and codegen-friendly.
  */
object GraftFunctions {

  // ---------------------------------------------------------------- dates --

  /** `java.util.Calendar.WEEK_OF_MONTH` under the US locale (weeks start
    * Sunday, minimal-days-in-first-week = 1, range 1..6) — the semantics the
    * reference's weekly histogram and timeperiod dimension are built on
    * (`/root/reference/.../SanFranciscoCrime.java:178-180`,
    * `LoadStarDB.java:139`). Spark 3+ rejects the `W` datetime pattern, so
    * compute it directly:
    *
    *   week_of_month(d) = floor((dayofmonth(d) + dow(first_of_month) - 2)/7) + 1
    *
    * with `dayofweek` Sunday=1. Property-tested against Calendar in
    * `WeekOfMonthSpec`.
    */
  def week_of_month(d: Column): Column =
    (floor((dayofmonth(d) + dayofweek(trunc(d, "MM")) - lit(2)) / lit(7)) + lit(1))
      .cast("int")

  /** The reference's histogram bucket: `Calendar.MONTH * 5 + weekOfMonth`
    * (`SanFranciscoCrime.java:177-187`; Calendar.MONTH is 0-based, hence
    * `month(d) - 1`). Known aliasing at month boundaries (week 6 of month m
    * collides with week 1 of month m+1) is preserved knowingly — see
    * SURVEY.md §2.3-A2.
    */
  def month_week_bucket(d: Column): Column =
    ((month(d) - lit(1)) * lit(5) + week_of_month(d)).cast("int")

  // -------------------------------------------------------------- vectors --

  /** Dot product of two float-array columns via higher-order functions
    * (codegen'd, no UDF). Elements are widened to double BEFORE the multiply
    * and the fold is a sequential left-to-right double accumulation — the
    * same IEEE op sequence DuckDB's list_inner_product over DOUBLE[] runs, so
    * oracle comparisons see bit-identical values. */
  def dot_product(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column (double accumulation, see dot_product). */
  def l2_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity of two float-array columns; 0.0 when either norm is 0
    * (instead of NaN) so downstream top-k ordering is total. */
  def cosine_similarity(a: Column, b: Column): Column = {
    val denom = l2_norm(a) * l2_norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot_product(a, b) / denom)
  }

  // ----------------------------------------------------------------- text --

  /** Whitespace tokenization (the documents table is space-tokenizable by
    * construction); drops empty tokens from repeated spaces. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles joined with single spaces. Documents shorter than
    * `n` tokens collapse to one whole-document shingle so they still get a
    * MinHash signature. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** MinHash signature: k independent hash slots, slot i =
    * min over shingles of xxhash64(i, shingle). Pure column expression —
    * evaluated per row with no shuffle. */
  def minhash_signature(sh: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(sh, s => xxhash64(lit(i), s)))): _*)

  /** Group a MinHash signature into `bands` band-hashes for LSH bucketing:
    * band j = xxhash64 over its `rowsPerBand` signature slots. Two docs land
    * in the same (band index, band hash) bucket iff a band matches exactly.
    */
  def minhash_bands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      val slots = (0 until rowsPerBand)
        .map(r => element_at(sig, j * rowsPerBand + r + 1))
      xxhash64(lit(j) +: slots: _*)
    }: _*)

  /** 64-bit SimHash over a token array: per token, xxhash64 bits vote +1/-1
    * per bit position; final bit j is set iff the vote sum is positive.
    * Composed entirely from higher-order functions — per-row, shuffle-free.
    */
  def simhash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, tokenBitVotes(t), (a, b) => a + b))
    (0 until 64)
      .map(j => when(element_at(votes, j + 1) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  private def tokenBitVotes(t: Column): Column =
    transform(
      sequence(lit(0), lit(63)),
      j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(lit(1L)) === lit(1L), lit(1))
        .otherwise(lit(-1)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Order-sensitive rolling document fingerprint: left fold hashing the
    * running state with each token (`xxhash64(acc, t)`), so permuted token
    * order yields a different print. xxhash64 is closed over Long — no
    * overflow, so it stays legal under Spark 4's default ANSI mode (a plain
    * polynomial `acc * p + h` rolling hash would throw ARITHMETIC_OVERFLOW).
    */
  def doc_fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => xxhash64(acc, t))

  /** Jaccard similarity of the distinct-token sets of two token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }
}
