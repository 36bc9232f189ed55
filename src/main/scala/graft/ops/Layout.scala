package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve clustering keys.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the lever
  * on the scan is LAYOUT: files sorted so min/max column statistics prune.
  * A plain sort clusters one column; a Z-order (Morton) key interleaves the
  * bits of several, so range predicates on ANY of the interleaved columns
  * map to a bounded number of key ranges — `repartitionByRange(zkey)` +
  * sortWithinPartitions then writes files whose per-column min/max spans
  * are tight on every dimension at once.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Pure bit arithmetic (shift/mask/or) — codegen'd per row, no shuffle,
    * and exactly reproducible in any engine. Callers bucket/clamp inputs
    * into [0, 2^bits) first; 2·bits ≤ 62 keeps the key in a positive long. */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustering demo over orders: customer bucket × price bucket
    * (10 bits each), the two columns an order-lookup workload filters on.
    * Emits the per-row key for a deterministic slice (pinning the exact
    * interleave cross-engine) — the layout job itself is
    * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` before the
    * write, asserted in LayoutSpec. */
  def zorderOrders(orders: DataFrame, maxOrderKey: Long = 1000): DataFrame = {
    val x = pmod(col("o_custkey"), lit(1024L))
    val y = least(floor(col("o_totalprice") / 500).cast("long"), lit(1023L))
    orders
      .where(col("o_orderkey") < maxOrderKey)
      .select(col("o_orderkey"), x.as("x"), y.as("y"))
      .withColumn("z", zorderKey(col("x"), col("y"), 10))
      .orderBy("o_orderkey")
  }
}
