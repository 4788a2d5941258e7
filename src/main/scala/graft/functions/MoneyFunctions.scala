package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal money arithmetic — the remedy for the one failure the
  * whole-catalog 100× oracle sweep surfaced (q03, SCALE.md r15): a
  * `sum(double)` is non-associative, so once a money total needs more
  * significant digits than a double carries (~15.95; a 12-digit total
  * at 2 decimals is already there), the reduction ORDER decides the
  * last rounded digit. On one box that makes Spark and DuckDB disagree
  * by 0.03 in 5·10¹¹; on a 1000-executor cluster it makes the SAME
  * query disagree with ITSELF run-to-run, because shuffle partition
  * order is not deterministic. Money at 100 TB must therefore
  * aggregate in exact decimals, where addition is associative and the
  * result is partition-order-free.
  *
  * The recovery step is the subtle part: the lake stores money as
  * doubles holding NOMINAL 2-decimal values. `CAST(x AS DECIMAL(18,2))`
  * recovers the intended decimal exactly on BOTH engines because both
  * round the double's shortest decimal representation (Spark:
  * `BigDecimal.valueOf` → `setScale(2, HALF_UP)`; DuckDB's double→
  * decimal cast measured identical on the 2.675/8.945/1.005 edge
  * family — SCALE.md r15 type-pairing table). From there every
  * multiply/sum is integer arithmetic in e4 units: exact, associative,
  * identical everywhere.
  */
object MoneyFunctions {

  /** Recover the exact 2-decimal money value a double column denotes.
    * DECIMAL(18,2) holds ±9.99e15 — any row-level money amount. */
  def money2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact discounted net `price · (1 − discount)`: DECIMAL(18,2) ×
    * DECIMAL(19,2) → DECIMAL(38,4), integer-exact in e4 units (the
    * true product needs 4 decimals and ~17 digits — no rounding). */
  def discountedNet(price: Column, discount: Column): Column =
    money2(price) * (lit(1) - money2(discount))

  /** Canonical output edge for a decimal total that can exceed Int64
    * in e4 units at warehouse scale (the r15 driver-hash contract:
    * >Int64-capable columns cross as decimal STRINGS on both sides —
    * DECIMAL↔HUGEINT hash differently at the driver). Scale pinned to
    * 4 so trailing-zero rendering matches DuckDB's
    * `CAST(... AS DECIMAL(38,4)) :: VARCHAR` digit-for-digit. */
  def decimalEdgeE4(c: Column): Column = c.cast("decimal(38,4)").cast("string")
}
