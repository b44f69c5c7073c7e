package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared hash-stable output formatting for oracle-checked queries: exact
  * decimal snapped to scale 2, emitted as double (decimal strings carry
  * trailing zeros that a float-normalizing hash drops).
  *
  * VALIDITY BOUND: bit-parity with DuckDB's int64→double path holds only
  * while the unscaled value (sum × 100) stays within 2^53 (~9e13 at scale 2)
  * — both engines then produce the same exactly-representable double. The
  * guard fails the query rather than silently hash-mismatching if a larger
  * scale factor ever crosses the bound.
  */
object Fmt {

  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  def dbl(c: Column): Column = {
    val d = dec(c)
    when(abs(d) > lit(9.0e13),
      raise_error(concat(lit("decimal->double hash parity bound exceeded: "), d.cast("string"))))
      .otherwise(d.cast("double"))
  }
}
