package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** DataFrame-API entry points for the custom Catalyst expressions (usable
  * in any session; [[GraftExtensions]] additionally exposes them to SQL
  * text). */
package object functions {

  /** Fused-loop dot product over two `array<double>` columns. */
  def vector_dot(a: Column, b: Column): Column =
    ColumnShim.column(VectorDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Morton (Z-order) interleave of two bigint columns' low `bits` bits. */
  def z_value(x: Column, y: Column, bits: Int = 21): Column =
    ColumnShim.column(ZValue(ColumnShim.expression(x), ColumnShim.expression(y), bits))
}
