package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GP `complex` type (reference: src/include/catalog/pg_type.h:380-381,
  * src/backend/utils/adt/complex_type.c) as StructType(re double, im double)
  * with codegen'd arithmetic. */
object ComplexFunctions {
  def complex(re: Column, im: Column): Column =
    struct(re.cast("double").as("re"), im.cast("double").as("im"))

  def re(c: Column): Column = c.getField("re")
  def im(c: Column): Column = c.getField("im")

  def cadd(a: Column, b: Column): Column =
    complex(re(a) + re(b), im(a) + im(b))

  def csub(a: Column, b: Column): Column =
    complex(re(a) - re(b), im(a) - im(b))

  def cmul(a: Column, b: Column): Column =
    complex(re(a) * re(b) - im(a) * im(b), re(a) * im(b) + im(a) * re(b))

  /** |z| — complex modulus (dotproduct norm). */
  def cabs(c: Column): Column = sqrt(re(c) * re(c) + im(c) * im(c))

  /** Complex conjugate. */
  def conj(c: Column): Column = complex(re(c), -im(c))
}
