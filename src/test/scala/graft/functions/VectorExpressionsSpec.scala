package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DotProduct matches the HOF fold it replaces — including the null
  * and length-mismatch poisoning semantics. */
class VectorExpressionsSpec extends SparkSpec {

  private def viaHof = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
    (acc, x) => acc + x)

  test("dot_product agrees with aggregate(zip_with) on clean and dirty input") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0))
    ).toDF("a", "b")
    val rows = df.select(
      expr("dot_product(a, b)").as("native"), viaHof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(!rows(0).isNullAt(0) && rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0)) // null element poisons
    assert(rows(2).isNullAt(0)) // length mismatch poisons
  }

  test("float mode is bit-identical to double mode over pre-cast arrays") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // values chosen so float storage precision differs from the
    // decimal literal (0.1f != 0.1): the float mode must widen each
    // ELEMENT before multiplying, not multiply in float
    val df = Seq(
      (Seq(0.1f, 0.3f, 0.7f, 1e-7f), Seq(0.9f, 1.1f, -0.3f, 3e7f)),
      (Seq(1.5f, -2.25f), Seq(4.0f, 8.0f))
    ).toDF("fa", "fb")
      .withColumn("da", transform(col("fa"), x => x.cast("double")))
      .withColumn("db", transform(col("fb"), x => x.cast("double")))
    val rows = df.select(
      expr("dot_product(fa, fb)").as("flt"),
      expr("dot_product(da, db)").as("dbl")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"float mode diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }
}
