package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.functions.Pin

/** Pin — the round-11 transcendental grid: the Column forms, the driver
  * twins, and the SQL rendering must agree bit-for-bit, or every
  * "pinned" site inherits a silent asymmetry. */
class PinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("pin-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  // value sweep: magnitudes across the supported range, negatives, exact
  // grid points, near-boundary values, ln/exp outputs
  private def sweep: Seq[Double] = {
    val base = Seq(0.0, 1.0, -1.0, 0.5, -0.5, 1e-9, -1e-9, 0.1234567891234,
      -0.1234567891234, 123.456789012345, -123.456789012345, 5000.123456789,
      math.log(2.0), -math.log(19.0), math.exp(-3.7), math.Pi, 1e-12, 2.5e-10)
    val lns = (1 to 50).map(i => math.log(i / 7.0 + 1e-3))
    val exps = (1 to 50).map(i => math.exp(-i / 11.0))
    base ++ lns ++ exps
  }

  test("Column grid9 == driver grid9, bit-for-bit, across the sweep") {
    import spark.implicits._
    val got = sweep.toDF("x").select(Pin.grid9(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    got.zip(sweep.map(Pin.grid9)).zip(sweep).foreach { case ((g, w), x) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w), s"grid9($x): column=$g driver=$w")
    }
  }

  test("Column grid6 == driver grid6; grid9 of a grid point is identity-stable") {
    import spark.implicits._
    val got = sweep.toDF("x").select(Pin.grid6(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    got.zip(sweep.map(Pin.grid6)).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w))
    }
    // pin is idempotent on its own output (a re-pinned value cannot move
    // a second time — downstream re-pins are safe)
    sweep.map(Pin.grid9).foreach { p =>
      assert(Pin.grid9(p) == p, s"grid9 not idempotent at $p")
    }
  }

  test("grid9Sql in Spark SQL == driver grid9 (same formula, same bits)") {
    import spark.implicits._
    sweep.zipWithIndex.foreach { case (x, _) => () }
    val df = sweep.toDF("x")
    df.createOrReplaceTempView("pin_sweep")
    val got = spark.sql(s"SELECT ${Pin.grid9Sql("x")} AS p FROM pin_sweep")
      .collect().map(_.getDouble(0))
    got.zip(sweep.map(Pin.grid9)).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w))
    }
  }

  test("sqlDouble renders every double as an exponent-typed literal that round-trips") {
    val vals = sweep ++ Seq(1e300, -1e300, 4.9e-324, 1e-5, -1e-5,
      0.12493873660829993, -0.22314355131420976)
    vals.foreach { x =>
      val s = Pin.sqlDouble(x)
      assert(s.exists(c => c == 'e' || c == 'E'),
        s"no exponent in $s — DuckDB would type it DECIMAL")
      assert(s.toDouble == x, s"round-trip failed: $x -> $s")
    }
  }
}
