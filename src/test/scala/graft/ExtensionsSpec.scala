package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point: a session built with
  * `withExtensions(new GraftExtensions)` can call graft's native
  * expressions from plain SQL. Runs with parallelExecution off (build.sbt)
  * so replacing the shared default session is safe.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("vec_dot is callable from SQL via GraftExtensions") {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val d = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1), array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(err.getMessage.contains("vec_dot") || err.getMessage.contains("DATATYPE"))
  }
}
