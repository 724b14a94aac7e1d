package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class VectorExprsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graft_dot matches the interpreted aggregate/zip_with fold bit-for-bit") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val bad = e.withColumn("a", call_function("graft_dot", col("v"), col("v")))
      .withColumn("b",
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad == 0)
  }

  test("graft_dot handles nulls and empty arrays") {
    val rows = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       graft_dot(array(), CAST(array() AS ARRAY<DOUBLE>)) AS b,
        |       graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS c""".stripMargin).collect()(0)
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1) == 0.0)
    assert(rows.getDouble(2) == 23.0)
  }
}
