package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class VectorExprsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graft_dot matches the interpreted aggregate/zip_with fold bit-for-bit") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // the trailing + 0.0 keeps this OUT of RewriteLambdaDot's strict
    // match, so b really is the interpreted fold (x + 0.0 == x for
    // every product sum, so values are unchanged)
    val bad = e.withColumn("a", call_function("graft_dot", col("v"), col("v")))
      .withColumn("b",
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x + 0.0)"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad == 0)
  }

  test("graft_dot handles nulls, empty and length-mismatched arrays") {
    val rows = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       graft_dot(array(), CAST(array() AS ARRAY<DOUBLE>)) AS b,
        |       graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS c,
        |       graft_dot(array(2.0d, 3.0d), array(4.0d)) AS d""".stripMargin).collect()(0)
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1) == 0.0)
    assert(rows.getDouble(2) == 23.0)
    // mismatch → null, same as the lambda form (zip_with null-pads)
    assert(rows.isNullAt(3))
  }

  test("graft_dot: null ELEMENTS return null, matching the lambda fold") {
    // containsNull=true arrays (the typical transform/CAST output) with
    // a null slot: the lambda form's null poisons the sum; graft_dot
    // must agree or RewriteLambdaDot silently changes results
    val rows = spark.sql(
      """SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d)) AS a,
        |       aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d),
        |                          (x, y) -> x * y), 0D, (acc, x) -> acc + x + 0.0) AS b,
        |       graft_dot(array(2.0d, 3.0d), array(CAST(NULL AS DOUBLE), 5.0d)) AS c""".stripMargin)
      .collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    // and the rewrite itself preserves the null on a real (non-foldable)
    // plan: null out element 0 of every embedding, fire the rule, every
    // dot must come back null
    val viaRule = Tables.embeddings(spark, sf)
      .select(expr(
        "transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS DOUBLE), CAST(x AS DOUBLE)))").as("v"))
      .select(expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("d"))
    assert(viaRule.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(viaRule.filter(col("d").isNotNull).count() == 0)
  }

  test("RewriteLambdaDot: the natural lambda form optimizes to graft_dot") {
    val e = Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val lambda = e.select(
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("d"))
    val opt = lambda.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"rule did not fire:\n$opt")
    // and the rewritten result equals the explicit native call
    val native = e.select(call_function("graft_dot", col("v"), col("v")).as("d"))
    assert(lambda.exceptAll(native).isEmpty && native.exceptAll(lambda).isEmpty)
  }

  test("RewriteLambdaDot leaves non-dot folds alone") {
    val e = Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    for (form <- Seq(
        // not a multiply
        "aggregate(zip_with(v, v, (x, y) -> x + y), 0D, (acc, x) -> acc + x)",
        // nonzero seed
        "aggregate(zip_with(v, v, (x, y) -> x * y), 1D, (acc, x) -> acc + x)")) {
      val opt = e.select(expr(form).as("d")).queryExecution.optimizedPlan.toString
      assert(!opt.contains("graft_dot"), s"rule over-matched on: $form")
    }
  }

  test("EquiDepthBucket equals the literal-array lambda rank, including dup cuts and NaN") {
    import spark.implicits._
    val cuts = Array(1.0, 2.0, 2.0, 5.5, 9.0) // duplicates on purpose
    val vals = Seq(0.0, 1.0, 1.5, 2.0, 3.0, 5.5, 9.0, 10.0, Double.NaN,
      Double.NegativeInfinity, Double.PositiveInfinity)
    val df = vals.toDF("v")
    val arr = cuts.mkString("array(", "D, ", "D)")
    val got = df.select(
      graft.functions.Native.bucket(col("v"), cuts).as("b"),
      expr(s"size(filter($arr, c -> v >= c))").as("want")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null in, bucket 0 out — matching the lambda it replaced (a null
    // predicate drops every cut from the filter → size 0) and keeping
    // one null column from poisoning the whole interleaved Morton code
    val n = Seq[Option[Double]](None).toDF("v")
      .select(graft.functions.Native.bucket(col("v"), cuts)).collect()
    assert(!n.head.isNullAt(0) && n.head.getInt(0) == 0)
  }
}
