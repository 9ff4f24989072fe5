package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class ScaleSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain join") {
    val li = Tables.lineitem(spark, GraftSpark.Sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, GraftSpark.Sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Scale.saltedJoin(li, o, "l_orderkey", saltFactor = 8).count()
    assert(salted == plain)
  }

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, GraftSpark.Sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, GraftSpark.Sf0001).select("o_orderkey", "o_totalprice")
    Scale.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    Scale.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bkt", "l_orderkey", 4)
    val joined = spark.table("li_bkt").join(spark.table("o_bkt"), Seq("l_orderkey"))
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
