package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import Erasure._

class ErasureSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def fixture = {
    val customer = Seq((1L, "ann"), (2L, "bob")).toDF("custkey", "name")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("orderkey", "custkey")
    val lineitem = Seq((10L, "a"), (10L, "b"), (12L, "c")).toDF("orderkey", "part")
    (customer, orders, lineitem)
  }

  test("two-hop cascade ledger: subject rows, their orders, those orders' lines") {
    val (customer, orders, lineitem) = fixture
    val got = cascadeDelete(Seq(1L).toDF("k"), Seq(
        CascadeStep("customer", customer, "custkey"),
        CascadeStep("orders", orders, "custkey", emitKey = Some("orderkey")),
        CascadeStep("lineitem", lineitem, "orderkey", from = Some("orders"))))
      .orderBy("table_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("customer", 1L, 1L),
      ("lineitem", 2L, 1L),  // both lines of order 10; order 12's line stays
      ("orders", 2L, 1L)))
  }

  test("cascadeKeys: the ledger and the physical delete legs share key frames") {
    val (customer, orders, lineitem) = fixture
    val steps = Seq(
      CascadeStep("customer", customer, "custkey"),
      CascadeStep("orders", orders, "custkey", emitKey = Some("orderkey")),
      CascadeStep("lineitem", lineitem, "orderkey", from = Some("orders")))
    val subjects = Seq(1L).toDF("k")
    val ledger = cascadeDelete(subjects, steps).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cascadeKeys(subjects, steps).foreach { case (st, keys) =>
      val kept = retained(st.df, st.fkCol, keys).count()
      assert(st.df.count() - kept == ledger(st.table),
        s"retained(${st.table}) must drop exactly the ledger's n_deleted")
    }
  }

  test("cascading from a step that emitted no keys is rejected") {
    val (customer, orders, _) = fixture
    intercept[IllegalArgumentException] {
      cascadeDelete(Seq(1L).toDF("k"), Seq(
        CascadeStep("customer", customer, "custkey"), // no emitKey
        CascadeStep("orders", orders, "custkey", from = Some("customer"))))
    }
  }

  test("duplicate step table names fail fast (emitted-key map is name-keyed)") {
    val (customer, orders, _) = fixture
    intercept[IllegalArgumentException] {
      cascadeDelete(Seq(1L).toDF("k"), Seq(
        CascadeStep("customer", customer, "custkey", emitKey = Some("custkey")),
        CascadeStep("customer", orders, "custkey", emitKey = Some("orderkey"))))
    }
  }

  test("subjects must be a single key column") {
    val (customer, _, _) = fixture
    intercept[IllegalArgumentException] {
      cascadeDelete(customer, Seq(CascadeStep("customer", customer, "custkey")))
    }
  }

  test("retained: anti-join keeps NULL fks (they name no subject)") {
    val child = Seq(Some(1L), Some(2L), None).toDF("fk")
    val out = retained(child, "fk", Seq(1L).toDF("k"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSet == Set(Some(2L), None))
  }

  test("empty subject set deletes nothing") {
    val (customer, orders, lineitem) = fixture
    val got = cascadeDelete(Seq.empty[Long].toDF("k"), Seq(
        CascadeStep("customer", customer, "custkey"),
        CascadeStep("orders", orders, "custkey", emitKey = Some("orderkey")),
        CascadeStep("lineitem", lineitem, "orderkey", from = Some("orders"))))
      .collect().map(r => r.getLong(1)).sum
    assert(got == 0L)
  }
}
