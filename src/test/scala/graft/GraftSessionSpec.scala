package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("Graft.session reuses the active session and registers SQL functions") {
    GraftSpark.spark // existing session in this JVM
    val s = Graft.session()
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    val r = s.sql("SELECT graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
