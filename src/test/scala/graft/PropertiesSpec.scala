package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Loads
import graft.schema.{Ddl, SqlDialect}

/** Property-based tests (SURVEY.md §5.3): DDL round trip and
  * merge-semantics invariants over ScalaCheck-generated data (raw Gen with
  * fixed seeds — deterministic, no scalatestplus bridge needed).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  // ---- DDL round trip ----

  private val cleanTypes: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, StringType, BooleanType, TimestampType, DateType,
    DecimalType(12, 2), DecimalType(38, 9))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    fields <- Gen.listOfN(n, for {
      name <- Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
      dt <- cleanTypes
      nullable <- Gen.oneOf(true, false)
    } yield StructField(name, dt, nullable))
  } yield StructType(fields.zipWithIndex.map { case (f, i) => f.copy(name = s"${f.name}_$i") })

  test("property: schemaToDdl then ddlToSchema is identity on clean types (all dialects)") {
    for {
      schema <- samples(schemaGen, 15)
      dialect <- Seq(SqlDialect.MySql, SqlDialect.SqlServer, SqlDialect.Postgres)
    } {
      val ddl = Ddl.schemaToDdl(schema, "t", dialect)
      val back = Ddl.ddlToSchema(ddl, dialect)
      assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq,
        s"\ndialect=$dialect ddl=\n$ddl")
    }
  }

  test("NVARCHAR promotion survives the round trip") {
    val s = StructType(Seq(StructField("c", StringType)))
    val marked = Ddl.markNvarchar(s, Map("c" -> true))
    val back = Ddl.ddlToSchema(Ddl.schemaToDdl(marked, "t", SqlDialect.SqlServer), SqlDialect.SqlServer)
    assert(back("c").metadata.getBoolean(graft.schema.TypeMap.NvarcharKey))
  }

  // ---- merge-semantics invariants over generated keyed data ----

  private val rowsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 15L)
      day <- Gen.choose(0L, 60L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, day, v))
  } yield rows

  test("property: upsert is idempotent, keyed-complete, incoming-wins") {
    for ((e, i) <- samples(rowsGen, 8).zip(samples(rowsGen, 8).reverse)) {
      val existing = e.distinctBy(_._1).toDF("k", "day", "v")
      val incoming = i.distinctBy(_._1).toDF("k", "day", "v")
      val once = Loads.upsert(existing, incoming, Seq("k"))
      val twice = Loads.upsert(once, incoming, Seq("k"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(once.groupBy("k").count().filter(col("count") =!= 1).isEmpty)
      val incomingKeys = incoming.select("k").as[Long].collect().toSet
      if (incomingKeys.nonEmpty) {
        val winners = once.filter(col("k").isin(incomingKeys.toSeq: _*))
        assert(winners.exceptAll(incoming).isEmpty)
      }
    }
  }

  test("property: L5 refresh is idempotent; L3 re-run appends exactly the overlap") {
    for (rows <- samples(rowsGen, 8)) {
      val existing = rows.toDF("k", "day", "v")
      val windowPred = col("day") >= 30L
      val incoming = existing.filter(windowPred)
      val l5Once = Loads.refreshWindow(existing, incoming, windowPred)
      val l5Twice = Loads.refreshWindow(l5Once, incoming, windowPred)
      assert(l5Once.exceptAll(l5Twice).isEmpty && l5Twice.exceptAll(l5Once).isEmpty)

      val l3Once = Loads.retainThenAppend(existing, incoming, windowPred)
      assert(l3Once.count() == existing.filter(windowPred).count() + incoming.count())
    }
  }
}
