package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class CalibrationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("hand-computed reliability bins and ECE") {
    // bin (0.6, 0.8]→4: scores {0.7, 0.7}, labels {1, 0} → conf .7, acc .5
    // bin (0.8, 1.0]→5: scores {0.9, 0.9}, labels {1, 1} → conf .9, acc 1
    val df = Seq((0.7, 1.0), (0.7, 0.0), (0.9, 1.0), (0.9, 1.0))
      .toDF("score", "label")
    val got = Calibration.reliability(df, "score", "label", nBins = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(4L, 5L))
    assert(got(4L) == ((2L, 0.7, 0.5, 0.2, 0.15)))
    // ECE = (2/4)·|.5−.7| + (2/4)·|1−.9| = 0.15 on every row
    assert(got(5L) == ((2L, 0.9, 1.0, 0.1, 0.15)))
  }

  test("a perfectly calibrated score has ECE 0; boundary scores bin correctly") {
    // score .5 with exactly half positives, score 1.0 all positive —
    // each bin's positive rate equals its mean score, and 1.0 must land
    // in the TOP bin (not overflow past it)
    val perfect = (Seq.fill(4)((0.5, 1.0)) ++ Seq.fill(4)((0.5, 0.0)) ++
      Seq.fill(4)((1.0, 1.0))).toDF("score", "label")
    val got = Calibration.reliability(perfect, "score", "label", nBins = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(5))).toMap
    assert(got.keySet == Set(3L, 4L), s"bins ${got.keySet}") // 0.5→bin 3 under B=4
    assert(got(3L)._1 == 0.5 && got(4L)._1 == 1.0)
    assert(got.values.forall(_._2 == 0.0), "perfectly calibrated → ECE 0")
    intercept[IllegalArgumentException](
      Calibration.reliability(perfect, "score", "label", nBins = 1))
  }

  test("an over-confident score is flagged with a large ECE") {
    // model says 0.95 but is right only half the time
    val over = (Seq.fill(10)((0.95, 1.0)) ++ Seq.fill(10)((0.95, 0.0)))
      .toDF("score", "label")
    val ece = Calibration.reliability(over, "score", "label", nBins = 10)
      .collect().head.getDouble(5)
    assert(ece == 0.45, s"ece $ece")
  }

  test("langIdScored: confidence is the winning-share of stopword hits") {
    val df = Seq(
      (1L, "the cat sat in the mat and the dog"), // 'in' hits en AND de
      (2L, "xyzzy qwerty")).toDF("doc_id", "text") // no hits: und, conf 0
    val got = df.select($"doc_id",
        TextAnalysis.langIdScored($"text").as("s"))
      .select($"doc_id", $"s.lang_pred", $"s.confidence")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // doc 1: en hits {the×3, and, in} = 5; de hits {in} = 1 (the shared
    // stopword); es/fr 0 — total 6, confidence round(5/6, 4)
    assert(got(1L) == (("en", 0.8333)), s"got ${got(1L)}")
    assert(got(2L) == (("und", 0.0)))
  }
}
