package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ModelEval

class ModelEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("auc matches the hand-computed value on a tied example") {
    // scores: pos {0.9, 0.5, 0.5}, neg {0.5, 0.3, 0.1}
    // pairs P×N = 9: 0.9 beats all 3; each 0.5-pos beats 2, ties 1
    // U = 3 + 2.5 + 2.5 = 8 → AUC = 8/9
    val df = Seq(
      (0.9, 1), (0.5, 1), (0.5, 1),
      (0.5, 0), (0.3, 0), (0.1, 0)).toDF("score", "purchased")
    val r = ModelEval.auc(df).head()
    assert(math.abs(r.getDouble(0) - 8.0 / 9.0) < 1e-9)
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
  }

  test("auc equals MLlib BinaryClassificationEvaluator areaUnderROC") {
    val rnd = new scala.util.Random(42)
    // tie-free random scores plus a correlated signal so AUC is not 0.5
    val rows = (1 to 500).map { i =>
      val label = if (rnd.nextDouble() < 0.3) 1 else 0
      val score = math.rint((rnd.nextDouble() * 0.7 + label * 0.3) * 1e9) / 1e9
      (score, label)
    }
    val df = rows.toDF("score", "purchased").repartition(7)
    val got = ModelEval.auc(df).head().getDouble(0)
    val ev = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("score").setLabelCol("purchased")
      .setMetricName("areaUnderROC")
    val want = ev.evaluate(
      df.select(col("score"), col("purchased").cast("double")))
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")
  }

  test("lift table: bins partition rows, capture ends at 1, lift averages to 1") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 1000).map { i =>
      val label = if (rnd.nextDouble() < 0.2) 1 else 0
      (math.rint((rnd.nextDouble() + label * 0.5) * 1e9) / 1e9, label)
    }
    val df = rows.toDF("score", "purchased").repartition(5)
    val lift = ModelEval.liftTable(df, nBins = 10).orderBy("bin").collect()
    assert(lift.map(_.getLong(1)).sum == 1000L)
    assert(lift.map(_.getLong(2)).sum == rows.count(_._2 == 1).toLong)
    val lastCapture = lift.last.getDouble(4)
    assert(math.abs(lastCapture - 1.0) < 1e-9)
    // top decile of a correlated score must out-lift the bottom
    assert(lift.head.getDouble(5) > lift.last.getDouble(5))
    // Σ rows_b · lift_b = total (lift is response/base): weighted avg 1
    val total = 1000.0
    val weighted = lift.map(r => r.getLong(1) * r.getDouble(5)).sum /
      (total * lift.map(_.getLong(2)).sum / total / (total / 10) / 10)
    // simpler invariant: Σ positives = Σ rows·response
    val recomposed = lift.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(recomposed - rows.count(_._2 == 1)) < 1e-4)
  }

  test("lift bins never split a tied score group") {
    // 100 rows all with the same score → every row lands in bin 0
    val df = (1 to 100).map(i => (0.5, i % 2)).toDF("score", "purchased")
    val lift = ModelEval.liftTable(df, nBins = 10).collect()
    assert(lift.length == 1 && lift.head.getInt(0) == 0)
    assert(lift.head.getLong(1) == 100L)
  }

  test("calibration: bins cover rows; mean_score inside bin bounds") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 800).map { _ =>
      val s = math.rint(rnd.nextDouble() * 1e9) / 1e9
      (s, if (rnd.nextDouble() < s) 1 else 0) // perfectly calibrated source
    }
    val df = rows.toDF("score", "purchased").repartition(3)
    val cal = ModelEval.calibration(df, nBins = 10).orderBy("bin").collect()
    assert(cal.map(_.getLong(1)).sum == 800L)
    cal.foreach { r =>
      val bin = r.getInt(0); val mean = r.getDouble(3)
      assert(mean >= bin / 10.0 - 1e-9 && mean <= (bin + 1) / 10.0 + 1e-9)
      // calibrated source: observed rate within a loose band of the mean
      assert(math.abs(r.getDouble(4) - mean) < 0.2)
    }
    // score = 1.0 must clamp into the last bin, not bin 10
    val edge = ModelEval.calibration(Seq((1.0, 1)).toDF("score", "purchased"))
    assert(edge.head().getInt(0) == 9)
  }
}
