package graft

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.features.FeatureBuilder
import graft.labels.LabelBuilder
import graft.ops.Commodities
import graft.silver.TransactionsAdj
import graft.train.TrainingSetBuilder

/** Throwaway dev probe: A/B the training_set assembly join strategy with
  * alternating executions in one JVM (mins cancel host contention).
  * Not part of any query contract.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val DevHarness.Ctx(spark, sfDir) = DevHarness.init("probe")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val warmDir = "/root/testdata/sf0.01"
    graft.core.Catalog.registerAll(spark, warmDir)
    TransactionsAdj(spark, warmDir)
    (1 to 2).foreach { _ =>
      DevHarness.query("training_set")(spark, warmDir).queryExecution.toRdd.count()
    }
    graft.core.Catalog.registerAll(spark, sfDir)

    val tx = TransactionsAdj(spark, sfDir)
    def withAqe0[A](on: Boolean)(f: => A): A = {
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, prev)
    }
    val txc = withAqe0(false)(
      FeatureBuilder.txWithCommodity(spark, sfDir).localCheckpoint(true))
    val (_, cur) = graft.core.Retail.dayBounds(spark, sfDir)
    val fed = cur.minusDays(LabelBuilder.horizonDays)
    val fedD = Date.valueOf(fed)
    val labels = LabelBuilder.labels(txc, Commodities.commoditiesToScore(spark, sfDir), fed)
    val txAsOf = tx.filter(col("day") <= lit(fedD))
    val txcAsOf = txc.filter(col("day") <= lit(fedD))
    val hb = FeatureBuilder.bounds(txAsOf)
    val cb = FeatureBuilder.bounds(txcAsOf)
    val ctsNames = Commodities.commoditiesToScore(spark, sfDir)
      .select("commodity_desc").collect().map(_.getString(0)).toSeq
    val txcScored = txcAsOf.filter(col("commodity_desc").isin(ctsNames: _*))
    val spineT = labels.localCheckpoint(true)
    val h = FeatureBuilder.build(txAsOf, FeatureBuilder.household,
      knownBounds = Some(hb)).localCheckpoint(true)
    val c = FeatureBuilder.build(txcScored, FeatureBuilder.commodity,
      knownBounds = Some(cb)).localCheckpoint(true)
    val hc = FeatureBuilder.build(txcScored, FeatureBuilder.householdCommodity,
      knownBounds = Some(cb)).localCheckpoint(true)

    def assemble(strategy: String): DataFrame = {
      val joined = Seq(
        (h, Seq("household_key"), "household__", false),
        (c, Seq("commodity_desc"), "commodity__", true),
        (hc, Seq("household_key", "commodity_desc"), "household_commodity__", false))
        .foldLeft(spineT) { case (df, (ft, ks, pfx, bcast)) =>
          val metricCols = ft.columns.toSeq.filterNot(ks.contains)
          val proj = ft.select(ks.map(col) ++ metricCols.map(cn => col(cn).as(s"$pfx$cn")): _*)
          val side =
            if (bcast) broadcast(proj)
            else if (strategy == "shj") proj.hint("shuffle_hash")
            else if (strategy == "bhj") broadcast(proj)
            else proj
          df.join(side, ks, "left_outer")
        }
      val featureCols = joined.columns.filterNot(spineT.columns.contains)
      joined.na.fill(0.0, featureCols)
    }

    def withAqe[A](on: Boolean)(f: => A): A = {
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, prev)
    }
    // co-partitioned variant: checkpoint under AQE OFF so the LogicalRDD
    // captures the concrete HashPartitioning(household_key) from the
    // bucketed-silver lineage; the assembly should then need no exchange.
    val (spineP, hP, cP, hcP) = withAqe(false) {
      val sp = labels.localCheckpoint(true)
      val h2 = FeatureBuilder.build(txAsOf, FeatureBuilder.household,
        knownBounds = Some(hb)).localCheckpoint(true)
      val c2 = FeatureBuilder.build(txcScored, FeatureBuilder.commodity,
        knownBounds = Some(cb)).localCheckpoint(true)
      val hc2 = FeatureBuilder.build(txcScored, FeatureBuilder.householdCommodity,
        knownBounds = Some(cb)).localCheckpoint(true)
      (sp, h2, c2, hc2)
    }
    def assembleP(strategy: String): DataFrame = {
      val joined = Seq(
        (hP, Seq("household_key"), "household__", false),
        (cP, Seq("commodity_desc"), "commodity__", true),
        (hcP, Seq("household_key", "commodity_desc"), "household_commodity__", false))
        .foldLeft(spineP) { case (df, (ft, ks, pfx, bcast)) =>
          val metricCols = ft.columns.toSeq.filterNot(ks.contains)
          val proj = ft.select(ks.map(col) ++ metricCols.map(cn => col(cn).as(s"$pfx$cn")): _*)
          val side =
            if (bcast) broadcast(proj)
            else if (strategy == "shj") proj.hint("shuffle_hash")
            else proj
          df.join(side, ks, "left_outer")
        }
      val featureCols = joined.columns.filterNot(spineP.columns.contains)
      joined.na.fill(0.0, featureCols)
    }
    val strategies = Seq("smj", "shj", "smjCoPart", "shjCoPart", "smjCoPartNoAqe")
    def run(st: String): Unit = st match {
      case "smj" => assemble("smj").queryExecution.toRdd.count(); ()
      case "shj" => assemble("shj").queryExecution.toRdd.count(); ()
      case "smjCoPart" => assembleP("smj").queryExecution.toRdd.count(); ()
      case "shjCoPart" => assembleP("shj").queryExecution.toRdd.count(); ()
      case "smjCoPartNoAqe" => withAqe(false)(assembleP("smj").queryExecution.toRdd.count()); ()
    }
    // compile/JIT warm per strategy
    strategies.foreach(run)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to 6).foreach { _ =>
      strategies.foreach { st =>
        val s = time(run(st))
        times(st) = s :: times.getOrElse(st, Nil)
      }
    }
    strategies.foreach { st =>
      val ts = times(st)
      println(f"[probe] assembly-$st%-14s min ${ts.min}%6.2f s  all ${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    }
    println("---- coPart SHJ plan ----")
    val qe = assembleP("shj").queryExecution
    qe.toRdd.count()
    println(qe.executedPlan.treeString(verbose = false)
      .linesIterator.map(_.take(110)).take(36).mkString("\n"))
    spark.stop()
  }
}
