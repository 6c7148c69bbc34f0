package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.features.FeatureTable
import graft.silver.TransactionsAdj

/** Property tests (SURVEY.md §5.3) — invariants over generated inputs.
  * Spark-backed, so the sample count is kept small.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val moneyGen = Gen.chooseNum(0.01, 999.99)
  private val rateGen = Gen.chooseNum(0.0, 0.10)

  private val txRowsGen = Gen.nonEmptyListOf(
    for {
      sv <- moneyGen; rd <- rateGen; cd <- rateGen
      hh <- Gen.chooseNum(1L, 5L)
    } yield (hh, sv, rd, cd)).map(_.take(40))

  property("silver: amount_list always = paid + instore + total_coupon") =
    forAll(txRowsGen) { rows =>
      val df = rows.zipWithIndex.map { case ((hh, sv, rd, cd), i) =>
        (hh, i.toLong, java.sql.Date.valueOf("2024-01-01"), i.toLong, 1L, 1.0, sv, rd, cd)
      }.toDF("household_key", "basket_id", "day", "product_id", "store_id",
        "quantity", "sales_value", "retail_disc_rate", "coupon_disc_rate")
      val cols = TransactionsAdj.keyColumns.map(col) ++
        Seq(col("quantity").cast("int").as("units")) ++
        TransactionsAdj.derivedColumns.map { case (n, c) => c.as(n) }
      val out = df.select(cols: _*)
      out.filter(
        abs(col("amount_list") - (col("amount_paid") + col("instore_discount") +
          col("total_coupon_discount"))) > 1e-9).count() == 0L
    }

  property("upsert: second upsert of same batch never changes row count") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 20L)).map(_.distinct.take(10))) { keys =>
      val dir = java.nio.file.Files.createTempDirectory("prop-ft").toString + "/t"
      val t = FeatureTable(dir, Seq("k"))
      val df = keys.map(k => (k, k * 2.0)).toDF("k", "v")
      t.upsert(spark, df)
      val c1 = t.read(spark).count()
      t.upsert(spark, df)
      val c2 = t.read(spark).count()
      c1 == keys.size.toLong && c2 == c1
    }

  private val docGen: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    Gen.listOfN(6, doc).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  property("jaccard: pairs are canonical (a<b) and bounded in (0,1]") =
    forAll(docGen) { docs =>
      val pairs = Dedup.ngramJaccardPairs(
        docs.toDF("doc_id", "text"), n = 3, threshold = 0.0).collect()
      pairs.forall { r =>
        val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
        val j = r.getAs[Double]("jaccard")
        a < b && j > 0.0 && j <= 1.0
      }
    }

  property("exact dedup: canonical ids partition the doc set") =
    forAll(docGen) { docs =>
      val out = Dedup.exact(docs.toDF("doc_id", "text"))
      out.agg(sum(col("n_copies"))).head().getLong(0) == docs.size.toLong
    }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    "the", "a", "fox", "data", "x1", "zz")).map(_.mkString(" "))

  property("chunk: overlap removal reconstructs every document exactly") =
    forAll(Gen.nonEmptyListOf(textGen).map(_.take(8)),
      Gen.chooseNum(2, 30), Gen.chooseNum(0, 1)) { (texts, size, ovFlag) =>
      val overlap = math.min(ovFlag * (size / 2), size - 1)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = graft.text.Curation.chunk(docs, size, overlap)
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.forall { case (t, i) =>
        val cs = chunks.getOrElse(i.toLong, Array.empty)
          .sortBy(_.getLong(1)).map(_.getString(3))
        val rebuilt =
          if (cs.isEmpty) ""
          else cs.head + cs.tail.map(_.drop(overlap)).mkString
        rebuilt == t
      }
    }

  property("pack: per-stream offsets replay the running token sum") =
    forAll(Gen.nonEmptyListOf(textGen).map(_.take(12)),
      Gen.chooseNum(4L, 64L)) { (texts, ctx) =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"src${i % 2}", t) }.toDF("doc_id", "source", "text")
      val rows = graft.text.Curation
        .packSequences(docs, ctx, Seq("source"), shards = 2)
        .collect().groupBy(r => (r.getString(1), r.getLong(2)))
      rows.values.forall { rs =>
        var cum = 0L
        rs.sortBy(_.getLong(0)).forall { r =>
          val ok = r.getLong(4) == cum / ctx && r.getLong(5) == cum % ctx
          cum += r.getLong(3); ok
        }
      }
    }

  property("sessionize: sessions partition events per user") =
    forAll(Gen.listOfN(15,
      for {
        u <- Gen.chooseNum(1L, 3L)
        off <- Gen.chooseNum(0L, 7200L)
      } yield (u, off))) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, off), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000L), u, "e", 1.0, "")
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val sessions = graft.streaming.EventOps.sessionize(df)
      sessions.agg(sum(col("n_events"))).head().getLong(0) == evs.size.toLong
    }

  property("range join: bucketization never changes the matched pair set") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-500L, 500L)).map(_.take(30)),
      Gen.nonEmptyListOf(
        for { s <- Gen.chooseNum(-500L, 500L); len <- Gen.chooseNum(0L, 200L) }
          yield (s, s + len)).map(_.take(15)),
      Gen.oneOf(1L, 7L, 100L, 1000L)) { (pts, ivs, w) =>
      val p = pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val v = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iid", "s", "e")
      val got = graft.ops.RangeJoin.pointInInterval(p, v, "x", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = pts.zipWithIndex.flatMap { case (x, i) =>
        ivs.zipWithIndex.collect { case ((s, e), j) if s <= x && x <= e =>
          (i.toLong, j.toLong)
        }
      }.toSet
      got == want
    }
}
