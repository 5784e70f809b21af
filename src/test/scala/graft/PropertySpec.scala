package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the algebraic laws the operators rely on
  * (SURVEY §5 test strategy). Each property drives the real Spark
  * expressions on generated frames — not reimplementations. Uses
  * scalacheck's runner directly (the scalatest bridge artifact isn't in
  * the offline cache). */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: lag-distance (energy numerator) is never negative") {
    import spark.implicits._
    val posGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0),
        Gen.chooseNum(-100.0, 100.0)))
    check(Prop.forAll(posGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((x, y, z), i) => (i.toLong, x, y, z) }
        .toDF("seq", "x", "y", "z")
      val w = Window.orderBy("seq")
      val dx = col("x") - lag("x", 1).over(w)
      val dy = col("y") - lag("y", 1).over(w)
      val dz = col("z") - lag("z", 1).over(w)
      df.select(sqrt(dx * dx + dy * dy + dz * dz).as("dist"))
        .filter(col("dist").isNotNull)
        .filter(col("dist") < 0).count() == 0L
    })
  }

  test("property: semi + anti joins partition the left input") {
    import spark.implicits._
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.chooseNum(0, 20)),
      Gen.listOf(Gen.chooseNum(0, 20)))
    check(Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
      val r = rs.toDF("k")
      val semi = l.join(r, Seq("k"), "left_semi")
      val anti = l.join(r, Seq("k"), "left_anti")
      semi.count() + anti.count() == l.count() && semi.except(l).count() == 0L
    })
  }

  test("property: decimal-sum-then-double equals the exact rational sum") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 99999))) { cents =>
      val df = cents.map(c => c / 100.0).toDF("x")
      val viaDecimal = df
        .agg(expr("CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)")).first().getDouble(0)
      viaDecimal == (BigDecimal(cents.map(_.toLong).sum) / 100).toDouble
    })
  }

  test("property: stateful funnel equals the window funnel on any event log") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 4L),
      Gen.oneOf("view", "click", "purchase", "error", "signup"),
      Gen.chooseNum(0L, 100L)))
    check(Prop.forAll(evGen) { evs =>
      val df = evs.toDF("user_id", "event_type", "ts_ms")
      val batch = EventAnalytics.eventsFunnelFrom(df)
        .collect().map(_.getLong(2)).toSeq
      val states = EventAnalytics.funnelStateful(
        df.withColumn("event_id", lit(0L)).as[EventAnalytics.FunnelEv])
        .collect()
      val streamed = (1 to 3).map(k => states.count(_.stage >= k).toLong)
      batch == streamed
    }, n = 8)
  }

  test("property: session boundary count = 1 + number of over-gap jumps") {
    import spark.implicits._
    val tsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000000L))
    check(Prop.forAll(tsGen) { ts =>
      val gapMs = 1800000L
      val sorted = ts.sorted
      val expected = 1 + sorted.zip(sorted.drop(1)).count { case (a, b) => b - a > gapMs }
      val df = sorted.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
        .toDF("user_id", "event_id", "ts_ms")
      val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val gap = col("ts_ms") - lag("ts_ms", 1).over(byUser)
      val n = df.withColumn("new_session", when(gap.isNull || gap > gapMs, 1).otherwise(0))
        .agg(sum("new_session")).first().getLong(0)
      n == expected.toLong
    })
  }

  test("property: substring spans equal a brute-force text-equality reference") {
    import spark.implicits._
    val K = 10
    // a 4-token alphabet makes genuine >=10-token cross-document repeats
    // common, so the generator exercises flagging, interval-union
    // merging, AND the rotate-XOR hash chain against TEXT equality (a
    // hash-chain bug or accidental collision shows up as a span diff)
    def refSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
      val wins = docs.flatMap { case (id, t) =>
        val ts = t.split(" ", -1)
        if (ts.length < K) Nil
        else (0 to ts.length - K).map(p => (id, p, ts.slice(p, p + K).mkString(" ")))
      }
      val flagged = wins.groupBy(_._3)
        .filter { case (_, g) => g.map(_._1).distinct.size >= 2 }
        .values.flatten.toSeq
      flagged.groupBy(_._1).flatMap { case (id, g) =>
        val ps = g.map(_._2).distinct.sorted
        val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int)]
        for (p <- ps) {
          if (spans.nonEmpty && p <= spans.last._2 + K) {
            val (s, m, n) = spans.last
            spans(spans.length - 1) = (s, math.max(p, m), n + 1)
          } else spans += ((p, p, 1))
        }
        spans.map { case (s, m, n) => (id, s.toLong, (m + K - 1).toLong, n.toLong) }
      }.toSet
    }
    val docGen = Gen.chooseNum(5, 28).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(3, 6).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) })
    check(Prop.forAll(corpusGen) { corpus =>
      val got = graft.operators.Dedup.dupSpanRows(corpus.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == refSpans(corpus)
    }, n = 8)
  }

  test("property: PNG gray8 encode→decode is the identity for every shape and content") {
    import org.apache.spark.sql.graft.PngKernel
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    check(Prop.forAll(gen) { case (w, h, px) =>
      val back = PngKernel.decodeGray8(PngKernel.encodeGray8(w, h, px))
      back != null && java.util.Arrays.equals(back, px)
    }, n = 60)
  }

  test("property: truncating an encoded PNG anywhere decodes to NULL, never garbage") {
    import org.apache.spark.sql.graft.PngKernel
    val gen = for {
      w <- Gen.chooseNum(1, 16)
      h <- Gen.chooseNum(1, 16)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
      full = PngKernel.encodeGray8(w, h, px.map(_.toByte).toArray)
      cut <- Gen.chooseNum(0, full.length - 1)
    } yield full.take(cut)
    check(Prop.forAll(gen) { truncated =>
      PngKernel.decodeGray8(truncated) == null
    }, n = 60)
  }

  test("property: bytes appended after IEND make the PNG decode to NULL (strict tail)") {
    // r17 ADVICE: the decoder used to stop at the first IEND and accept
    // trailing garbage — strictly malformed under the documented contract.
    import org.apache.spark.sql.graft.PngKernel
    val gen = for {
      w <- Gen.chooseNum(1, 16)
      h <- Gen.chooseNum(1, 16)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
      full = PngKernel.encodeGray8(w, h, px.map(_.toByte).toArray)
      tail <- Gen.nonEmptyListOf(Gen.chooseNum(0, 255))
    } yield full ++ tail.map(_.toByte)
    check(Prop.forAll(gen) { garbaged =>
      PngKernel.decodeGray8(garbaged) == null
    }, n = 60)
  }
}
