package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{Sampling, TrainPrep}
import graft.queries.{EventQueries, RelationalQueries}

/** Round-9 additions: context-window chunking, temperature-scaled source
  * mixing, per-source token entropy, truncated dyadic-weight EWMA. */
class RoundNineOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def docsDf(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("chunkWindows: exact chunk count, placement, and content hashes") {
    val toks10 = (0 until 10).map(i => s"t$i").mkString(" ")
    val toks12 = (0 until 12).map(i => s"u$i").mkString(" ")
    val d = docsDf((1L, toks10, "a"), (2L, toks12, "a"), (3L, "x y", "a"))
    val r = TrainPrep.chunkWindows(d, window = 4, stride = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x).toMap

    // n=10: max(10-4,0)=6, 6/3 exact -> 1+2 = 3 chunks, all full
    assert(r.keys.count(_._1 == 1L) === 3)
    assert(r((1L, 0L)).getAs[Long]("start_tok") === 0L)
    assert(r((1L, 2L)).getAs[Long]("start_tok") === 6L)
    assert(r((1L, 2L)).getAs[Long]("n_toks") === 4L)

    // n=12: max=8 -> 8 div 3 = 2 rem 2 -> 4 chunks, last clamped to 3
    assert(r.keys.count(_._1 == 2L) === 4)
    assert(r((2L, 3L)).getAs[Long]("start_tok") === 9L)
    assert(r((2L, 3L)).getAs[Long]("n_toks") === 3L)

    // short doc: one chunk covering everything
    assert(r.keys.count(_._1 == 3L) === 1)
    assert(r((3L, 0L)).getAs[Long]("n_toks") === 2L)

    // content hash = md5 of the space-rejoined slice
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r((1L, 1L)).getAs[String]("chunk_hash") === md5hex("t3 t4 t5 t6"))
    assert(r((2L, 3L)).getAs[String]("chunk_hash") === md5hex("u9 u10 u11"))
  }

  test("chunkWindows: seam overlap is window - stride tokens") {
    val d = docsDf((1L, (0 until 20).map("w" + _).mkString(" "), "a"))
    val r = TrainPrep.chunkWindows(d, window = 8, stride = 6).collect()
    val spans = r.map(x => (x.getAs[Long]("start_tok"), x.getAs[Long]("n_toks")))
    spans.sliding(2).foreach { case Array((s1, n1), (s2, _)) =>
      assert(s1 + n1 - s2 === 2L, "consecutive chunks must share 2 tokens")
    case _ => ()
    }
    // full coverage: last chunk ends at the doc end
    val (ls, ln) = spans.last
    assert(ls + ln === 20L)
  }

  test("temperatureSample: sqrt-proportional quotas, exact target, clamp") {
    // 100/25/4 docs -> sqrt weights 10/5/2, W=17: target 17 splits 10/5/2
    val rows =
      (1L to 100L).map(i => (i, s"d$i", "A")) ++
        (101L to 125L).map(i => (i, s"d$i", "B")) ++
        (126L to 129L).map(i => (i, s"d$i", "C"))
    val kept = Sampling.temperatureSample(docsDf(rows: _*), target = 17)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("A" -> 10L, "B" -> 5L, "C" -> 2L))
  }

  test("temperatureSample: oversubscribed tiny source clamps to its census") {
    val rows = (1L to 100L).map(i => (i, s"d$i", "A")) :+ (200L, "solo", "D")
    val kept = Sampling.temperatureSample(docsDf(rows: _*), target = 30)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // wq = 10e6 / 1e6: A base 27 (rem 3/11), D base 2 (rem 8/11) + top-up
    // -> 3, clamped to the single document it has
    assert(kept("D") === 1L)
    assert(kept("A") === 27L)
  }

  test("tokenEntropy: uniform vocab is ln(n) nats with evenness 1; " +
    "degenerate vocab is 0 with NULL evenness") {
    val d = docsDf((1L, "a b c d", "u"), (2L, "x", "s"))
    val r = TextOps.tokenEntropy(d).collect()
      .map(x => x.getString(0) -> x).toMap
    val u = r("u")
    assert(u.getAs[Long]("n_tokens") === 4L)
    assert(u.getAs[Long]("n_types") === 4L)
    assert(math.abs(u.getAs[Double]("entropy_nats") - math.log(4)) < 1e-4)
    assert(u.getAs[Double]("evenness") === 1.0)
    assert(u.getAs[Long]("ttr_bp") === 10000L)
    val s = r("s")
    assert(s.getAs[Double]("entropy_nats") === 0.0)
    assert(s.isNullAt(s.fieldIndex("evenness")))
  }

  test("dailyEwma: constant series is a fixed point; ramp folds exactly") {
    import spark.implicits._
    def ev(day: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)
    val const = (1 to 5).map(d => ev(d, 1.00)).toDF("ts", "value")
    EventQueries.dailyEwma(const).collect().foreach { r =>
      assert(r.getAs[Long]("ewma_cents") === 100L, "constant series must be invariant")
    }
    // 100, 200, 300 cents: folds 50, 125, 212.5; normalized 100, 167, 243
    val ramp = Seq(ev(1, 1.00), ev(2, 2.00), ev(3, 3.00)).toDF("ts", "value")
    val got = EventQueries.dailyEwma(ramp).collect().map(_.getAs[Long]("ewma_cents"))
    assert(got.toSeq === Seq(100L, 167L, 243L))
  }

  test("chunkDupes: duplicate chunks point at the first occurrence") {
    // docs 1 and 2 share identical text -> every chunk of 2 is a dup of 1;
    // doc 3 is unique -> contributes nothing
    val text = (0 until 10).map("t" + _).mkString(" ")
    val d = docsDf((1L, text, "a"), (2L, text, "a"), (3L, "zz yy", "a"))
    val r = TrainPrep.chunkDupes(d, window = 4, stride = 3).collect()
    assert(r.length === 3, "doc 2's three chunks are the removed instances")
    r.foreach { x =>
      assert(x.getAs[Long]("doc_id") === 2L)
      assert(x.getAs[Long]("survivor_doc") === 1L)
      assert(x.getAs[Long]("survivor_chunk") === x.getAs[Long]("chunk_id"))
      assert(x.getAs[Long]("n_copies") === 2L)
    }
  }

  test("sourceOverlap: exact Jaccard in basis points, pairs sorted a < b") {
    val d = docsDf(
      (1L, "a b c", "s1"), (2L, "b c d", "s2"), (3L, "x y", "s3"))
    val r = TextOps.sourceOverlap(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // s1 {a,b,c} vs s2 {b,c,d}: 2 common / 4 union = 5000 bp
    val p = r(("s1", "s2"))
    assert(p.getAs[Long]("n_common") === 2L)
    assert(p.getAs[Long]("types_a") === 3L && p.getAs[Long]("types_b") === 3L)
    assert(p.getAs[Long]("jaccard_bp") === 5000L)
    // disjoint vocabularies produce no pair row at all
    assert(!r.contains(("s1", "s3")) && !r.contains(("s2", "s3")))
  }

  test("pmiPairs: counts cover offsets 1 and 2; PMI is ln(cN/(ca*cb)) micros") {
    val d = docsDf((1L, "a b a b", "s"))
    // offset1: (a,b),(b,a),(a,b); offset2: (a,a),(b,b) -> N=5
    val r = TextOps.pmiPairs(d, maxOffset = 2, topK = 10).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r(("a", "b")).getAs[Long]("c") === 2L)
    assert(r(("b", "a")).getAs[Long]("c") === 1L)
    assert(r(("a", "a")).getAs[Long]("c") === 1L)
    // (a,b): ca = pairs with left a = 3, cb = pairs with right b = 3
    val expected = math.round(math.log(2.0 * 5 / (3.0 * 3)) * 1e6)
    assert(r(("a", "b")).getAs[Long]("pmi_micro") === expected)
  }

  test("negativeSampling: tf^0.75 weights, rank order, monotone cum share") {
    val d = docsDf((1L, "a a a a a a a a a a a a a a a a b", "s"))
    val r = TextOps.negativeSampling(d).collect()
    // a: tf=16 -> 16^0.75 = 8 exactly; b: tf=1 -> 1
    val byTok = r.map(x => x.getString(0) -> x).toMap
    assert(byTok("a").getAs[Long]("w_micro") === 8000000L)
    assert(byTok("b").getAs[Long]("w_micro") === 1000000L)
    assert(byTok("a").getAs[Long]("rank") === 1L)
    // cumulative ppm: a = 8/9 of the mass, b closes at exactly 1e6
    assert(byTok("a").getAs[Long]("cum_ppm") === 8000000L * 1000000L / 9000000L)
    assert(byTok("b").getAs[Long]("cum_ppm") === 1000000L)
  }

  test("yoyRevenue: integer-cent growth in basis points, NULL first year") {
    import spark.implicits._
    val li = Seq((1L, 100.0, 0.0), (2L, 150.0, 0.0), (3L, 75.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2022-06-01 00:00:00")),
      (2L, 10L, java.sql.Timestamp.valueOf("2023-06-01 00:00:00")),
      (3L, 10L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((10L, 5)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((5, "FRANCE")).toDF("n_nationkey", "n_name")
    val r = RelationalQueries.yoyRevenue(li, ord, cust, nat).collect()
    assert(r.map(_.getAs[Long]("yr")).toSeq === Seq(2022L, 2023L, 2024L))
    assert(r(0).isNullAt(r(0).fieldIndex("yoy_bp")))
    assert(r(1).getAs[Long]("yoy_bp") === 5000L) // 100 -> 150: +50%
    assert(r(2).getAs[Long]("yoy_bp") === -5000L) // 150 -> 75: -50%
  }

  test("dailyEwma: window truncates at k days") {
    import spark.implicits._
    val rows = (1 to 10).map(d =>
      (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), d.toDouble))
      .toDF("ts", "value")
    val r = EventQueries.dailyEwma(rows, k = 4).collect()
    assert(r.forall(_.getAs[Long]("m") <= 4L))
    assert(r.take(3).map(_.getAs[Long]("m")).toSeq === Seq(1L, 2L, 3L))
  }

  test("psiDrift: shifted type alarms, stable type stays near zero") {
    import spark.implicits._
    import java.sql.Timestamp
    // 20 days; "stable" draws the same values both halves, "shifted"
    // jumps from 1..50 to 151..200 in the second half
    val rows = (0 until 20).flatMap { d =>
      val ts = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      (0 until 50).flatMap { i =>
        Seq((d.toLong * 1000 + i, ts, "stable", (i + 1).toDouble),
          (d.toLong * 1000 + 500 + i, ts,
            "shifted", if (d < 10) (i + 1).toDouble else (i + 151).toDouble))
      }
    }.toDF("event_id", "ts", "event_type", "value")
    val out = EventQueries.psiDrift(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val psi = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // PSI > 0.2 (200k micro-nats) is the conventional drift alarm
    assert(psi("shifted") > 200000L, s"shifted PSI ${psi("shifted")}")
    assert(math.abs(psi("stable")) < 50000L, s"stable PSI ${psi("stable")}")
  }

  test("forecastBacktest: exact weekly pattern has zero error; a spike shows up") {
    import spark.implicits._
    import java.sql.Timestamp
    // 14 days of a pure weekly pattern, plus one +5.00 spike on day 12
    val rows = (0 until 14).map { d =>
      val spike = if (d == 11) 5.0 else 0.0
      (d.toLong, Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00"),
        "purchase", 100.0 + (d % 7) * 10 + spike)
    }.toDF("event_id", "ts", "event_type", "value")
    val r = EventQueries.forecastBacktest(rows).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r.size === 7) // every weekday backtested exactly once
    assert(r.values.forall(_._1 === 1L))
    val off = r.filter(_._2._2 != 0L)
    assert(off.size === 1) // only the spiked weekday errs
    assert(off.head._2._2 === 500L && off.head._2._3 === 500L)
  }

  test("abLift: hash-sticky variants, integer-bp conversion, sign-split lift") {
    import spark.implicits._
    import java.sql.Timestamp
    def hv(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // 20 users: evens view-only, odds purchase 2.50 — conversion then
    // depends only on which parities each variant absorbed
    val events = (1L to 20L).flatMap { u =>
      val base = Seq((u * 10, t, u, "view", 1.0))
      if (u % 2 == 1) base :+ ((u * 10 + 1, t, u, "purchase", 2.5)) else base
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventQueries.abLift(events).collect().head
    val byVariant = (1L to 20L).groupBy(u => if (hv(u) % 2 == 0) "A" else "B")
    val convA = byVariant("A").count(_ % 2 == 1)
    val convB = byVariant("B").count(_ % 2 == 1)
    assert(r.getAs[Long]("n_users_a") === byVariant("A").size.toLong)
    assert(r.getAs[Long]("n_users_b") === byVariant("B").size.toLong)
    val bpA = convA.toLong * 10000 / byVariant("A").size
    val bpB = convB.toLong * 10000 / byVariant("B").size
    assert(r.getAs[Long]("conv_a_bp") === bpA)
    assert(r.getAs[Long]("conv_b_bp") === bpB)
    val lift = math.signum(bpB - bpA) * (math.abs(bpB - bpA) * 10000 / bpA)
    assert(r.getAs[Long]("lift_bp") === lift)
    // revenue: 250 cents per converter
    assert(r.getAs[Long]("cents_per_user_a") === convA.toLong * 250 / byVariant("A").size)
  }
}
