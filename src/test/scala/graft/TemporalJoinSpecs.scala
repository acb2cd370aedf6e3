package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),
    (2L, 10L, ts("2024-01-01 10:05:00"), 6.0),
    (3L, 10L, ts("2024-01-01 09:00:00"), 7.0), // before any quote
    (4L, 20L, ts("2024-01-01 10:00:00"), 8.0)  // other key
  ).toDF("trade_id", "user_id", "ts", "trade_value")

  private lazy val quotes = Seq(
    (10L, ts("2024-01-01 09:30:00"), 1.0),
    (10L, ts("2024-01-01 10:00:00"), 2.0), // ties trade 1's ts exactly
    (10L, ts("2024-01-01 10:04:00"), 3.0),
    (30L, ts("2024-01-01 09:00:00"), 9.0)  // key with no trades
  ).toDF("user_id", "ts", "value")

  test("asof backward: latest quote at-or-before each trade, per key") {
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "q_", inner = false)
      .select($"trade_id", $"q_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2.0)) // equal ts counts (<= semantics)
    assert(out(2L).contains(3.0)) // strictly latest prior
    assert(out(3L).isEmpty)       // no prior quote -> null (outer mode)
    assert(out(4L).isEmpty)       // quotes of other keys invisible
  }

  test("asof inner mode drops unmatched left rows") {
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"))
    assert(out.select("trade_id").as[Long].collect().toSet == Set(1L, 2L))
    // matched quote ts surfaces with the prefix
    assert(out.columns.contains("asof_ts") && out.columns.contains("asof_value"))
  }

  test("asof forward: earliest quote at-or-after each trade, per key") {
    val out = TemporalJoins.asofForward(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "q_", inner = false)
      .select($"trade_id", $"q_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2.0)) // equal ts counts (>= semantics)
    assert(out(2L).isEmpty)       // no later quote for user 10
    assert(out(3L).contains(1.0)) // next quote after 09:00 is 09:30
    assert(out(4L).isEmpty)
  }

  test("asof forward tolerance: match farther than the bound is nulled") {
    // trade 3 at 09:00 -> next quote 09:30 (1800 s away)
    def run(tol: Long) = TemporalJoins.asofForward(trades, quotes,
      Seq("user_id"), rightPayload = Seq("value"), rightPrefix = "q_",
      inner = false, toleranceSec = Some(tol))
      .select($"trade_id", $"q_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(run(1800L)(3L).contains(1.0)) // boundary: inclusive
    assert(run(1799L)(3L).isEmpty)
  }

  test("asof nearest: closer side wins, ties break backward") {
    val out = TemporalJoins.asofNearest(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "q_", inner = false)
      .select($"trade_id", $"q_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2.0)) // exact hit
    assert(out(2L).contains(3.0)) // 10:04 (60 s back) vs nothing forward
    assert(out(3L).contains(1.0)) // only a forward match exists
    // tie: trade at 10:02 sits 120 s from 10:00 and 10:04 -> backward
    val tied = Seq((9L, 10L, ts("2024-01-01 10:02:00"), 1.0))
      .toDF("trade_id", "user_id", "ts", "trade_value")
    val t = TemporalJoins.asofNearest(tied, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "q_")
      .select($"q_value").head.getDouble(0)
    assert(t == 2.0, s"tie must break backward, got $t")
  }

  test("asof all directions == brute force on randomized (seeded) data") {
    val rnd = new scala.util.Random(1234)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new Timestamp(base + rnd.nextInt(100000) * 1000L)
    val l = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, randTs()))
      .toDF("lid", "user_id", "ts")
    // dedupe (key, ts) — with duplicates the surviving payload is
    // engine-order-dependent (documented caller contract)
    val rRows = (1 to 200).map(i =>
      ((rnd.nextInt(5) + 1).toLong, randTs(), i.toDouble))
      .groupBy(x => (x._1, x._2.getTime)).map(_._2.head).toSeq
    val r = rRows.toDF("user_id", "ts", "value")
    // brute force on the driver: per left row scan all right rows
    val rByKey = rRows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => (x._2.getTime, x._3))
    }
    val lRows = l.collect().map(x => (x.getLong(0), x.getLong(1),
      x.getTimestamp(2).getTime))
    def expect(dir: String): Map[Long, Option[Double]] =
      lRows.map { case (lid, k, t) =>
        val cand = rByKey.getOrElse(k, Seq())
        val bwd = cand.filter(_._1 <= t).sortBy(_._1).lastOption
        val fwd = cand.filter(_._1 >= t).sortBy(_._1).headOption
        val m = dir match {
          case "backward" => bwd
          case "forward" => fwd
          case "nearest" => (bwd, fwd) match {
            case (Some(b), Some(f)) =>
              if (t - b._1 <= f._1 - t) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        lid -> m.map(_._2)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = TemporalJoins.asof(l, r, Seq("user_id"),
        rightPayload = Seq("value"), rightPrefix = "m_", inner = false,
        direction = dir)
        .select($"lid", $"m_value")
        .collect().map(x => x.getLong(0) -> Option(x.get(1))
          .map(_.asInstanceOf[Double])).toMap
      assert(got == expect(dir), s"direction $dir diverges from brute force")
    }
  }

  test("range join matches only rows inside the window, equi-key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00")),
      (2L, 20L, ts("2024-01-01 10:10:00"))
    ).toDF("eid", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 10:05:00")), // in window
      (101L, 10L, ts("2024-01-01 10:10:00")), // boundary: inclusive
      (102L, 10L, ts("2024-01-01 10:00:00")), // boundary: exclusive (> t-600)
      (103L, 10L, ts("2024-01-01 09:59:00")), // too old
      (104L, 30L, ts("2024-01-01 10:05:00"))  // wrong key
    ).toDF("rid", "user_id", "rts")
    val out = TemporalJoins.recentWindowJoin(left, right, Seq("user_id"),
      "ts", "rts", 600L)
    val pairs = out.select($"eid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L), (1L, 101L)))
    // exploded probe buckets must not duplicate matches
    assert(out.count() == 2)
  }

  test("range join window spanning a bucket boundary still matches") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:30"))).toDF("eid", "user_id", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 09:52:00")))
      .toDF("rid", "user_id", "rts") // previous 600s bucket
    val out = TemporalJoins.recentWindowJoin(left, right, Seq("user_id"),
      "ts", "rts", 600L)
    assert(out.count() == 1)
  }
}
