package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticSpec extends SparkSpec {

  test("nearest event: both directions, deterministic ties, dropped orphans") {
    import spark.implicits._
    def t(sec: Long) = sec * 1000000L
    val rows = Seq(
      // user 1: clicks at 0s/100s; purchase 30s → before (30s), 60s → after (40s)
      (10L, 1L, t(0), "click"), (11L, 1L, t(100), "click"),
      (1L, 1L, t(30), "purchase"), (2L, 1L, t(60), "purchase"),
      // user 2: equidistant clicks → tie goes to the earlier
      (20L, 2L, t(0), "click"), (21L, 2L, t(60), "click"),
      (3L, 2L, t(30), "purchase"),
      // user 3: no clicks → purchase dropped
      (4L, 3L, t(10), "purchase"),
      // user 4: click at the IDENTICAL ts, lower id → before at distance 0
      (40L, 4L, t(50), "click"), (50L, 4L, t(50), "purchase"))
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = Analytic.nearestEvent(rows, "purchase", "click").collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("click_event_id"), r.getAs[Long]("dist_us"),
          r.getAs[String]("direction")))).toMap
    assert(got === Map(
      1L -> ((10L, t(30), "before")),
      2L -> ((11L, t(40), "after")),
      3L -> ((20L, t(30), "before")),
      50L -> ((40L, 0L, "before"))))
  }

  test("funnel counts are monotone down the stages") {
    val r = Analytic.qFunnel.build(spark, sf).collect().head
    val (viewed, clicked, converted) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viewed >= clicked && clicked >= converted,
      s"funnel not monotone: $viewed >= $clicked >= $converted")
    assert(viewed > 0, "no users entered the funnel at sf0.001")
  }

  test("retention: every cohort is fully active at offset 0") {
    val rows = Analytic.qRetention.build(spark, sf).collect()
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val day0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    // each user is by definition active on their own first day
    assert(day0 == users, s"offset-0 actives $day0 != distinct users $users")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("approx percentiles: gate flags green and exact median matches an independent pass") {
    val rows = Analytic.qApproxPercentiles.build(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(rows.nonEmpty)
    val exactMed = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { case (t, (p50Exact, ok50, ok90, ok99)) =>
      assert(p50Exact == exactMed(t), s"$t median ${p50Exact} != ${exactMed(t)}")
      assert(ok50 == 1 && ok90 == 1 && ok99 == 1,
        s"$t sketch outside rank bound: ok=($ok50,$ok90,$ok99)")
    }
  }

  test("profile invariants: key columns dense, distincts bounded by rows") {
    val rows = graft.Tables.orders(spark, sf).count()
    val prof = Analytic.qProfile.build(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof.keySet.size == 6)
    assert(prof("o_orderkey")._1 == 0 && prof("o_orderkey")._2 == rows,
      "o_orderkey must be a dense unique key")
    prof.foreach { case (c, (nulls, distinct)) =>
      assert(nulls >= 0 && distinct <= rows, s"$c: nulls=$nulls distinct=$distinct")
    }
  }

  test("native session windows agree with the cumsum sessionization") {
    val native = Analytic.qSessionWindow.build(spark, sf)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cumsum = Analytic.qSessionize.build(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == cumsum,
      s"session counts diverged between the two formulations: " +
        s"${(native.toSet diff cumsum.toSet).take(3)}")
  }

  test("scd2 intervals tile each user's timeline exactly") {
    val dim = Analytic.qScd2.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getLong(5)))
    val byUser = dim.groupBy(_._1)
    val events = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    byUser.foreach { case (user, rows) =>
      val sorted = rows.sortBy(_._2)
      // versions are contiguous from 1
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"user $user versions not contiguous")
      // each interval closes exactly where the next opens; only the last is open
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to == from, s"user $user: gap/overlap at $to vs $from")
        case Array((_, v, _, None, _), _) =>
          fail(s"user $user: non-final version $v has NULL valid_to")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty, s"user $user: current state not open-ended")
      // run lengths account for every event
      assert(sorted.map(_._5).sum == events(user),
        s"user $user: interval event counts don't sum to the log")
    }
  }

  test("point-in-time join: one version per event, matching its own type") {
    val ev = graft.Tables.events(spark, sf)
    val pit = Analytic.qPitJoin.build(spark, sf).cache()
    try {
      // interval coverage: every event matched EXACTLY once
      assert(pit.count() === ev.count())
      assert(pit.select("event_id").distinct().count() === ev.count())
      // away from shared-timestamp boundaries, the version covering an
      // event is the run that contains it, so state == its own event_type
      val dupTsUsers = ev.groupBy("user_id", "ts").count()
        .filter(col("count") > 1).select("user_id").distinct()
      val mismatch = pit.join(
          ev.select(col("event_id"), col("event_type")), "event_id")
        .join(dupTsUsers, Seq("user_id"), "left_anti")
        .filter(col("state") =!= col("event_type"))
      assert(mismatch.count() === 0)
    } finally pit.unpersist()
  }
}
