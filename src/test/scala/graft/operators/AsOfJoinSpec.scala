package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin/rangeJoin vs a driver-side brute-force oracle on adversarial
  * data: timestamp ties (exact-match visibility + max-id tie-break),
  * keys with no match, hot keys — plus plan-shape gates (no cartesian). */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // deterministic fixture: micros timestamps with deliberate collisions
  private def fixture(n: Int, keys: Int, salt: Int): Seq[(Long, Long, java.sql.Timestamp)] =
    (0 until n).map { i =>
      val k = (i * 7 + salt) % keys
      // coarse grid => plenty of exact ts ties across and within sides
      val us = ((i * 2654435761L + salt * 97L) % 2000L) * 500000L
      (i.toLong, k.toLong, new java.sql.Timestamp(us / 1000L))
    }

  test("asOf == brute-force most-recent-prior with max-id tie-break") {
    import spark.implicits._
    val clicks = fixture(400, 13, 1)
    val views = fixture(700, 13, 2)
    val lc = clicks.toDF("event_id", "user_id", "ts")
    val rv = views.toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(lc, rv, "user_id", "ts", "ts",
        rightCols = Seq("event_id", "ts"), rightPrefix = "view_")
      .select($"event_id", $"view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got.size == clicks.size)
    clicks.foreach { case (id, k, ts) =>
      val cand = views.filter(v => v._2 == k && !v._3.after(ts))
      val want =
        if (cand.isEmpty) None
        else Some(cand.maxBy(v => (v._3.getTime, v._1))._1)
      assert(got(id) == want, s"click $id key $k ts $ts")
    }
    // no-match keys exist and are null
    assert(got.values.exists(_.isEmpty) ||
      clicks.forall(c => views.exists(v => v._2 == c._2 && !v._3.after(c._3))))
    // plan: no cartesian/BNLJ — one hash-partitioned window does the work
    val plan = AsOfJoin.asOf(lc, rv, "user_id", "ts", "ts", Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  test("asOf: NULL right timestamps are invisible (SQL ts<=ts semantics)") {
    import spark.implicits._
    val lc = Seq((1L, 5L, new java.sql.Timestamp(10000L)))
      .toDF("event_id", "user_id", "ts")
    val rv = Seq(
      (100L, 5L, Option.empty[java.sql.Timestamp]), // null ts: must not match
      (101L, 5L, Some(new java.sql.Timestamp(20000L)))) // after: must not match
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(lc, rv, "user_id", "ts", "ts",
        rightCols = Seq("event_id"), rightPrefix = "v_")
      .select($"event_id", $"v_event_id").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, None)))
  }

  test("rangeJoin == brute-force |dt| <= tol incl. bucket-boundary pairs") {
    import spark.implicits._
    val clicks = fixture(300, 9, 3)
    val errors = fixture(500, 9, 4)
    val tol = 120L // 2 min; ts grid is 0.5 s so boundaries are exercised
    val got = AsOfJoin.rangeJoin(
        clicks.toDF("event_id", "user_id", "ts"),
        errors.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "ts", tolSec = tol,
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        rightPrefix = "err_")
      .select($"event_id", $"err_event_id", $"dt_sec")
      .as[(Long, Long, Double)].collect()
    val gotSet = got.map(t => (t._1, t._2)).toSet
    assert(gotSet.size == got.length, "duplicate pairs emitted")
    val want = (for {
      c <- clicks; e <- errors
      if c._2 == e._2 && math.abs(e._3.getTime - c._3.getTime) <= tol * 1000L
    } yield (c._1, e._1)).toSet
    assert(gotSet == want,
      s"missing=${(want -- gotSet).take(5)} extra=${(gotSet -- want).take(5)}")
    got.foreach { case (cid, eid, dt) =>
      val c = clicks(cid.toInt); val e = errors(eid.toInt)
      assert(dt == (e._3.getTime - c._3.getTime) / 1000.0)
    }
    // plan: equi-join on (key, bucket), never an inequality cartesian
    val plan = AsOfJoin.rangeJoin(
        clicks.toDF("event_id", "user_id", "ts"),
        errors.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "ts", tol, Seq("event_id"), Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
