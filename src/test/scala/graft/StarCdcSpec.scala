package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.{AnalyticsPack, Audit, Cdc, Dims, Packing, Scd2, Star, TimeSeries}

/** Round-6 operators: snapshot CDC, Kimball star extras (accumulating
  * snapshot, late-arriving dim, bridge allocation), SCD2 point-in-time,
  * time-series gap fill, transition matrix, top-N-per-group rank.
  */
class StarCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("snapshotDiff classifies INSERT/DELETE/UPDATE and drops unchanged keys") {
    val old = Seq((1L, "A", Some(1.0)), (2L, "B", Some(2.0)),
      (3L, "C", Option.empty[Double]), (4L, "D", Some(4.0)))
      .toDF("k", "attr", "v")
    val cur = Seq((1L, "A", Some(1.0)),        // unchanged -> dropped
      (2L, "X", Some(2.0)),                     // attr changed -> UPDATE
      (3L, "C", Some(3.0)),                     // NULL -> value   -> UPDATE
      (5L, "E", Some(5.0)))                     // new key -> INSERT; 4 -> DELETE
      .toDF("k", "attr", "v")
    val diff = Cdc.snapshotDiff(old, cur, Seq("k"), Seq("attr", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "UPDATE", 3L -> "UPDATE", 4L -> "DELETE", 5L -> "INSERT"))
    // old/new attr columns carry both sides for the UPDATE rows
    val u2 = Cdc.snapshotDiff(old, cur, Seq("k"), Seq("attr", "v"))
      .filter($"k" === 2L).head()
    assert(u2.getString(2) == "B" && u2.getString(3) == "X")
  }

  test("accumulatingSnapshot keeps milestone-incomplete parents with NULLs") {
    val parent = Seq((10L, Date.valueOf("2024-01-01"), "O"),
      (20L, Date.valueOf("2024-01-02"), "F"))
      .toDF("o_orderkey", "order_date", "o_orderstatus")
    val detail = Seq((10L, ts("2024-01-03 10:00:00"), 5.0),
      (10L, ts("2024-01-07 10:00:00"), 7.0))
      .toDF("l_orderkey", "l_shipdate", "l_quantity")
    val snap = Star.accumulatingSnapshot(parent, detail,
      "o_orderkey", "l_orderkey", "l_shipdate", "l_quantity")
    val r10 = snap.filter($"o_orderkey" === 10L).head()
    assert(r10.getAs[Date]("first_ship_date") == Date.valueOf("2024-01-03"))
    assert(r10.getAs[Date]("last_ship_date") == Date.valueOf("2024-01-07"))
    assert(r10.getAs[Long]("n_lines") == 2L && r10.getAs[Double]("total_qty") == 12.0)
    // the unshipped order survives the LEFT join with NULL milestones
    val r20 = snap.filter($"o_orderkey" === 20L).head()
    assert(r20.isNullAt(snap.columns.indexOf("first_ship_date")))
  }

  test("late-arriving dim: unknown member -1, repair heals only parked rows") {
    val fact = Seq((1L, 100L), (2L, 200L), (3L, 999L)).toDF("fk_id", "custkey")
    val early = Seq(100L).toDF("c_custkey")
    val phase1 = Star.resolveOrUnknown(fact, early, "custkey", "c_custkey", "sk")
    assert(phase1.filter($"sk" === -1L).count() == 2)
    assert(phase1.filter($"fk_id" === 1L).head().getAs[Boolean]("was_late") == false)
    // full dim arrives with 200 but still not 999
    val full = Seq(100L, 200L).toDF("c_custkey")
    val healed = Star.repairUnknown(phase1, full, "custkey", "c_custkey", "sk")
    val bySk = healed.collect().map(r => r.getAs[Long]("fk_id") -> r.getAs[Long]("sk")).toMap
    assert(bySk == Map(1L -> 100L, 2L -> 200L, 3L -> -1L))
    // was_late still records the first-pass miss for the healed row
    assert(healed.filter($"fk_id" === 2L).head().getAs[Boolean]("was_late"))
  }

  test("bridgeAllocation: weights sum to 1 and allocations sum to the parent amount") {
    val parent = Seq((1L, 100.0), (2L, 50.0)).toDF("pk", "amount")
    val detail = Seq((1L, 1, 30.0), (1L, 2, 70.0), (2L, 1, 5.0))
      .toDF("dk", "line", "measure")
    val alloc = Star.bridgeAllocation(parent, detail, "pk", "dk", "amount", "measure")
    val w = alloc.groupBy($"dk").agg(sum($"weight").as("w"), sum($"allocated").as("a"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(w(1L)._1 - 1.0) < 1e-12 && math.abs(w(1L)._2 - 100.0) < 1e-9)
    assert(math.abs(w(2L)._1 - 1.0) < 1e-12 && math.abs(w(2L)._2 - 50.0) < 1e-9)
    // per-row weight is the exact-decimal share
    assert(alloc.filter($"dk" === 1L && $"line" === 1).head()
      .getAs[Double]("weight") == 0.3)
  }

  test("Scd2.asOf returns exactly the covering version per key") {
    val hist = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "a"),
      (1L, ts("2024-01-10 08:00:00"), 2L, "b"),
      (1L, ts("2024-01-20 08:00:00"), 3L, "c"),
      (2L, ts("2024-01-18 08:00:00"), 4L, "x"))
      .toDF("user_id", "ts", "event_id", "segment")
    val dim = Scd2.fromHistory(hist, "user_id", "ts", Seq("event_id"), Seq("segment"))
    val pit = Scd2.asOf(dim, lit("2024-01-15").cast("date"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 1 was in version "b" on the 15th; key 2 had no version yet
    assert(pit == Map(1L -> "b"))
    // at-or-after the last change every key resolves to its current row
    val now = Scd2.asOf(dim, lit("2024-02-01").cast("date"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "c", 2L -> "x"))
  }

  test("gapFill30m: full 48-slot grid, zero-filled counts, LOCF carry-forward") {
    val ev = Seq(
      (ts("2024-01-01 00:10:00"), 10.0),   // slot 0
      (ts("2024-01-01 01:40:00"), 20.0),   // slot 3
      (ts("2024-01-02 23:45:00"), 5.0))    // slot 47, second day
      .toDF("ts", "value")
    val filled = TimeSeries.gapFill30m(ev, "ts", "value")
    assert(filled.count() == 96) // 2 days x 48 slots
    val d1 = filled.filter($"day" === Date.valueOf("2024-01-01"))
      .orderBy($"slot").collect()
    assert(d1.map(_.getAs[Long]("n_events")).sum == 2)
    // slot 1-2 are gaps: zero events, NULL sum, LOCF carries slot 0's 10.0
    val slot2 = d1(2)
    assert(slot2.getAs[Long]("n_events") == 0L)
    assert(slot2.isNullAt(slot2.fieldIndex("value_sum")))
    assert(slot2.getAs[Double]("value_locf") == 10.0)
    // after slot 3 the carried value becomes 20.0 through end of day
    assert(d1(47).getAs[Double]("value_locf") == 20.0)
    // day 2: NULL LOCF before its first (and only, last-slot) observation
    val d2 = filled.filter($"day" === Date.valueOf("2024-01-02"))
      .orderBy($"slot").collect()
    assert(d2(0).isNullAt(d2(0).fieldIndex("value_locf")))
    assert(d2(47).getAs[Double]("value_locf") == 5.0)
  }

  test("transitionMatrix counts adjacent pairs per user with outgoing shares") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 11:05:00"), 5L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = AnalyticsPack.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // VIEW -> {CLICK, PURCHASE}: 2 outgoing, one each; CLICK -> VIEW: 1 of 1
    assert(m(("VIEW", "CLICK")) == ((1L, 0.5)))
    assert(m(("VIEW", "PURCHASE")) == ((1L, 0.5)))
    assert(m(("CLICK", "VIEW")) == ((1L, 1.0)))
    // no cross-user transition (user 1's last -> user 2's first)
    assert(m.size == 3)
  }

  test("markovEntropyRate: deterministic chain is 0 nats; fair branch is ln 2") {
    // A->B, B->A repeated: every transition certain → H = 0, perplexity 1
    val det = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = AnalyticsPack.markovEntropyRate(det).collect().head
    assert(r.getAs[Long]("n_transitions") == 3L)
    assert(r.getAs[Long]("n_states") == 2L)
    assert(math.abs(r.getAs[Double]("entropy_rate_nats")) < 1e-5)
    // A splits evenly to B/C: H = π_A·ln2 with π_A = 2/4 of transitions
    val fair = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (2L, ts("2024-01-01 11:00:00"), 3L, "a"),
      (2L, ts("2024-01-01 11:01:00"), 4L, "c"),
      (3L, ts("2024-01-01 12:00:00"), 5L, "b"),
      (3L, ts("2024-01-01 12:01:00"), 6L, "a"),
      (4L, ts("2024-01-01 13:00:00"), 7L, "c"),
      (4L, ts("2024-01-01 13:01:00"), 8L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val f = AnalyticsPack.markovEntropyRate(fair).collect().head
    // transitions: a->b, a->c (each p=.5), b->a, c->a (p=1):
    // H = (1/4)ln2 + (1/4)ln2 = ln2/2
    assert(math.abs(f.getAs[Double]("entropy_rate_nats") - math.log(2.0) / 2) < 1e-4)
    assert(f.getAs[Long]("n_states") == 3L)
  }

  test("periodicSnapshot zero-fills quiet months and carries the balance forward") {
    val fact = Seq(
      (1L, ts("2024-01-05 00:00:00"), 10.0),
      (1L, ts("2024-03-10 00:00:00"), 5.0),   // Feb is quiet for key 1
      (2L, ts("2024-02-15 00:00:00"), 7.0))   // key 2 starts in Feb
      .toDF("k", "odate", "amount")
    val snap = Star.periodicSnapshot(fact, "k", "odate", "amount")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val k1 = snap.filter(_._1 == 1L).sortBy(_._2).toSeq
    // Jan..Mar: quiet Feb materializes with zero activity, balance held
    assert(k1.map(_._2) == Seq("2024-01-01", "2024-02-01", "2024-03-01"))
    assert(k1.map(_._3) == Seq(1L, 0L, 1L))
    assert(k1.map(_._5) == Seq(10.0, 10.0, 15.0))
    // key 2's grid starts at ITS first month, not the global min
    val k2 = snap.filter(_._1 == 2L).sortBy(_._2).toSeq
    assert(k2.map(_._2) == Seq("2024-02-01", "2024-03-01"))
    assert(k2.map(_._5) == Seq(7.0, 7.0))
  }

  test("fkIntegrity counts orphans and NULL FKs separately") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val audit = Audit.fkIntegrity(fact, "fk", dim, "pk", "t.fk->d").head()
    assert(audit.getString(0) == "t.fk->d")
    assert(audit.getLong(1) == 4L)        // n_rows
    assert(audit.getLong(2) == 1L)        // n_null_fk
    assert(audit.getLong(3) == 1L)        // n_orphans (99)
    assert(audit.getDouble(4) == 25.0)    // orphan_pct
    // a duplicated dim key must not inflate the fact-side counts
    val dupDim = Seq(1L, 1L, 2L, 3L).toDF("pk")
    assert(Audit.fkIntegrity(fact, "fk", dupDim, "pk", "x").head().getLong(1) == 4L)
  }

  test("packGreedy: contiguous shard layout, bins advance at the budget boundary") {
    val docs = Seq((0L, 1000), (8L, 1000), (16L, 500), (24L, 700), (1L, 2500))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 2048, nShards = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset"))).toMap
    // shard 0 packs docs 0,8,16,24 in key order: starts 0,1000,2000,2500
    assert(packed(0L) == ((0, 1000L, 0L, 0L)))
    assert(packed(8L) == ((0, 2000L, 0L, 1000L)))
    assert(packed(16L) == ((0, 2500L, 0L, 2000L)))   // starts at 2000 < 2048
    assert(packed(24L) == ((0, 3200L, 1L, 452L)))    // crossed into bin 1
    // a doc larger than the whole budget still gets a deterministic slot
    assert(packed(1L) == ((1, 2500L, 0L, 0L)))
    // assignment is layout-stable: same result under a different partitioning
    val repart = Packing.packGreedy(docs.repartition(7), "doc_id", "n_tokens", 2048, 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_offset")).toMap
    assert(repart == packed.map { case (k, v) => k -> v._4 })
  }

  test("topDaysPerType keeps dense-rank ties") {
    val ev = Seq(
      // type A: day1 x2, day2 x2 (tie at rank 1), day3 x1
      (1L, ts("2024-01-01 10:00:00"), "a"), (2L, ts("2024-01-01 11:00:00"), "a"),
      (3L, ts("2024-01-02 10:00:00"), "a"), (4L, ts("2024-01-02 11:00:00"), "a"),
      (5L, ts("2024-01-03 10:00:00"), "a"))
      .zipWithIndex.map { case ((u, t0, et), i) => (i.toLong, t0, u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val top1 = AnalyticsPack.topDaysPerType(ev, topN = 1).collect()
    // both tied days survive at rank 1
    assert(top1.length == 2 && top1.forall(_.getAs[Int]("rnk") == 1))
  }

  test("junkDim: dense SKs over flag combos; every fact row resolves") {
    import spark.implicits._
    val fact = Seq(
      (1L, "R", "F"), (2L, "R", "O"), (3L, "N", "F"),
      (4L, "R", "F"), (5L, "N", "F"))
      .toDF("id", "flag_a", "flag_b")
    val dim = Dims.junkDim(fact, Seq("flag_a", "flag_b"), "junk_sk")
    val rows = dim.orderBy("junk_sk").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // sorted combos numbered densely from 1
    assert(rows == Seq((1, "N", "F"), (2, "R", "F"), (3, "R", "O")))
    val resolved = fact.join(broadcast(dim), Seq("flag_a", "flag_b"))
    assert(resolved.count() == 5 && resolved.filter(col("junk_sk").isNull).count() == 0)
  }

  test("tableDiff: identical snapshots all-match; a drop and an edit localize") {
    import spark.implicits._
    val a = (1L to 40L).map(k => (k, s"u$k", 10.0)).toDF("k", "name", "m")
    val same = Audit.tableDiff(a, a, "k", Seq("name"), "m", nBuckets = 4).collect()
    assert(same.length == 4 && same.forall(_.getAs[Boolean]("is_match")))
    // drop key 7, change key 20's measure
    val b = a.filter($"k" =!= 7)
      .withColumn("m", when($"k" === 20, $"m" + 5).otherwise($"m"))
    val diff = Audit.tableDiff(a, b, "k", Seq("name"), "m", nBuckets = 4)
      .collect().map(r => (r.getAs[Boolean]("is_match"), r)).toSeq
    val bad = diff.filterNot(_._1).map(_._2)
    assert(bad.length <= 2 && bad.nonEmpty) // 7 and 20 may share a bucket
    // the dropped row shows as a count mismatch somewhere
    assert(bad.exists(r => r.getAs[Long]("n_rows_a") != r.getAs[Long]("n_rows_b")))
    // the edited row shows as a measure mismatch with equal counts
    assert(bad.exists(r => r.getAs[Long]("n_rows_a") == r.getAs[Long]("n_rows_b")
      && r.getAs[Double]("measure_sum_a") != r.getAs[Double]("measure_sum_b")))
    // NULL hash column participates via the sentinel, no silent collapse
    val aNull = Seq((1L, Option.empty[String], 1.0)).toDF("k", "name", "m")
    val bVal = Seq((1L, Option("x"), 1.0)).toDF("k", "name", "m")
    val n = Audit.tableDiff(aNull, bVal, "k", Seq("name"), "m", nBuckets = 1).collect()
    assert(n.length == 1 && !n(0).getAs[Boolean]("is_match"))
  }

  test("scd2 applySnapshot: absence expires the current version, presence versions changes") {
    def ts(s: String) = Timestamp.valueOf(s)
    val history = Seq(
      ("u1", ts("2024-03-01 10:00:00"), 1L, "A"),
      ("u2", ts("2024-03-01 11:00:00"), 2L, "A"),
      ("u2", ts("2024-03-02 09:00:00"), 3L, "B"))
      .toDF("bk", "ts", "event_id", "attr")
    val existing = Scd2.fromHistory(history, "bk", "ts", Seq("event_id"), Seq("attr"))
    // snapshot at 03-05: u1 changed to B, u2 vanished (deleted)
    val snap = Seq(("u1", "B")).toDF("bk", "attr")
    val got = Scd2.applySnapshot(existing, snap, "bk", Seq("attr"),
      to_date(lit("2024-03-05")))
      .collect().map(r => (r.getAs[String]("bk"), r.getAs[String]("attr")) ->
        (r.getAs[Date]("valid_from").toString,
          Option(r.getAs[Date]("valid_to")).map(_.toString),
          r.getAs[Boolean]("is_current"))).toMap
    // u1: A expires the day before the snapshot version starts; B current
    assert(got(("u1", "A")) == (("2024-03-01", Some("2024-03-04"), false)))
    assert(got(("u1", "B")) == (("2024-03-05", None, true)))
    // u2: closed history untouched, current version expired at asOf-1
    assert(got(("u2", "A")) == (("2024-03-01", Some("2024-03-01"), false)))
    assert(got(("u2", "B")) == (("2024-03-02", Some("2024-03-04"), false)))
    // invariant: nobody is current for a deleted key
    assert(!got.exists { case ((bk, _), (_, _, cur)) => bk == "u2" && cur })
    // an UNCHANGED present key gains no version: snapshot again with B
    val again = Scd2.applySnapshot(
      Scd2.applySnapshot(existing, snap, "bk", Seq("attr"), to_date(lit("2024-03-05"))),
      Seq(("u1", "B")).toDF("bk", "attr"), "bk", Seq("attr"), to_date(lit("2024-03-08")))
    assert(again.filter(col("bk") === "u1").count() == 2)
  }

  test("scd3CurrentPrev: last two runs with run-start stamps; single-run keys ship NULL prev") {
    val rows = Seq(
      // u1: A(t1,t2) -> B(t3) -> A(t4,t5): current A since t4, prev B since t3, 3 runs
      ("u1", "2024-03-01 10:00:00", 1L, "A"),
      ("u1", "2024-03-01 11:00:00", 2L, "A"),
      ("u1", "2024-03-02 09:00:00", 3L, "B"),
      ("u1", "2024-03-03 08:00:00", 4L, "A"),
      ("u1", "2024-03-03 09:00:00", 5L, "A"),
      // u2: single run
      ("u2", "2024-03-01 10:00:00", 6L, "X"),
      ("u2", "2024-03-02 10:00:00", 7L, "X")
    ).map { case (u, ts, id, a) => (u, Timestamp.valueOf(ts), id, a) }
      .toDF("bk", "ts", "event_id", "attr")
    val got = Scd2.scd3CurrentPrev(rows, "bk", "ts", "event_id", col("attr"))
      .collect().map(r => r.getAs[String]("bk") -> r).toMap
    val u1 = got("u1")
    assert(u1.getAs[String]("current_value") == "A")
    assert(u1.getAs[Timestamp]("current_since") == Timestamp.valueOf("2024-03-03 08:00:00"))
    assert(u1.getAs[String]("prev_value") == "B")
    assert(u1.getAs[Timestamp]("prev_since") == Timestamp.valueOf("2024-03-02 09:00:00"))
    assert(u1.getAs[Long]("n_runs") == 3L)
    val u2 = got("u2")
    assert(u2.getAs[String]("current_value") == "X")
    assert(u2.isNullAt(u2.fieldIndex("prev_value")))
    assert(u2.getAs[Long]("n_runs") == 1L)
  }

  test("dataVaultLink: one row per relationship, replayable hashes, satellite seed") {
    val rel = Seq(
      (10L, 100L, ts("2024-01-03 00:00:00")),
      (10L, 100L, ts("2024-01-01 00:00:00")),  // dup pair: collapses, min date
      (10L, 200L, ts("2024-01-02 00:00:00")),
      (20L, 100L, ts("2024-01-05 00:00:00")))
      .toDF("cust", "supp", "odate")
    val got = graft.operators.Star.dataVaultLink(rel, "cust", "supp", "odate")
      .collect().map(r => (r.getAs[Long]("left_key"), r.getAs[Long]("right_key")) -> r)
      .toMap
    assert(got.size == 3)
    val a = got((10L, 100L))
    assert(a.getAs[Long]("n_rows") == 2L)
    assert(a.getAs[java.sql.Timestamp]("first_seen") == ts("2024-01-01 00:00:00"))
    // hash keys replay the documented md5 recipe exactly
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(a.getAs[String]("link_hash") == md5hex("10|100"))
    assert(a.getAs[String]("hub_left_hash") == md5hex("10"))
    assert(a.getAs[String]("hub_right_hash") == md5hex("100"))
    // the same hub key hashes identically across links (join-ready)
    assert(got((10L, 200L)).getAs[String]("hub_left_hash") == md5hex("10"))
    assert(got((20L, 100L)).getAs[String]("hub_right_hash") == md5hex("100"))
  }
}
