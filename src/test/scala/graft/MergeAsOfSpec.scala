package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.MergeAsOf

class MergeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("merge as-of exec: backward semantics, exact-time inclusive, pre-first NULL") {
    val fact = Seq(
      (1L, 10L, d("2024-01-05")), // between v1 and v2 -> v1
      (2L, 10L, d("2024-01-10")), // exactly v2's start -> v2 (inclusive)
      (3L, 10L, d("2023-12-31")), // before the first version -> NULL
      (4L, 20L, d("2024-06-01")), // other key -> its only version
      (5L, 99L, d("2024-06-01"))) // key with no dim at all -> NULL
      .toDF("event_id", "k", "t")
    val dim = Seq(
      (10L, d("2024-01-01"), "v1"),
      (10L, d("2024-01-10"), "v2"),
      (20L, d("2024-01-01"), "w1"))
      .toDF("bk", "valid_from", "payload")
    val out = MergeAsOf.join(fact, dim, Seq("k"), Seq("bk"), "t", "valid_from")
    // plan shape: the custom exec is in the physical plan, no window,
    // no sort-merge JOIN (our merge pass is not a join node)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MergeAsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan)
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(5)) None else Some(r.getString(5)))).toMap
    assert(got == Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> None,
      4L -> Some("w1"), 5L -> None))
  }

  test("merge as-of exec: null keys and null times never match") {
    val fact = Seq(
      (1L, Option(10L), Option(d("2024-01-05"))),
      (2L, Option.empty[Long], Option(d("2024-01-05"))),
      (3L, Option(10L), Option.empty[Date]))
      .toDF("event_id", "k", "t")
    val dim = Seq(
      (Option(10L), Option(d("2024-01-01")), "v1"),
      (Option.empty[Long], Option(d("2024-01-01")), "nullkey"),
      (Option(10L), Option.empty[Date], "nulltime"))
      .toDF("bk", "valid_from", "payload")
    val got = MergeAsOf.join(fact, dim, Seq("k"), Seq("bk"), "t", "valid_from")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) None else Some(r.getString(5)))).toMap
    assert(got == Map(1L -> Some("v1"), 2L -> None, 3L -> None))
  }

  test("merge as-of exec: equals the merge-scan twin on seeded random chains") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val keys = 0L until 6L
      val dimRows = keys.flatMap { k =>
        val nv = 1 + rnd.nextInt(4)
        val starts = Seq.fill(nv)(rnd.nextInt(60)).distinct.sorted
        starts.zipWithIndex.map { case (off, i) =>
          (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(off)),
            s"k$k-v$i")
        }
      }
      val factRows = (1 to 120).map { i =>
        (i.toLong, rnd.nextInt(8).toLong,
          Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
            .plusDays(rnd.nextInt(70) - 5)))
      }
      val fact = factRows.toDF("event_id", "k", "t")
      val dim = dimRows.toDF("bk", "valid_from", "payload")
      val exec = MergeAsOf.join(fact, dim, Seq("k"), Seq("bk"), "t", "valid_from")
        .select(col("event_id"), col("payload")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      val twin = AsOfJoin.mergeScan(fact, dim, "k", "bk", col("t"))
        .select(col("event_id"), col("payload")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      assert(exec == twin, s"trial $trial")
    }
  }

  test("merge as-of exec: multi-column keys resolve per composite key") {
    val fact = Seq((1L, 1L, "A", d("2024-01-05")), (2L, 1L, "B", d("2024-01-05")))
      .toDF("event_id", "k1", "k2", "t")
    val dim = Seq(
      (1L, "A", d("2024-01-01"), "pa"),
      (1L, "B", d("2024-01-02"), "pb"))
      .toDF("b1", "b2", "valid_from", "payload")
    val got = MergeAsOf.join(fact, dim, Seq("k1", "k2"), Seq("b1", "b2"),
        "t", "valid_from")
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(got == Map(1L -> "pa", 2L -> "pb"))
  }
}
