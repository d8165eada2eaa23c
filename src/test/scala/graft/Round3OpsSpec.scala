package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Merge}
import graft.tables.LakeTable

/** Round-3 operators: MERGE/upsert, SCD2, deterministic hash sampling,
  * gap-filled scaffolds, exact percentiles. */
class Round3OpsSpec extends SparkSpec {

  import spark.implicits._

  test("upsertPlan updates matched, inserts unmatched, deletes on condition") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq(
      (2L, "B", 22.0),   // matched -> update
      (4L, "d", 40.0),   // unmatched -> insert
      (3L, "c", 30.0),   // matched + deleteWhen -> delete
      (6L, "f", 60.0))   // UNmatched + deleteWhen -> insert (Delta parity)
      .toDF("k", "s", "v")
    val out = Merge.upsertPlan(target, updates, Seq("k"),
      deleteWhen = Some(col("k") === 3L || col("k") === 6L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "a", 10.0), (2L, "B", 22.0), (4L, "d", 40.0),
      (6L, "f", 60.0)))
  }

  test("upsertPlan without deleteWhen is plain upsert; column order preserved") {
    val target = Seq((1L, "a")).toDF("k", "s")
    // update frame with columns in a different order still aligns by name
    val updates = Seq(("x", 1L), ("y", 5L)).toDF("s", "k")
    val out = Merge.upsertPlan(target, updates, Seq("k"))
    assert(out.columns.toSeq === Seq("k", "s"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "x"), (5L, "y")))
  }

  test("requireUniqueKeys flags duplicate update keys") {
    val updates = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "s")
    val bad = Merge.requireUniqueKeys(updates, Seq("k")).collect()
    assert(bad.length === 1 && bad.head.getLong(0) === 1L)
    assert(Merge.requireUniqueKeys(updates.filter(col("k") === 2L), Seq("k")).isEmpty)
  }

  test("scd2 collapses runs into validity intervals with one current row per key") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (1L, "view", ts("2026-01-01 10:00:00"), 1L),
      (1L, "view", ts("2026-01-01 10:05:00"), 2L),   // same run
      (1L, "cart", ts("2026-01-01 10:10:00"), 3L),   // new run
      (1L, "view", ts("2026-01-01 10:20:00"), 4L),   // back again = new run
      (2L, "buy", ts("2026-01-02 09:00:00"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Merge.scd2(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from").collect()
    assert(out.length === 4) // 3 runs for user 1, 1 for user 2
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("view", "cart", "view"))
    // intervals chain: valid_to of row i == valid_from of row i+1
    assert(u1(0).getTimestamp(3) === u1(1).getTimestamp(2))
    assert(u1(1).getTimestamp(3) === u1(2).getTimestamp(2))
    // exactly one current row per key
    assert(out.count(_.getBoolean(4)) === 2)
    assert(u1.last.isNullAt(3) && u1.last.getBoolean(4))
  }

  test("LakeTable.merge commits a new version; time travel sees pre-merge") {
    val dir = Files.createTempDirectory("graft-merge").toString
    val lake = new LakeTable(spark, dir)
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), "t")
    val c = lake.merge("t",
      Seq((1L, "DEL"), (2L, "B"), (3L, "c")).toDF("k", "s"), Seq("k"),
      deleteWhen = Some(col("s") === "DEL"))
    assert(c.version === 1L && c.mode === "merge" && c.rowCount === 2L)
    assert(lake.read("t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((2L, "B"), (3L, "c")))
    assert(lake.read("t", asOfVersion = Some(0L)).count() === 2L)
    assert(lake.validate("t")._1)
  }

  test("streamMergeToLake applies changelog batches incrementally across restarts") {
    import graft.stream.Events
    val base = Files.createTempDirectory("graft-cdc")
    val src = base.resolve("src"); Files.createDirectories(src)
    val cp = base.resolve("cp").toString
    val lake = new LakeTable(spark, base.resolve("wh").toString)
    def stream = spark.readStream.schema("k LONG, s STRING").json(src.toString)
    def state = lake.read("t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    Files.writeString(src.resolve("b1.json"),
      "{\"k\":1,\"s\":\"a\"}\n{\"k\":2,\"s\":\"b\"}")
    Events.streamMergeToLake(stream, lake, "t", Seq("k"),
      deleteWhen = Some(col("s") === "DEL"), checkpointDir = Some(cp))
      .awaitTermination()
    assert(state === Set((1L, "a"), (2L, "b")))

    // restart: the checkpoint makes the second run see only the new file
    Files.writeString(src.resolve("b2.json"),
      "{\"k\":2,\"s\":\"B\"}\n{\"k\":3,\"s\":\"c\"}\n{\"k\":1,\"s\":\"DEL\"}")
    Events.streamMergeToLake(stream, lake, "t", Seq("k"),
      deleteWhen = Some(col("s") === "DEL"), checkpointDir = Some(cp))
      .awaitTermination()
    assert(state === Set((2L, "B"), (3L, "c")))
    assert(lake.history("t").map(_.mode) === Seq("overwrite", "merge"))
  }

  test("hashSample is deterministic, order-independent, and ~keep/16 sized") {
    val df = (1L to 4000L).toDF("id")
    val a = Analytics.hashSample(df, "id", 4).collect().map(_.getLong(0)).toSet
    val b = Analytics.hashSample(df.repartition(7), "id", 4)
      .collect().map(_.getLong(0)).toSet
    assert(a === b) // reproducible under any partitioning
    // md5 first nibble is ~uniform: expect ~1000 of 4000, allow wide margin
    assert(a.size > 800 && a.size < 1200)
    // nested property: a 1/16 sample is a subset of the 4/16 sample
    val tiny = Analytics.hashSample(df, "id", 1).collect().map(_.getLong(0)).toSet
    assert(tiny.subsetOf(a))
  }

  test("monthlyOrderScaffold zero-fills gap months") {
    val d = java.sql.Date.valueOf(_: String)
    val orders = Seq(
      (1L, d("2026-01-15"), 10.0),
      (2L, d("2026-01-20"), 20.0),
      // February missing entirely
      (3L, d("2026-03-02"), 30.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Analytics.monthlyOrderScaffold(orders)
      .orderBy("month_start").collect()
    assert(out.map(_.getDate(0).toString).toSeq ===
      Seq("2026-01-01", "2026-02-01", "2026-03-01"))
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 0L, 1L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(30.0, 0.0, 30.0))
  }

  test("coPurchasePairs keeps strict self-join multiset semantics with dup parts") {
    val li = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L), (3L, 10L), (3L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Graph.coPurchasePairs(li, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // order 1 has part 10 twice: pair (10,20) twice, never (10,10)
    assert(out === Map((10L, 20L) -> 3L, (20L, 30L) -> 1L))
  }

  test("connectedComponents labels every vertex with its component's min id") {
    // two components: {1,2,3,9} (chain) and {5,7}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val out = graft.ops.Graph.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents: union-find fast path equals the distributed loop") {
    // long chains (pointer-jumping territory), a clique, an isolated edge,
    // and shared-min collisions — labels must agree row-for-row with the
    // loop forced via smallGraphEdgeCap = 0
    val pairs = (
      (1L to 40L).sliding(2).map(s => (s.head, s.last)).toSeq ++ // 40-chain
        Seq((100L, 101L), (100L, 102L), (101L, 102L), // clique
          (200L, 300L), // isolated edge
          (41L, 1L)) // cycle back into the chain
      ).toDF("a", "b")
    val fast = graft.ops.Graph.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = graft.ops.Graph.connectedComponents(pairs, "a", "b",
      smallGraphEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === loop)
    assert(fast(41L) === 1L && fast(102L) === 100L && fast(300L) === 200L)
  }

  test("labelCentroids averages each dimension within a label") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, 6.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.sim.Similarity.labelCentroids(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out === Map(
      (0, 0) -> (2.0, 2L), (0, 1) -> (4.0, 2L),
      (1, 0) -> (10.0, 1L), (1, 1) -> (20.0, 1L)))
  }

  test("orderPricePercentiles: exact interpolation on a known tiny group") {
    val orders = Seq((1L, "F", 10.0), (2L, "F", 20.0), (3L, "F", 30.0),
      (4L, "F", 40.0), (5L, "F", 50.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val r = Analytics.orderPricePercentiles(orders).collect().head
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === 20.0) // p25 of 5 evenly spaced values
    assert(r.getDouble(3) === 30.0)
    assert(r.getDouble(4) === 40.0)
    assert(r.getDouble(5) === 46.0) // (5-1)*0.9 = 3.6 -> 40 + 0.6*10
  }
}
