package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.sim.Similarity

/** Late round-3 operators: deterministic group mode, equi-width histograms,
  * embedding quantization, share-of-total, schema-drift unions. */
class Round3bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("groupMode picks the most frequent value, smallest value on ties") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"),          // b wins on count
      ("g2", "z"), ("g2", "y"),                       // tie -> y (smallest)
      ("g3", "only")).toDF("grp", "v")
    val out = Analytics.groupMode(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("g1", "b", 2L), ("g2", "y", 1L), ("g3", "only", 1L)))
  }

  test("groupMode is deterministic under repartitioning") {
    val df = Seq.tabulate(1000)(i => (i % 7, s"v${i % 3}")).toDF("grp", "v")
    val a = Analytics.groupMode(df, "grp", "v").collect().toSet
    val b = Analytics.groupMode(df.repartition(13), "grp", "v").collect().toSet
    assert(a === b)
  }

  test("equiWidthHistogram buckets by floor division and covers all rows") {
    val df = Seq(0.0, 12.5, 24.99, 25.0, 49.9, 110.0).toDF("x")
    val out = Analytics.equiWidthHistogram(df, "x", 25.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out === Map(0 -> 3L, 1 -> 2L, 4 -> 1L))
  }

  test("quantizeCodes maps min->0, max->255, constant vectors to zero") {
    val df = Seq(
      (1L, Seq(0.0f, 0.5f, 1.0f)),
      (2L, Seq(3.0f, 3.0f, 3.0f))).toDF("vec_id", "embedding")
    val rows = df.select($"vec_id", Similarity.quantizeCodes($"embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows(1L) === Seq(0, 128, 255))
    assert(rows(2L) === Seq(0, 0, 0))
  }

  test("quantizeStats matches codes computed on the driver") {
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(16)(j => ((i * 31 + j * 7) % 101).toFloat / 10f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.quantizeStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))))
      .toMap
    vecs.foreach { case (id, v) =>
      val mn = v.min.toDouble; val mx = v.max.toDouble
      val codes = v.map(x =>
        if (mx == mn) 0
        else math.min(255L, math.floor((x.toDouble - mn) / (mx - mn) * 256.0).toLong).toInt)
      assert(got(id) === ((16, codes.map(_.toLong).sum, codes.min, codes.max)),
        s"vec $id")
    }
  }

  test("revenueShareBySegment shares sum to ~1 and weight exact cents") {
    val fact = Seq(
      ("A", 10.004), ("A", 20.0), ("B", 30.01), ("C", 39.99)
    ).toDF("c_mktsegment", "revenue")
    val out = Analytics.revenueShareBySegment(fact).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out("A")._1 === 30.0)   // 10.00 + 20.00 in integer cents
    assert(out("B")._1 === 30.01)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
    assert(out("C")._2 === math.rint(39.99 / 100.0 * 1e6) / 1e6)
  }

  test("unionByName aligns drifted schemas by name with null fill") {
    val legacy = Seq((1L, 10.0)).toDF("k", "price")
    val current = Seq((2L, "HIGH")).toDF("k", "prio")
    val u = legacy.unionByName(current, allowMissingColumns = true)
    assert(u.columns.toSeq === Seq("k", "price", "prio"))
    val rows = u.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows === Set((1L, Some(10.0), None), (2L, None, Some("HIGH"))))
  }
}
