package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Documents
import graft.quality.Quality
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Property tests (SURVEY §5.2) — scalacheck generators sampled
  * deterministically, properties asserted on one batched DataFrame per case
  * so each property is a handful of Spark jobs, not one per sample. */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyListGen = Gen.listOfN(30, Gen.chooseNum(1L, 12L))

  test("property: checkForeignKey count == multiset count of dangling child keys") {
    samples(Gen.zip(keyListGen, keyListGen), 8).foreach { case (childKeys, parentKeys) =>
      val child = df(childKeys.map(k => Ord(scala.util.Random.nextLong().abs, k)))
      val parent = df(parentKeys.distinct.map(k => Cust(k, s"u$k@x.se", 30)))
      val expected = childKeys.count(k => !parentKeys.contains(k))
      val got = Quality.checkForeignKey(child, parent, "customer_id", "customer_id").count()
      assert(got === expected, s"child=$childKeys parent=${parentKeys.distinct}")
    }
  }

  test("property: checkUnique flags exactly keys with multiplicity > 1") {
    samples(keyListGen, 8).foreach { keys =>
      val t = df(keys.zipWithIndex.map { case (k, i) => Ord(i.toLong, k) })
      val expected = keys.groupBy(identity).count(_._2.size > 1)
      assert(Quality.checkUnique(t, "customer_id").count() === expected)
    }
  }

  test("property: nest then unnest preserves the line-item multiset") {
    val itemsGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(1L, 8L), Gen.chooseNum(1, 5), Gen.chooseNum(1L, 99L)))
    samples(itemsGen, 5).foreach { raw =>
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val orderKeys = raw.map(_._1).distinct
      val orders = df(orderKeys.map(k => OrdRow(k, 100 + k, "O", 1.0, ts, "1-URGENT")))
      val lines = df(raw.zipWithIndex.map { case ((ok, ln, pk), i) =>
        LineRow(ok, ln, pk, 1.0 + i, 10.0 * i, 0.0)
      })
      val back = Documents.unnest(Documents.nest(orders, lines))
        .select("o_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      val want = raw.zipWithIndex
        .map { case ((ok, ln, pk), i) => (ok, ln, pk, 1.0 + i) }.sorted
      assert(back === want)
    }
  }

  test("property: jaccard is symmetric, bounded, and 1 on self") {
    val wordsGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val pairs = samples(Gen.zip(wordsGen, wordsGen), 20)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a.distinct.toArray, b.distinct.toArray)
    }
    import spark.implicits._
    val t = rows.toDF("id", "a", "b")
    val bad = t.select(
        Dedup.jaccard(col("a"), col("b")).as("ab"),
        Dedup.jaccard(col("b"), col("a")).as("ba"),
        Dedup.jaccard(col("a"), col("a")).as("aa"))
      .filter(col("ab") =!= col("ba") || col("aa") =!= 1.0 ||
        col("ab") < 0.0 || col("ab") > 1.0)
    assert(bad.count() === 0)
  }

  test("property: exact-dedup keeps exactly one doc per normalized text") {
    val textGen = Gen.listOfN(25, Gen.oneOf(
      "the cat", "The  Cat", "a dog", "a  DOG", "fish", "bird song"))
    samples(textGen, 5).foreach { texts =>
      val docs = df(texts.zipWithIndex.map { case (t, i) =>
        Doc(i.toLong, t, "en", "s", t.length.toLong)
      })
      val kept = Dedup.dropExactDups(docs).count()
      val expected = texts.map(_.toLowerCase.trim.replaceAll("\\s+", " ")).distinct.size
      assert(kept === expected)
    }
  }

  test("property: upsertPlan matches reference map semantics") {
    import graft.ops.Merge
    import spark.implicits._
    // keys from a small space force plenty of matched/unmatched overlap;
    // delete marker is value < 0
    val rowsGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(-5, 99)))
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (t0, u0) =>
      val target = t0.groupBy(_._1).map(_._2.head).toSeq // unique keys
      val updates = u0.groupBy(_._1).map(_._2.head).toSeq
      val got = Merge.upsertPlan(
        target.toDF("k", "v"), updates.toDF("k", "v"), Seq("k"),
        deleteWhen = Some(col("v") < 0))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
      // Delta parity: a delete marker fires only WHEN MATCHED; an unmatched
      // marked row hits the not-matched clause first and is inserted
      val tm = target.toMap
      val merged = (tm ++ updates.toMap).filter {
        case (k, v) => !(updates.toMap.contains(k) && v < 0 && tm.contains(k))
      }.toSeq.sorted
      assert(got === merged, s"target=$target updates=$updates")
    }
  }

  test("property: scd2 intervals chain and cover every value change") {
    import graft.ops.Merge
    import spark.implicits._
    val evGen = Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("a", "b")))
    samples(evGen, 8).foreach { evs =>
      val rows = evs.zipWithIndex.map { case ((k, v), i) =>
        (k, v, java.sql.Timestamp.valueOf(f"2026-01-01 00:${i}%02d:00"), i.toLong)
      }
      val out = Merge.scd2(rows.toDF("k", "v", "ts", "id"), "k", "v", "ts", "id")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      // reference: collapse consecutive runs per key in arrival order
      val expect = rows.groupBy(_._1).view.mapValues { rs =>
        val ordered = rs.sortBy(_._4)
        ordered.foldLeft(Vector.empty[(String, java.sql.Timestamp)]) {
          case (acc, (_, v, ts, _)) =>
            if (acc.lastOption.exists(_._1 == v)) acc else acc :+ (v -> ts)
        }
      }.toMap
      for ((k, runs) <- expect) {
        val got = out.filter(_._1 == k).sortBy(_._3)
        assert(got.map(g => (g._2, g._3)).toVector === runs, s"k=$k evs=$evs")
        // valid_to chains to the next valid_from; only the last is current
        got.sliding(2).foreach {
          case Array(a, b) => assert(a._4.contains(b._3) && !a._5)
          case _ => ()
        }
        assert(got.last._4.isEmpty && got.last._5)
      }
    }
  }

  test("property: sumMoney is invariant under repartitioning (exact cents)") {
    import graft.functions.money
    val amountGen = Gen.listOfN(200, Gen.chooseNum(1L, 999999L).map(_ / 100.0))
    samples(amountGen, 5).foreach { amounts =>
      val base = df(amounts.zipWithIndex.map { case (a, i) => KV(i.toLong, a) })
      val sums = Seq(1, 7, 32).map { k =>
        base.repartition(k).agg(money.sumMoney(col("v")).as("s"))
          .head().getDouble(0)
      }
      // bit-identical across partition counts — the BIGINT cents sum is
      // associative where a double sum is not
      assert(sums.distinct.size === 1, s"partition-count-dependent: $sums")
      val expected = amounts.map(a => math.floor(a * 100.0 + 0.5).toLong).sum / 100.0
      assert(sums.head === expected)
    }
  }

  test("property: quantizeCodes is bounded, order-preserving, hits 0 and 255") {
    import graft.sim.Similarity
    val vecGen = Gen.listOfN(24, Gen.chooseNum(-1000, 1000).map(_ / 7.0f))
    val vecs = samples(vecGen, 30).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val out = df(vecs.map { case (id, v) => Vec(id, v.toArray, 0) })
      .select(col("vec_id"), col("embedding"),
        Similarity.quantizeCodes(col("embedding")).as("codes"))
      .collect()
      .map(r => (r.getSeq[Float](1), r.getSeq[Int](2)))
    out.foreach { case (v, codes) =>
      assert(codes.forall(c => c >= 0 && c <= 255))
      if (v.max > v.min) {
        assert(codes(v.indexOf(v.min)) === 0)
        assert(codes(v.indexOf(v.max)) === 255)
        // monotone: larger input never quantizes below a smaller one
        v.zip(codes).sortBy(_._1).map(_._2).sliding(2).foreach {
          case Seq(a, b) => assert(a <= b)
          case _ => ()
        }
      } else assert(codes.forall(_ === 0))
    }
  }

  test("property: packing bins are dense and every bin holds <= capacity") {
    import graft.text.TextFeatures
    val lenGen = Gen.listOfN(40, Gen.chooseNum(1, 900))
    samples(lenGen, 5).foreach { lens =>
      val docs = df(lens.zipWithIndex.map { case (n, i) =>
        Doc2(i.toLong, "s", List.fill(n)("t").mkString(" ")) })
      val rows = TextFeatures.packingPlan(docs, capacity = 512)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      // running totals reconstruct: cum_i = cum_{i-1} + n_i
      rows.sliding(2).foreach {
        case Array((_, c1, _, _), (n2, c2, _, _)) => assert(c2 === c1 + n2)
        case _ => ()
      }
      rows.foreach { case (n, cum, start, end) =>
        assert(start === (cum - n) / 512)
        assert(end === (cum - 1) / 512)
        assert(start <= end)
      }
      // bins are dense 0..maxBin: a doc's span never skips a bin boundary
      val maxBin = rows.map(_._4).max
      val covered = rows.flatMap { case (_, _, s, e) => s to e }.toSet
      assert(covered === (0L to maxBin).toSet)
    }
  }

  test("property: globalPrefixSums == single-window running sums, any bucket width") {
    import org.apache.spark.sql.expressions.Window
    val rowsGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(-100L, 100L), Gen.chooseNum(0L, 9L)))
    val widthGen = Gen.oneOf(1L, 7L, 50L, 1000L)
    samples(Gen.zip(rowsGen, widthGen), 6).foreach { case (kvs, width) =>
      // unique sort key (k, id) so the reference order is total
      val rows = kvs.zipWithIndex.map { case ((k, v), i) => PS(i.toLong, k, v) }
      val d = df(rows)
      val got = graft.ops.Analytics.globalPrefixSums(d,
          floor(col("k") / lit(width.toDouble)),
          Seq(col("k").asc, col("id").asc), Seq("v" -> col("v")))
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("cum_v"), r.getAs[Long]("total_v"))).toMap
      val w = Window.orderBy(col("k").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = d.select(col("id"), sum(col("v")).over(w).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tot = rows.map(_.v).sum
      rows.foreach { r =>
        assert(got(r.id)._1 === want(r.id), s"id=${r.id} width=$width")
        assert(got(r.id)._2 === tot)
      }
    }
  }

  test("property: positional gramStream equals the shingle-array explode on arbitrary text") {
    import spark.implicits._
    // adversarial texts: empty, whitespace-only, single token, shorter than
    // n, repeated tokens, mixed whitespace, accented tokens
    val tokGen = Gen.oneOf("a", "bb", "ccc", "Dd", "éé", "x1")
    val textGen = Gen.frequency(
      (1, Gen.const("")),
      (1, Gen.const("   ")),
      (1, Gen.const("\tone\n two  ")),
      (6, Gen.chooseNum(1, 12).flatMap(k =>
        Gen.listOfN(k, tokGen).map(_.mkString(" ")))),
      (2, Gen.listOfN(9, Gen.const("dup")).map(_.mkString(" "))))
    for (n <- Seq(2, 3, 5)) {
      val texts = samples(textGen, 60).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val d = texts.toDF("doc_id", "text")
      val viaArray = d.select(col("doc_id"),
          graft.text.TextStats.tokens(
            graft.text.TextStats.normalize(col("text"))).as("toks"))
        .select(col("doc_id"),
          explode(graft.text.TextStats.shinglesOf(col("toks"), n)).as("gram"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val viaStream = graft.text.TextStats.gramStream(d, n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(viaStream === viaArray, s"n=$n")
    }
  }

  test("property: patch hashes through the real PNG codec equal brute " +
    "window recomputation, and any aligned crop under any brightness " +
    "shift reproduces the source's window hash") {
    import graft.multimodal.MediaDedup
    import graft.multimodal.Multimodal.{Containers, MediaRow}
    import spark.implicits._
    // block values <= 215 so a shift <= 40 never wraps (order-preserving)
    val caseGen = Gen.zip(Gen.chooseNum(8, 12), Gen.chooseNum(8, 11),
      Gen.listOfN(200, Gen.chooseNum(0, 215)), Gen.chooseNum(0, 40))
    def png(id: Long, gw: Int, gh: Int, f: (Int, Int) => Int): MediaRow = {
      val w = 2 * gw; val h = 2 * gh
      val px: Int => Int = i =>
        if (i % 4 == 3) 255 else { val k = i / 4; f((k % w) / 2, (k / w) / 2) }
      MediaRow(id, "image", Containers.pngFull(w, h, px, (id % 5).toInt),
        w, h, 1)
    }
    samples(caseGen, 6).foreach { case (gw, gh, vals, shift) =>
      def v(bx: Int, by: Int): Int = vals((by * gw + bx) % vals.length)
      val ox = shift % (gw - 7); val oy = shift % (gh - 7)
      val media = Seq(png(1, gw, gh, v),
        png(2, 8, 8, (c, r) => v(ox + c, oy + r) + shift)).toDS()
      val hashes = MediaDedup.imagePatchHashes(media).collect()
        .map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
        .toMap
      val brute = (for (wy <- 0 to gh - 8; wx <- 0 to gw - 8) yield {
        var fp = 0L
        for (r <- 0 until 8; c <- 0 until 7)
          if (v(wx + c, wy + r) < v(wx + c + 1, wy + r))
            fp |= 1L << (r * 7 + c)
        ((1L, wx, wy), fp)
      }).toMap
      assert(hashes.view.filterKeys(_._1 == 1L).toMap === brute,
        s"gw=$gw gh=$gh")
      assert(hashes((2L, 0, 0)) === brute((1L, ox, oy)),
        s"crop at ($ox, $oy) shift $shift")
    }
  }
}

case class PS(id: Long, k: Long, v: Long)

case class Doc2(doc_id: Long, source: String, text: String)

case class KV(k: Long, v: Double)
