package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.tables.{LakeTable, ZOrder}

class ZOrderSpec extends SparkSpec {

  private lazy val events = graft.tables.Tables.events(spark, "/root/testdata/sf0.01")
    .select("event_id", "user_id", "value")

  /** Per-file (min,max) bounding boxes over the two layout columns. */
  private def boxes(dir: String): Seq[((Long, Long), (Double, Double))] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f)
          .agg(min("user_id"), max("user_id"), min("value"), max("value")).head()
        ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))
      }
  }

  test("z-order layout prunes multi-dimensional boxes better than linear sort") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    // 64 files => 3 z-bits per dimension; at 16 the curve is too coarse for
    // file spans to separate cleanly and the comparison turns on sampling
    // luck in the range partitioner
    ZOrder.layout(events, Seq("user_id", "value"), numFiles = 64)
      .write.mode("overwrite").parquet(zDir)
    events.repartitionByRange(64, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linDir)

    // boxes WIDE in the linear sort key (a third of users) and NARROW in
    // value — the shape where a one-dimensional sort cannot help but the
    // z-curve's second dimension can. Range partitioning SAMPLES its
    // bounds, so a single box can wobble by a file run-to-run; the
    // aggregate over boxes must still be strictly better.
    val boxesToProbe = Seq(
      (0L, 50L, 80.0, 150.0), (50L, 100L, 150.0, 250.0),
      (100L, 149L, 70.0, 130.0), (20L, 120L, 250.0, 490.0),
      (0L, 149L, 130.0, 200.0), (30L, 90L, 40.0, 60.0))
    def hits(dir: String, uLo: Long, uHi: Long, vLo: Double, vHi: Double): Int =
      boxes(dir).count { case ((ulo, uhi), (vlo, vhi)) =>
        ulo <= uHi && uhi >= uLo && vlo <= vHi && vhi >= vLo
      }
    val zHits = boxesToProbe.map { case (a, b, c, d) => hits(zDir, a, b, c, d) }.sum
    val linHits = boxesToProbe.map { case (a, b, c, d) => hits(linDir, a, b, c, d) }.sum
    // linear sort clusters user_id only -> value spans the full range in
    // every file, so all user-matching files intersect the box; z-order
    // confines both dimensions
    assert(zHits < linHits,
      s"z=$zHits lin=$linHits zFiles=${boxes(zDir).mkString(";")} " +
        s"linFiles=${boxes(linDir).mkString(";")}")

    // layout change must not change query results
    val (uLo, uHi, vLo, vHi) = boxesToProbe.head
    val q = (d: String) => spark.read.parquet(d)
      .filter(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))
      .agg(count(lit(1)), sum("event_id")).head()
    assert(q(zDir) === q(linDir))
  }

  test("LakeTable.zorder commits a layout-only rewrite") {
    val wh = Files.createTempDirectory("graft-zlake").toString
    val lake = new LakeTable(spark, wh)
    lake.write(events, "ev")
    val c = lake.zorder("ev", Seq("user_id", "value"), targetFiles = 8)
    assert(c.mode === "zorder")
    assert(lake.read("ev").count() === events.count())
    val (ok, detail) = lake.validate("ev")
    assert(ok, detail)
  }
}
