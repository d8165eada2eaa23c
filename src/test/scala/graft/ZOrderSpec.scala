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
    ZOrder.layout(events, Seq("user_id", "value"), numFiles = 16)
      .write.mode("overwrite").parquet(zDir)
    events.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linDir)

    // a selective 2-D box: ~10% of each dimension
    val uLo = 100L; val uHi = 200L; val vLo = 10.0; val vHi = 20.0
    def hits(dir: String): Int = boxes(dir).count { case ((ulo, uhi), (vlo, vhi)) =>
      ulo <= uHi && uhi >= uLo && vlo <= vHi && vhi >= vLo
    }
    val zHits = hits(zDir)
    val linHits = hits(linDir)
    // linear sort clusters user_id only -> value spans the full range in
    // every file, so all user-matching files intersect the box; z-order
    // confines both dimensions
    assert(zHits < linHits, s"z=$zHits lin=$linHits")

    // layout change must not change query results
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
