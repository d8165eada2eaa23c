package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Parquet-backed managed tables with a versioned JSON transaction log —
  * the engine's stand-in for the reference's curated Delta tables
  * (`/root/reference/notebooks/01_dataLake_ingestion.ipynb:571-574` writes
  * `format("delta").mode("overwrite")`; cell 22 at `:628-656` validates the
  * table dir, `_delta_log`, and readback). No Delta jar exists in this
  * environment (SURVEY §0), so the log is our own:
  *
  *   <warehouse>/<table>/_graft_log/vNNNNNNNN.json   — one commit per version
  *   <warehouse>/<table>/data/vNNNNNNNN.<uuid>/      — parquet written by executors
  *                                                     (uuid = per-writer staging,
  *                                                     see [[commitStaged]])
  *
  * Commit protocol: executors write the new data dir first, then the driver
  * writes the log entry to a temp file and atomically renames it into place —
  * readers resolve the latest *committed* log entry, so a crashed write never
  * corrupts the table (write-temp-then-rename; single-writer assumption is
  * documented, there is no multi-driver coordination — the non-ACID boundary
  * called out in SURVEY §7).
  *
  * Scale: data layout is plain partitioned parquet, so reads get partition
  * pruning + predicate pushdown; `partitionBy` columns are recorded in the
  * log and re-applied on append.
  */
final class LakeTable(spark: SparkSession, warehouseDir: String) {

  /** Warehouse root (sidecar writers — materialized views, indexes — anchor
    * their metadata next to the tables they derive from). */
  def warehouse: String = warehouseDir

  private def tableDir(name: String): Path = Paths.get(warehouseDir, name)
  private def logDir(name: String): Path = tableDir(name).resolve("_graft_log")
  // Per-writer UNIQUE staging dir: data is written BEFORE the log-link commit
  // race is decided, so a deterministic data/vNNNNNNNN path would let a losing
  // writer overwrite the winning writer's already-committed v data files. The
  // uuid suffix makes staging collision-free; the committed log entry records
  // the exact path, so readers and vacuum never care about the suffix.
  private def stageDataDir(name: String, v: Long): Path =
    tableDir(name).resolve("data")
      .resolve(f"v$v%08d." + java.util.UUID.randomUUID().toString.take(8))

  private def committedVersions(name: String): Seq[Long] = {
    val ld = logDir(name)
    if (!Files.isDirectory(ld)) Seq.empty
    else Files.list(ld).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.startsWith("v") && f.endsWith(".json"))
      .map(f => f.stripPrefix("v").stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  def exists(name: String): Boolean = committedVersions(name).nonEmpty

  def latestVersion(name: String): Option[Long] = committedVersions(name).lastOption

  /** One committed log entry. `dirs` lists every live data dir (append keeps
    * prior dirs; overwrite starts fresh). `deletes` is the merge-on-read
    * delete stack: each entry is (predicate SQL, dirs it applies to) — a
    * DELETE WHERE costs zero data rewrites, readers subtract matching rows
    * from exactly the dirs that existed at delete time (so a later append
    * of a matching row is NOT retro-deleted, matching Delta's write-time
    * semantics). `constraints` are named CHECK predicates (SQL text)
    * enforced on every subsequent write into the table. */
  final case class Commit(version: Long, mode: String, dirs: Seq[String],
                          schemaJson: String, partitionBy: Seq[String],
                          rowCount: Long,
                          deletes: Seq[(String, Seq[String])] = Seq.empty,
                          constraints: Seq[(String, String)] = Seq.empty) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  private def readCommit(name: String, v: Long): Commit = {
    val json = new String(Files.readAllBytes(logDir(name).resolve(f"v$v%08d.json")), "UTF-8")
    // parse with Spark's bundled json4s — no extra dependency
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val jv = JsonMethods.parse(json)
    // deletes/constraints are absent in pre-feature logs — default empty
    val deletes = (jv \ "deletes") match {
      case JArray(items) => items.map(i =>
        ((i \ "pred").extract[String], (i \ "dirs").extract[Seq[String]]))
      case _ => Seq.empty
    }
    val constraints = (jv \ "constraints") match {
      case JArray(items) => items.map(i =>
        ((i \ "name").extract[String], (i \ "sql").extract[String]))
      case _ => Seq.empty
    }
    Commit(
      (jv \ "version").extract[Long], (jv \ "mode").extract[String],
      (jv \ "dirs").extract[Seq[String]], (jv \ "schemaJson").extract[String],
      (jv \ "partitionBy").extract[Seq[String]], (jv \ "rowCount").extract[Long],
      deletes, constraints)
  }

  private def writeCommit(name: String, c: Commit): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("version" -> c.version) ~ ("mode" -> c.mode) ~ ("dirs" -> c.dirs) ~
        ("schemaJson" -> c.schemaJson) ~ ("partitionBy" -> c.partitionBy) ~
        ("rowCount" -> c.rowCount) ~
        ("deletes" -> c.deletes.map { case (p, ds) =>
          ("pred" -> p) ~ ("dirs" -> ds) }) ~
        ("constraints" -> c.constraints.map { case (n, s) =>
          ("name" -> n) ~ ("sql" -> s) })))
    Files.createDirectories(logDir(name))
    // tmp name must be unique PER WRITER: a shared tmp path would let a
    // racing writer truncate this one's staged bytes pre-link (and the
    // loser's cleanup would delete the winner's in-flight file)
    val tmp = logDir(name).resolve(
      f".v${c.version}%08d.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    val dest = logDir(name).resolve(f"v${c.version}%08d.json")
    // optimistic concurrency: rename(2) REPLACES an existing destination, so
    // a Files.move here would let two racing writers both "win" version v
    // and silently lose one commit. A hard link is the POSIX atomic
    // create-if-absent — the second writer gets FileAlreadyExistsException
    // and must re-read the log and retry at the next version.
    try Files.createLink(dest, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: $name version ${c.version} was committed by another writer")
    }
    Files.deleteIfExists(tmp): Unit
  }

  /** Commit `c` whose data was staged into the unique `staged` dir; on a
    * commit conflict the staged files are orphans — delete them so a losing
    * writer leaves no trace (the winner's dir has a different uuid suffix). */
  private def commitStaged(name: String, c: Commit, staged: Path): Commit = {
    try { writeCommit(name, c); c }
    catch {
      case e: java.util.ConcurrentModificationException =>
        deleteRecursively(staged)
        throw e
    }
  }

  /** Wrap `df` with single-pass CHECK-constraint observation: violation
    * counts ride the caller's write action (`df.observe`), costing zero
    * extra scans. SQL tri-state: a constraint evaluating NULL passes (the
    * SQL-standard CHECK rule); only FALSE rows violate. */
  private def observedWithChecks(df: DataFrame, cs: Seq[(String, String)])
      : (DataFrame, Option[org.apache.spark.sql.Observation]) =
    if (cs.isEmpty) (df, None)
    else {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not, sum, when}
      val obs = org.apache.spark.sql.Observation()
      val aggs = cs.map { case (n, sql) =>
        sum(when(not(coalesce(expr(sql), lit(true))), 1L).otherwise(0L)).as(n)
      }
      (df.observe(obs, aggs.head, aggs.tail: _*), Some(obs))
    }

  /** Abort-before-commit: if any observed constraint counted violations,
    * delete the staged dir and throw — the table never sees the bad data
    * (the commit is what makes data visible, so this is transactional). */
  private def requireChecksPass(name: String, staged: Path,
                                obs: Option[org.apache.spark.sql.Observation]): Unit =
    obs.foreach { o =>
      val bad = o.get.toSeq.collect {
        case (k, v: Long) if v > 0 => s"$k ($v rows)"
      }.sorted
      if (bad.nonEmpty) {
        deleteRecursively(staged)
        throw new IllegalArgumentException(
          s"CHECK constraint violation on $name: ${bad.mkString(", ")} — write aborted")
      }
    }

  /** Persist `df` as table `name`. Append mode enforces schema compatibility
    * (same column names and types, any order) against the live table unless
    * `allowEvolution` — then NEW columns are admitted (existing columns must
    * keep their types) and the committed schema widens; readers see nulls
    * for the new columns on old files.
    *
    * `constraints` are named CHECK predicates (Delta-style table
    * constraints): they persist in the commit and every later write into
    * the table re-enforces them — a violating batch aborts before commit.
    * On overwrite a non-empty `constraints` redefines the set; empty keeps
    * the table's existing ones. Appends enforce the table set plus any new
    * ones passed here (which then persist). Enforcement is a single-pass
    * `observe` riding the write — no second scan. */
  def write(df: DataFrame, name: String, mode: String = "overwrite",
            partitionBy: Seq[String] = Seq.empty,
            allowEvolution: Boolean = false,
            compression: String = "snappy",
            constraints: Seq[(String, String)] = Seq.empty): Commit = {
    require(mode == "overwrite" || mode == "append", s"unsupported mode $mode")
    val prev = latestVersion(name).map(readCommit(name, _))
    val v = prev.map(_.version + 1).getOrElse(0L)
    val parts = if (mode == "append" && prev.nonEmpty) prev.get.partitionBy else partitionBy
    prev.filter(_ => mode == "append").foreach { p =>
      val expected = p.schema.map(f => f.name -> f.dataType).toMap
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      if (allowEvolution) {
        val changed = expected.keySet.intersect(actual.keySet)
          .filter(c => expected(c) != actual(c))
        require(changed.isEmpty, s"append type change for $name on: $changed")
      } else {
        require(expected == actual,
          s"append schema mismatch for $name: table=$expected incoming=$actual")
      }
    }
    val tableConstraints = prev.map(_.constraints).getOrElse(Seq.empty)
    val effectiveConstraints =
      if (mode == "append")
        tableConstraints ++ constraints.filterNot(c =>
          tableConstraints.exists(_._1 == c._1))
      else if (constraints.nonEmpty) constraints
      else tableConstraints
    val (checked, obs) = observedWithChecks(df, effectiveConstraints)
    val dest = stageDataDir(name, v)
    // snappy for hot tables (cheap CPU), zstd for cold/archive versions
    // (~30-40% smaller — at 100 TB that is tens of TB of scan I/O saved);
    // parquet is self-describing so readers never need to know the codec
    val writer = checked.write.mode("overwrite").option("compression", compression)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(dest.toString)
    requireChecksPass(name, dest, obs)
    val dirs = (if (mode == "append") prev.map(_.dirs).getOrElse(Seq.empty)
                else Seq.empty) :+ dest.toString
    // count the WRITTEN files (parquet footer metadata, no data scan) rather
    // than df.count(), which would recompute the input plan a second time
    val written = spark.read.parquet(dest.toString).count()
    val total = written +
      (if (mode == "append") prev.map(_.rowCount).getOrElse(0L) else 0L)
    // evolved append: commit the WIDENED schema (old columns + new ones)
    val schemaJson =
      if (mode == "append" && prev.nonEmpty) {
        val known = prev.get.schema.fieldNames.toSet
        StructType(prev.get.schema.fields ++
          df.schema.fields.filterNot(f => known.contains(f.name))).json
      } else df.schema.json
    // append keeps the delete stack (old dirs keep their filters);
    // overwrite starts from fresh data with nothing deleted
    val deletes = if (mode == "append") prev.map(_.deletes).getOrElse(Seq.empty)
                  else Seq.empty
    val commit = Commit(v, mode, dirs, schemaJson, parts, total,
      deletes, effectiveConstraints)
    commitStaged(name, commit, dest)
  }

  /** Read the latest committed version (or `asOfVersion` for time travel).
    * Merge-on-read: each dir subtracts the delete predicates that apply to
    * it (SQL-standard tri-state — a NULL predicate keeps the row, as in
    * Delta DELETE WHERE). The keep-filters are ordinary pushed-down
    * predicates, so deletes cost a per-row filter, never an extra scan. */
  def read(name: String, asOfVersion: Option[Long] = None): DataFrame = {
    val v = asOfVersion.orElse(latestVersion(name))
      .getOrElse(throw new IllegalArgumentException(s"no such table: $name"))
    val c = readCommit(name, v)
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    // one read per committed dir, unioned by name: the version dirs are not
    // partition directories, so a single multi-path read would trip Spark's
    // partition-structure inference when partitionBy is in play.
    // allowMissingColumns: evolved appends widen the schema — old dirs fill
    // the new columns with null.
    c.dirs.map { d =>
      val base = spark.read.parquet(d)
      c.deletes.filter(_._2.contains(d)).map(_._1)
        .foldLeft(base)((df, p) =>
          df.filter(not(coalesce(expr(p), lit(false)))))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** DELETE WHERE with ZERO data rewrites (merge-on-read, the deletion-
    * vector idea at dir granularity): the new commit re-references the same
    * data dirs and pushes `cond` onto the delete stack, scoped to the dirs
    * that exist NOW — later appends are not retro-deleted. Readers pay a
    * pushed-down filter; [[compact]] (or any rewriting op) folds the stack
    * back to zero. The one scan here only counts the removed rows to keep
    * the committed rowCount exact. */
  def deleteWhere(name: String, predSql: String): Commit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val prev = readCommit(name, latestVersion(name).get)
    // count currently-live rows the predicate removes (tri-state: NULL keeps)
    val removed = read(name)
      .filter(coalesce(expr(predSql), lit(false))).count()
    val commit = prev.copy(version = prev.version + 1, mode = "delete",
      deletes = prev.deletes :+ ((predSql, prev.dirs)),
      rowCount = prev.rowCount - removed)
    writeCommit(name, commit)
    commit
  }

  /** Predicate-scoped overwrite (Delta's `replaceWhere`): atomically replace
    * exactly the rows matching `predSql` with `df`, as ONE commit and ZERO
    * rewrites of the untouched data — the old dirs stay referenced and take
    * `predSql` onto the merge-on-read delete stack (scoped to them only),
    * while the incoming batch lands as a new dir in the same commit. The
    * idiomatic backfill/restatement op: "overwrite March" never touches the
    * other 99.9% of a 100 TB table.
    *
    * Containment is enforced Delta-style: every incoming row must satisfy
    * `predSql` (NULL counts as outside the scope), observed in the same
    * single pass as the table's CHECK constraints — a violating batch
    * aborts before commit and cleans its staging. Schema must match the
    * table exactly (as strict append). */
  def replaceWhere(name: String, df: DataFrame, predSql: String): Commit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val prev = readCommit(name, latestVersion(name).get)
    val expected = prev.schema.map(f => f.name -> f.dataType).toMap
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    require(expected == actual,
      s"replaceWhere schema mismatch for $name: table=$expected incoming=$actual")
    val v = prev.version + 1
    val (checked, obs) = observedWithChecks(df,
      prev.constraints :+ (("__replace_where_scope", s"coalesce(($predSql), false)")))
    // rows the predicate removes from the live table, for the exact rowCount
    val removed = read(name).filter(coalesce(expr(predSql), lit(false))).count()
    val dest = stageDataDir(name, v)
    val writer = checked.write.mode("overwrite")
    (if (prev.partitionBy.nonEmpty) writer.partitionBy(prev.partitionBy: _*)
     else writer).parquet(dest.toString)
    requireChecksPass(name, dest, obs)
    val written = spark.read.parquet(dest.toString).count()
    val commit = prev.copy(version = v, mode = "replaceWhere",
      dirs = prev.dirs :+ dest.toString,
      rowCount = prev.rowCount - removed + written,
      deletes = prev.deletes :+ ((predSql, prev.dirs)))
    commitStaged(name, commit, dest)
  }

  /** Zero-copy shallow clone (Delta SHALLOW CLONE): `dst`'s v0 commit
    * re-references `src`'s current data dirs — instant at any scale, no
    * bytes moved. The clone is fully independent going forward (its own
    * log; overwrites/appends/deletes diverge freely). Documented hazard,
    * same as Delta: a later `vacuum(src)` can reclaim dirs the clone still
    * references — clone for experiments/branching, compact the clone to
    * materialize it before vacuuming the source. */
  def cloneTable(src: String, dst: String): Commit = {
    require(!exists(dst), s"clone target $dst already exists")
    val c = readCommit(src, latestVersion(src).get)
    val commit = Commit(0L, "clone", c.dirs, c.schemaJson, c.partitionBy,
      c.rowCount, c.deletes, c.constraints)
    writeCommit(dst, commit)
    commit
  }

  /** Commit history, oldest first. */
  def history(name: String): Seq[Commit] =
    committedVersions(name).map(readCommit(name, _))

  /** Small-file compaction: rewrite the current table contents into
    * `targetFiles` parquet files as a new overwrite commit. At cluster scale
    * the small-files problem (one file per task per append) dominates scan
    * setup cost; compaction is the standard maintenance op. Data is
    * unchanged — only layout. */
  def compact(name: String, targetFiles: Int = 1): Commit = {
    val current = read(name)
    val prev = readCommit(name, latestVersion(name).get)
    val v = prev.version + 1
    val dest = stageDataDir(name, v)
    val writer = current.coalesce(targetFiles).write.mode("overwrite")
    (if (prev.partitionBy.nonEmpty) writer.partitionBy(prev.partitionBy: _*) else writer)
      .parquet(dest.toString)
    // rewriting from read() folds the delete stack into the data itself
    val commit = Commit(v, "compact", Seq(dest.toString), prev.schemaJson,
      prev.partitionBy, prev.rowCount, Seq.empty, prev.constraints)
    commitStaged(name, commit, dest)
  }

  /** MERGE INTO this table: upsert `updates` keyed by `keys` — matched rows
    * replaced, unmatched inserted (delete-marked or not — Delta parity),
    * matches satisfying `deleteWhen` dropped
    * (semantics in [[graft.ops.Merge.upsertPlan]]) — committed as a new
    * version, so time travel still sees the pre-merge table. The incremental
    * lakehouse write path Delta MERGE provides; rewrite granularity is the
    * whole table here (our log tracks dirs, not files — documented trade). */
  def merge(name: String, updates: DataFrame, keys: Seq[String],
            deleteWhen: Option[org.apache.spark.sql.Column] = None): Commit = {
    val prev = readCommit(name, latestVersion(name).get)
    val v = prev.version + 1
    val dest = stageDataDir(name, v)
    val merged = graft.ops.Merge.upsertPlan(read(name), updates, keys, deleteWhen)
    val writer = merged.write.mode("overwrite")
    (if (prev.partitionBy.nonEmpty) writer.partitionBy(prev.partitionBy: _*) else writer)
      .parquet(dest.toString)
    val written = spark.read.parquet(dest.toString).count()
    val commit = Commit(v, "merge", Seq(dest.toString), prev.schemaJson,
      prev.partitionBy, written, Seq.empty, prev.constraints)
    commitStaged(name, commit, dest)
  }

  /** Z-order maintenance: rewrite the table along the Morton curve over
    * `zCols` (see [[ZOrder]]) as a new commit. Like [[compact]] this changes
    * layout only; unlike compact, every output file covers a tight range in
    * ALL `zCols`, so multi-dimensional predicates prune most files via
    * parquet min/max footers. */
  def zorder(name: String, zCols: Seq[String], targetFiles: Int = 8): Commit = {
    val prev = readCommit(name, latestVersion(name).get)
    val v = prev.version + 1
    val dest = stageDataDir(name, v)
    ZOrder.layout(read(name), zCols, targetFiles)
      .write.mode("overwrite").parquet(dest.toString)
    val commit = Commit(v, "zorder", Seq(dest.toString), prev.schemaJson,
      prev.partitionBy, prev.rowCount, Seq.empty, prev.constraints)
    commitStaged(name, commit, dest)
  }

  /** Roll the table back to `version`'s contents as a NEW commit (Delta
    * RESTORE): the restored commit re-references the old version's data
    * dirs — zero data copied, instant at any scale — and history keeps the
    * bad versions visible for forensics. Restored dirs must still exist
    * (not vacuumed). */
  def restore(name: String, version: Long): Commit = {
    require(committedVersions(name).contains(version),
      s"no committed version v$version for $name (vacuumed or never existed)")
    val target = readCommit(name, version)
    val prev = readCommit(name, latestVersion(name).get)
    require(target.dirs.forall(d => Files.isDirectory(Paths.get(d))),
      s"cannot restore $name to v$version: data dirs were vacuumed")
    val commit = Commit(prev.version + 1, "restore", target.dirs,
      target.schemaJson, target.partitionBy, target.rowCount,
      target.deletes, target.constraints)
    writeCommit(name, commit)
    commit
  }

  /** Partition-layout evolution: rewrite the current contents under a NEW
    * `partitionBy` column set as one commit (mode "repartition"). The
    * Iceberg-style answer to "we picked the wrong partition column at
    * design time": readers keep resolving through the log (old versions
    * stay time-travelable in their old layout), and subsequent appends
    * adopt the new layout automatically since append re-reads the latest
    * commit's partitionBy. Data is unchanged — only directory layout, and
    * with it which predicates prune at the scan. */
  def repartitionTable(name: String, newPartitionBy: Seq[String]): Commit = {
    val current = read(name)
    val prev = readCommit(name, latestVersion(name).get)
    val v = prev.version + 1
    val dest = stageDataDir(name, v)
    val writer = current.write.mode("overwrite")
    (if (newPartitionBy.nonEmpty) writer.partitionBy(newPartitionBy: _*) else writer)
      .parquet(dest.toString)
    val commit = Commit(v, "repartition", Seq(dest.toString), prev.schemaJson,
      newPartitionBy, prev.rowCount, Seq.empty, prev.constraints)
    commitStaged(name, commit, dest)
  }

  /** Delete data directories no committed version <= the latest references
    * anymore beyond the newest `keepVersions` commits, and drop the pruned
    * log entries. Time travel further back stops working — the documented
    * trade, same as Delta VACUUM.
    *
    * Concurrent-writer safety (the Delta retention-window rule): an
    * unreferenced dir may be a RACING writer's in-flight staging, not
    * garbage. Two guards: a dir whose version prefix is beyond the latest
    * commit is always kept (a writer stages at latest+1 before its commit
    * is decided), and anything else unreferenced must be older than
    * `retentionMs`. `retentionMs = 0` reclaims immediately and is only safe
    * under the single-writer assumption. */
  def vacuum(name: String, keepVersions: Int = 1,
             retentionMs: Long = 3600000L): Unit = {
    val versions = committedVersions(name)
    if (versions.isEmpty) return
    val latest = versions.last
    val keep = versions.takeRight(keepVersions)
    val live = keep.flatMap(v => readCommit(name, v).dirs).toSet
    val dataRoot = tableDir(name).resolve("data")
    if (Files.isDirectory(dataRoot)) {
      val now = System.currentTimeMillis()
      Files.list(dataRoot).iterator().asScala.toSeq
        .filterNot(d => live.contains(d.toString))
        .filter { d =>
          // "vNNNNNNNN" or "vNNNNNNNN.<uuid>"; unparseable names are kept
          val ver = scala.util.Try(
            d.getFileName.toString.split('.').head.stripPrefix("v").toLong)
          val ageMs = now - Files.getLastModifiedTime(d).toMillis
          ver.toOption.exists(_ <= latest) && ageMs >= retentionMs
        }
        .foreach(deleteRecursively)
    }
    versions.dropRight(keepVersions).foreach { v =>
      Files.deleteIfExists(logDir(name).resolve(f"v$v%08d.json"))
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Incremental read (change feed for append-only tables): rows added by
    * commits AFTER `sinceVersion`. An overwrite/compact in the range makes
    * "new rows" ill-defined — the caller gets an error, as with Delta CDF
    * without delete tracking. */
  def readChanges(name: String, sinceVersion: Long): DataFrame = {
    val versions = committedVersions(name).filter(_ > sinceVersion)
    require(versions.nonEmpty, s"no commits after v$sinceVersion")
    val commits = versions.map(readCommit(name, _))
    require(commits.forall(_.mode == "append"),
      s"non-append commit in range (${commits.map(_.mode).mkString(",")}): " +
        "incremental semantics undefined")
    val baseline = readCommit(name, sinceVersion).dirs.toSet
    val newDirs = commits.last.dirs.filterNot(baseline)
    newDirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** Per-column table statistics, computed in ONE pass and persisted as a
    * sidecar next to the commit log (`stats/v%08d.json`) — the file-skipping
    * and join-planning input a lakehouse keeps per snapshot. min/max are
    * stringified (schema-agnostic); ndv is HLL-approximate (exact ndv would
    * be a full shuffle per column). Re-running overwrites the sidecar for
    * that version. */
  def analyze(name: String): Map[String, (Long, Long, String, String)] = {
    val v = latestVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val df = read(name)
    import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit, max, min, sum}
    val cols = df.schema.fields.filter(_.dataType match {
      case _: StructType | _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }).map(_.name).toSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.map { c =>
      c -> ((Option(row.getAs[Any](s"${c}__nulls")).fold(0L)(_.asInstanceOf[Long]),
        row.getAs[Long](s"${c}__ndv"),
        String.valueOf(row.getAs[Any](s"${c}__min")),
        String.valueOf(row.getAs[Any](s"${c}__max"))))
    }.toMap
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("version" -> v) ~ ("rows" -> row.getAs[Long]("__rows")) ~
        ("columns" -> stats.map { case (c, (nulls, ndv, mn, mx)) =>
          c -> (("nulls" -> nulls) ~ ("ndv" -> ndv) ~
            ("min" -> mn) ~ ("max" -> mx))
        })))
    val sd = tableDir(name).resolve("stats")
    Files.createDirectories(sd)
    Files.write(sd.resolve(f"v$v%08d.json"), json.getBytes("UTF-8"))
    stats
  }

  /** Read back the stats sidecar written by [[analyze]] for a version
    * (latest by default). Empty if never analyzed. */
  def readStats(name: String, asOfVersion: Option[Long] = None)
      : Map[String, (Long, Long, String, String)] = {
    val v = asOfVersion.orElse(latestVersion(name)).getOrElse(return Map.empty)
    val p = tableDir(name).resolve("stats").resolve(f"v$v%08d.json")
    if (!Files.exists(p)) return Map.empty
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val jv = JsonMethods.parse(new String(Files.readAllBytes(p), "UTF-8"))
    (jv \ "columns").asInstanceOf[JObject].obj.map { case (c, s) =>
      c -> (((s \ "nulls").extract[Long], (s \ "ndv").extract[Long],
        (s \ "min").extract[String], (s \ "max").extract[String]))
    }.toMap
  }

  /** Build a bloom-filter point-lookup index over `column` for the current
    * version (sidecar `bloom/v%08d.<col>.bf`). Spark's distributed
    * `stat.bloomFilter` merges per-partition filters — one pass, no
    * shuffle of values. Size `expectedItems` to the column's cardinality;
    * the filter is a few MB even at 1e8 items and 1% fpp. */
  def buildBloomIndex(name: String, column: String,
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.01): Unit = {
    val v = latestVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val bf = read(name).stat.bloomFilter(column, expectedItems, fpp)
    val bd = tableDir(name).resolve("bloom")
    Files.createDirectories(bd)
    val out = Files.newOutputStream(bd.resolve(f"v$v%08d.$column.bf"))
    try bf.writeTo(out) finally out.close()
  }

  /** Point read through the bloom index: a definite miss returns an empty
    * frame with ZERO file scans (the index answers from its sidecar); a
    * maybe-hit falls through to the pushed-down filter scan. False
    * positives only cost the scan, never correctness. */
  def readPoint(name: String, column: String, value: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = latestVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val p = tableDir(name).resolve("bloom").resolve(f"v$v%08d.$column.bf")
    val mightContain =
      if (!Files.exists(p)) true
      else {
        val in = Files.newInputStream(p)
        try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
          .mightContain(value)
        finally in.close()
      }
    if (!mightContain)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        read(name).schema)
    else read(name).filter(col(column) === lit(value))
  }

  /** Range-filtered read that consults the [[analyze]] sidecar FIRST: when
    * the requested `[lo, hi]` range is disjoint from the column's committed
    * min/max, return an empty frame without ever touching the data files —
    * snapshot-level skipping, one tier above parquet's row-group pruning
    * (which still costs a footer read per file; at 100 TB that is millions
    * of footer fetches). Falls through to a normal pushed-down filter scan
    * when stats are missing or the ranges overlap. */
  def readRange(name: String, column: String, lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val field = read(name).schema.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"no column $column in $name"))
    require(field.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"range read needs a numeric column, $column is ${field.dataType}")
    val pred = col(column) >= lo && col(column) <= hi
    readStats(name).get(column) match {
      case Some((_, _, mn, mx)) =>
        // an all-null column stringifies min/max as "null" — no bounds to
        // prove disjointness with, fall through to the filter scan
        val disjoint = mn != "null" && mx != "null" &&
          (hi < mn.toDouble || lo > mx.toDouble)
        if (disjoint)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            read(name).schema)
        else read(name).filter(pred)
      case None => read(name).filter(pred)
    }
  }

  /** The reference's persistence round-trip validation (NB 01 cell 22):
    * table dir present, log present, readback count matches the committed
    * count. Returns (ok, detail). */
  def validate(name: String): (Boolean, String) = {
    if (!Files.isDirectory(tableDir(name))) return (false, s"missing dir: ${tableDir(name)}")
    if (!exists(name)) return (false, s"missing/empty log: ${logDir(name)}")
    val c = readCommit(name, latestVersion(name).get)
    val n = read(name).count()
    if (n == c.rowCount) (true, s"ok: v${c.version}, $n rows")
    else (false, s"readback count $n != committed ${c.rowCount}")
  }
}
