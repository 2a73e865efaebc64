package graft.icelite

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import graft.core.Tile

/** icelite — an Iceberg-SHAPED snapshot/manifest layer over Parquet, built
  * in-repo because no Iceberg jar ships in the sandbox (SURVEY.md §7.2).
  * Public Iceberg concepts reproduced: versioned metadata json with a
  * current-snapshot pointer (atomic rename commit), manifests listing data
  * files with cell-id min/max stats for scan pruning, and per-partition
  * LINEAGE rows enabling checkpoint resume: a killed ingest job re-run on
  * the same staging area skips every bucket whose lineage row committed.
  *
  * Layout:
  *   table/metadata/v{N}.json        versioned metadata; last N wins
  *   table/manifests/m-{snap}.json   data files + stats of one snapshot
  *   table/lineage/{snap}/b-{i}.json staged per-bucket lineage (the
  *                                   checkpoint; written BEFORE the final
  *                                   metadata commit)
  *   table/data/{snap}/b-{i}/        one parquet dir per bucket
  */
object IceLite {

  final case class Lineage(bucket: Int, rows: Long, checksum: Long)
  final case class DataFileEntry(path: String, bucket: Int, rows: Long,
      minCell: Long, maxCell: Long)

  private def mkdirs(p: Path): Unit = { Files.createDirectories(p); () }

  /** Bounded wait for an [[org.apache.spark.sql.Observation]]'s metrics
    * (they are delivered on the async listener bus just after the
    * observed action returns); empty map on timeout so callers can fall
    * back to a separate aggregate pass instead of hanging. */
  private def awaitMetrics(
      obs: org.apache.spark.sql.Observation): Map[String, Any] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t0 = System.nanoTime()
    val r: Map[String, Any] =
      try Await.result(Future(obs.get), 10.seconds)
      catch { case _: java.util.concurrent.TimeoutException => Map.empty }
    if (sys.env.contains("SPARK_GRAFT_OBS_DEBUG"))
      System.err.println(f"[obs-wait] ${(System.nanoTime()-t0)/1e6}%.1f ms")
    r
  }

  private def q(s: String) = "\"" + s + "\""

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The physical Tile schema, pinned so snapshot reads never pay a
    * schema-inference footer job (every [[read]] call previously launched
    * one Spark job just to sniff the first file's footer). */
  private val tileSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Tile].schema

  /** StructType from a declared (name, sqlType) column list — lets reads
    * pass an explicit schema (no inference job, no mergeSchema
    * all-footers job); parquet null-fills declared columns a file
    * predates, which is exactly what the select/cast wrapper emulated. */
  private def structOf(cols: Seq[(String, String)])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
    })

  /** Highest committed metadata version, or 0. */
  def currentVersion(table: String): Int = {
    val md = Paths.get(table, "metadata")
    if (!Files.exists(md)) 0
    else listDir(md).foldLeft(0) { (best, p) =>
      val n = p.getFileName.toString
      if (n.startsWith("v") && n.endsWith(".json"))
        math.max(best, n.stripPrefix("v").stripSuffix(".json").toInt)
      else best
    }
  }

  def currentSnapshot(table: String): Option[Long] = {
    val v = currentVersion(table)
    if (v == 0) None
    else {
      val s = Files.readString(Paths.get(table, "metadata", s"v$v.json"))
      "\"current_snapshot\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }
  }

  /** Buckets already checkpointed for a snapshot attempt (resume set). */
  def committedBuckets(table: String, snap: Long): Set[Int] = {
    val dir = Paths.get(table, "lineage", snap.toString)
    if (!Files.exists(dir)) Set.empty
    else listDir(dir).iterator.map(_.getFileName.toString)
      .filter(n => n.startsWith("b-") && n.endsWith(".json"))
      .map(_.stripPrefix("b-").stripSuffix(".json").toInt).toSet
  }

  /** Resumable ingest: ONE dynamic-partition write of every
    * not-yet-committed bucket, ONE read-back aggregation for lineage
    * checksums + manifest stats, then per-bucket lineage rows committed
    * atomically in bucket order; already-checkpointed buckets are SKIPPED
    * on re-run (the kill/resume contract — a killed job re-run on the same
    * table redoes exactly the buckets whose lineage row is missing).
    * `failAtBucket` injects a crash between lineage commits for tests.
    * Returns the snapshot id once ALL buckets committed + metadata flipped.
    *
    * Scale shape: 2 jobs total regardless of bucket count (the round-1
    * version ran 2 jobs PER bucket over a cached full dataset — N
    * sequential passes). Bucketing is on the Z-order cell id's high bits,
    * so each bucket is a contiguous cell range — manifest min/max stats
    * stay tight and reads prune by range. */
  def commitResumable(spark: SparkSession, tiles: Dataset[Tile], table: String,
      buckets: Int, snap: Long, failAtBucket: Option[Int] = None,
      rowsCommitted: Option[LongAccumulator] = None,
      stageRef: Option[String] = None): Long =
    commitResumableDf(spark, tiles.toDF(), table, buckets, snap,
      failAtBucket, rowsCommitted, stageRef)

  /** DataFrame form of [[commitResumable]] — the schema-preserving write
    * path: any column set with a `cellId` key and a `payload` array
    * commits as-is (evolved columns included), and the declared schema
    * records exactly the DataFrame's columns. [[compact]] MUST use this
    * form over [[readDf]]: the typed Dataset[Tile] read would silently
    * strip evolved columns from both the data files and the recorded
    * schema. */
  def commitResumableDf(spark: SparkSession, rows: DataFrame, table: String,
      buckets: Int, snap: Long, failAtBucket: Option[Int] = None,
      rowsCommitted: Option[LongAccumulator] = None,
      stageRef: Option[String] = None): Long = {
    import spark.implicits._
    require(rows.columns.contains("cellId") && rows.columns.contains("payload"),
      "commitResumableDf: rows must carry cellId and payload columns")
    // NOT persisted: the commit's three passes (range agg, write, stats)
    // recompute the input, which measures FASTER than paying the
    // InMemoryRelation columnar cache build for typical commit inputs
    // (generated tiles / just-read parquet); callers with an expensive
    // upstream pipeline persist at their own level
    val tiles = rows
    mkdirs(Paths.get(table, "metadata"))
    mkdirs(Paths.get(table, "manifests"))
    mkdirs(Paths.get(table, "lineage", snap.toString))

    val done = committedBuckets(table, snap)
    // range-bucket on the Z-order id so each bucket is a CONTIGUOUS cell
    // range -> manifest min/max stats stay tight and reads prune by range
    spark.sparkContext.setJobDescription(s"icelite commit $table@$snap range-agg")
    val zr = tiles.agg(min($"cellId"), max($"cellId")).collect()(0)
    val (zlo, zhi) =
      if (zr.isNullAt(0)) (0L, 0L) else (zr.getLong(0), zr.getLong(1))
    val span = math.max(1L, zhi - zlo + 1)
    val bucketed = tiles
      .withColumn("bucket",
        least(lit(buckets - 1),
          (($"cellId" - lit(zlo)) * lit(buckets.toLong) / lit(span)).cast("int")))

    val stageRoot = s"$table/data/$snap"
    val todo = (0 until buckets).filterNot(done.contains)
    // per-bucket rows, order-independent checksum, and cell min/max
    // (lineage + manifest). FRESH-COMMIT FAST PATH: the stats ride the
    // write job itself as observed metrics (Observation + 4 conditional
    // aggregates per bucket) — one job per commit instead of write +
    // stats-agg, with values identical by definition (same frame the
    // write consumed). The checksum term stays a JVM udf (Long
    // wraparound; the SQL expression would throw under ANSI overflow on
    // high Z ids). Resumed commits (stats must also cover already-done
    // buckets), accumulator-instrumented commits, and wide layouts
    // (> 64 buckets — 4 aggregates per bucket stops being a sane plan;
    // production tables that wide take the one extra aggregate pass)
    // use the separate codegen'd partial/final aggregate below.
    val useObserve = done.isEmpty && rowsCommitted.isEmpty &&
      buckets <= 64 && todo.nonEmpty
    val obs = org.apache.spark.sql.Observation(s"commit_${snap}_b$buckets")
    if (todo.nonEmpty) {
      val base = bucketed.filter($"bucket".isInCollection(todo))
      val toWrite =
        if (!useObserve) base
        else {
          val chkTerm = udf((cid: Long, n: Int) => cid * 31 + n)
          val chkv = chkTerm($"cellId", size($"payload"))
          val aggs = todo.flatMap { b =>
            val c = $"bucket" === lit(b)
            Seq(count(when(c, lit(1))).as(s"n$b"),
              expr(s"bit_xor(IF(bucket = $b, chk_term, NULL))").as(s"x$b"),
              min(when(c, $"cellId")).as(s"lo$b"),
              max(when(c, $"cellId")).as(s"hi$b"))
          }
          base.withColumn("chk_term", chkv)
            .observe(obs, aggs.head, aggs.tail: _*)
            .drop("chk_term")
        }
      // single write job: dynamic partition overwrite touches ONLY the
      // re-written buckets, leaving committed ones' files intact
      spark.sparkContext.setJobDescription(s"icelite commit $table@$snap write")
      toWrite.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(stageRoot)
    }

    def statsAgg(): Map[Int, (Int, Long, Long, Long, Long)] = bucketed
      .select($"bucket".cast("int"), $"cellId", size($"payload"))
      .as[(Int, Long, Int)]
      .map { case (b, cid, n) =>
        rowsCommitted.foreach(_.add(1L))
        (b, cid, cid * 31 + n)
      }
      .toDF("b", "cid", "chk")
      .groupBy($"b")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(chk)").as("chk"),
        min($"cid").as("lo"), max($"cid").as("hi"))
      .as[(Int, Long, Long, Long, Long)]
      .collect().map(s => s._1 -> s).toMap

    val stats: Map[Int, (Int, Long, Long, Long, Long)] =
      if (!useObserve) statsAgg()
      else {
        // observed metrics arrive on the listener thread just after the
        // write returns; bounded wait, with the aggregate pass as a
        // belt-and-braces fallback (never expected to fire)
        val m = awaitMetrics(obs)
        if (m.isEmpty) statsAgg()
        else todo.map { b =>
          def l(k: String) =
            Option(m(k)).map(_.asInstanceOf[Long]).getOrElse(0L)
          b -> ((b, m(s"n$b").asInstanceOf[Long], l(s"x$b"),
            l(s"lo$b"), l(s"hi$b")))
        }.toMap
      }

    (0 until buckets).foreach { b =>
      if (!done.contains(b)) {
        failAtBucket.filter(_ == b).foreach { _ =>
          throw new RuntimeException(s"injected failure before bucket $b")
        }
        val (rows, chk) = stats.get(b).map(s => (s._2, s._3)).getOrElse((0L, 0L))
        writeAtomic(Paths.get(table, "lineage", snap.toString, s"b-$b.json"),
          s"""{"bucket": $b, "rows": $rows, "checksum": $chk}""")
      }
    }

    // manifest: data files with cell min/max for pruning
    val entries = (0 until buckets).map { b =>
      val dir = s"$stageRoot/bucket=$b"
      val (n, lo, hi) = stats.get(b).map(s => (s._2, s._4, s._5))
        .getOrElse((0L, 0L, 0L))
      s"""{"path": ${q(dir)}, "bucket": $b, "rows": $n, "min_cell": $lo, "max_cell": $hi}"""
    }
    writeAtomic(Paths.get(table, "manifests", s"m-$snap.json"),
      entries.mkString("[", ",\n", "]"))

    spark.sparkContext.setJobDescription(null)
    stageRef match {
      case Some(name) =>
        // WRITE-AUDIT-PUBLISH staging: the snapshot's data, lineage and
        // manifest are all durable, but the current-snapshot pointer
        // does NOT move — readers of the table keep seeing the old
        // snapshot while auditors read the ref by name. `publish` flips
        // the pointer atomically after validation.
        mkdirs(Paths.get(table, "refs"))
        writeAtomic(Paths.get(table, "refs", s"$name.json"),
          s"""{"snap": $snap, "buckets": $buckets,
             | "schema": ${schemaJson(tiles)}}""".stripMargin)
      case None =>
        val v = currentVersion(table) + 1
        writeAtomic(Paths.get(table, "metadata", s"v$v.json"),
          s"""{"format": "icelite/1", "current_snapshot": $snap,
             | "manifest": ${q(s"$table/manifests/m-$snap.json")},
             | "buckets": $buckets,
             | "schema": ${schemaJson(tiles)}}""".stripMargin)
    }
    snap
  }

  /** Next free snapshot id: one past the highest MANIFEST on disk — not
    * current + 1, because after a [[rollback]] the abandoned head's ids
    * are still occupied (their manifests/data remain readable by pin)
    * and writing over them would destroy that history. Crashed-op debris
    * (lineage without a manifest) does not advance the id; the mutators'
    * clearUncommitted handles it at claim time. */
  def nextSnapshotId(table: String): Long = {
    val all = snapshots(table)
    if (all.isEmpty) 1L else all.max + 1
  }

  /** ROLLBACK — the Iceberg `rollback_to_snapshot` analog: one atomic
    * metadata commit points the table back at an EXISTING snapshot; no
    * data file, manifest or lineage row moves. The abandoned snapshots
    * stay readable by pin until [[expireSnapshots]] reaps them, and the
    * next write allocates ids past the abandoned head. */
  def rollback(table: String, snap: Long): Long = {
    require(Files.exists(Paths.get(table, "manifests", s"m-$snap.json")),
      s"rollback: snapshot $snap has no manifest in $table")
    val v = currentVersion(table) + 1
    val schemaPart = tableSchema(table).map { cols =>
      ",\n \"schema\": " + cols.map { case (n, t) =>
        s"""{"name": ${q(n)}, "type": ${q(t)}}"""
      }.mkString("[", ", ", "]")
    }.getOrElse("")
    val buckets = manifestEntries(table, snap).length
    writeAtomic(Paths.get(table, "metadata", s"v$v.json"),
      s"""{"format": "icelite/1", "current_snapshot": $snap,
         | "manifest": ${q(s"$table/manifests/m-$snap.json")},
         | "buckets": $buckets$schemaPart}""".stripMargin)
    snap
  }

  /** Metadata TABLE `files` — the Iceberg `table$files` analog: one row
    * per data file of a snapshot straight from the manifest (no parquet
    * footer is opened): (snapshot, bucket, file_rows, min_cell,
    * max_cell, path). */
  def filesDf(spark: SparkSession, table: String, snap: Long): DataFrame = {
    import spark.implicits._
    manifestEntries(table, snap)
      .map(e => (snap, e.bucket, e.rows, e.minCell, e.maxCell, e.path))
      .toDF("snapshot", "bucket", "file_rows", "min_cell", "max_cell", "path")
  }

  /** Metadata TABLE `snapshots` — one row per snapshot on disk:
    * (snapshot, n_files, n_rows, is_current). */
  def snapshotsDf(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val cur = currentSnapshot(table)
    snapshots(table).map { s =>
      val es = manifestEntries(table, s)
      (s, es.count(_.rows > 0).toLong, es.map(_.rows).sum, cur.contains(s))
    }.toDF("snapshot", "n_files", "n_rows", "is_current")
  }

  /** Snapshots pinned by staged (unpublished) WAP refs. */
  def stagedRefs(table: String): Seq[Long] = {
    val dir = Paths.get(table, "refs")
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir).flatMap { p =>
      "\"snap\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(Files.readString(p)).map(_.group(1).toLong)
    }
  }

  /** Snapshot a named staging ref points at (write-audit-publish). */
  def refSnapshot(table: String, name: String): Option[Long] = {
    val p = Paths.get(table, "refs", s"$name.json")
    if (!Files.exists(p)) None
    else "\"snap\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(Files.readString(p)).map(_.group(1).toLong)
  }

  /** PUBLISH a staged ref — the write-audit-publish pointer flip: after
    * the audit validates the staged snapshot (read it via
    * [[refSnapshot]] + [[read]]/[[readDf]]), one atomic metadata commit
    * makes it the table's current snapshot; un-published stages never
    * become visible to table readers. Single-writer assumption as
    * everywhere in icelite: a concurrent upsert/delete/compact that
    * claimed the same snapshot id clears staged debris (the op-marker
    * rule), after which publish fails loudly here on the missing
    * manifest rather than publishing a half-cleared stage. */
  def publish(table: String, name: String): Long = {
    val p = Paths.get(table, "refs", s"$name.json")
    require(Files.exists(p), s"publish: no staged ref `$name` in $table")
    val s = Files.readString(p)
    val snap = "\"snap\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"publish: ref `$name` in $table carries no snap"))
    val buckets = "\"buckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(0)
    val schema = "\"schema\"\\s*:\\s*(\\[.*\\])".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("[]")
    require(Files.exists(Paths.get(table, "manifests", s"m-$snap.json")),
      s"publish: staged snapshot $snap of ref `$name` has no manifest " +
        "(cleared by a concurrent op?) — refusing to publish")
    val v = currentVersion(table) + 1
    writeAtomic(Paths.get(table, "metadata", s"v$v.json"),
      s"""{"format": "icelite/1", "current_snapshot": $snap,
         | "manifest": ${q(s"$table/manifests/m-$snap.json")},
         | "buckets": $buckets,
         | "schema": $schema}""".stripMargin)
    Files.deleteIfExists(p)
    snap
  }

  /** ABANDON a staged WAP ref — the audit-REJECT arm of
    * write-audit-publish ([[publish]] is the accept arm): the ref is
    * dropped and the staged snapshot's artifacts (manifest, lineage,
    * and every data directory no OTHER manifest references) are
    * deleted, so a failed audit leaves no debris and no pin. Refuses
    * to abandon a published snapshot. Returns the number of data
    * directories deleted (0 when the ref does not exist). */
  def abandonStaged(table: String, name: String): Int = {
    val p = Paths.get(table, "refs", s"$name.json")
    if (!Files.exists(p)) return 0
    val snap = "\"snap\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(Files.readString(p)).map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"abandonStaged: ref `$name` in $table carries no snap"))
    require(!currentSnapshot(table).contains(snap),
      s"abandonStaged: snapshot $snap of ref `$name` is PUBLISHED — " +
        "use expireSnapshots for retention, not abandon")
    Files.deleteIfExists(p)
    val live = snapshots(table).filterNot(_ == snap)
      .flatMap(s => manifestEntries(table, s).map(_.path))
      .map(Paths.get(_).normalize.toString).toSet
    var deleted = 0
    manifestEntries(table, snap).foreach { e =>
      val d = Paths.get(e.path).normalize
      if (!live.contains(d.toString) && Files.exists(d)) {
        deleteRecursively(d); deleted += 1
      }
    }
    Files.deleteIfExists(Paths.get(table, "manifests", s"m-$snap.json"))
    val lin = Paths.get(table, "lineage", snap.toString)
    if (Files.exists(lin)) deleteRecursively(lin)
    deleted
  }

  /** JSON schema record of a DataFrame (partition col `bucket` excluded). */
  private def schemaJson(df: DataFrame): String =
    df.schema.fields.filterNot(_.name == "bucket").map { f =>
      s"""{"name": ${q(f.name)}, "type": ${q(f.dataType.sql)}}"""
    }.mkString("[", ", ", "]")

  /** Declared table schema (column name, Spark SQL type) from the current
    * metadata version; None for tables written before schema tracking. */
  def tableSchema(table: String): Option[Seq[(String, String)]] = {
    val v = currentVersion(table)
    if (v == 0) None
    else {
      val s = Files.readString(Paths.get(table, "metadata", s"v$v.json"))
      // whitespace-tolerant parse; and if the metadata DECLARES a schema
      // that yields no columns, fail loudly instead of silently degrading
      // readDf to the observed parquet schema (ADVICE r4 #4)
      val re = """\{\s*"name"\s*:\s*"([^"]+)"\s*,\s*"type"\s*:\s*"([^"]+)"\s*\}""".r
      val cols = re.findAllMatchIn(s).map(m => (m.group(1), m.group(2))).toSeq
      if (cols.nonEmpty) Some(cols)
      else if (s.contains("\"schema\""))
        throw new IllegalStateException(
          s"tableSchema: $table metadata v$v declares a schema but no " +
            "columns parsed — metadata format drift; refusing to degrade " +
            "to the observed parquet schema")
      else None
    }
  }

  /** SCHEMA EVOLUTION (add column) — Iceberg's metadata-ONLY evolution:
    * a new metadata version extends the declared schema and is committed
    * by the same atomic rename; NO data file, manifest or lineage row is
    * touched and the current snapshot does not change. Existing rows
    * surface the new column as NULL (see [[readDf]]) until a later
    * commit/upsert writes values for them. Like Iceberg, reads always
    * present the table's CURRENT schema — time-traveling to an old
    * snapshot replays old DATA under the current column set. */
  def evolveAddColumn(table: String, name: String, sqlType: String): Int = {
    val v = currentVersion(table)
    require(v > 0, s"evolveAddColumn: no committed metadata in $table")
    val cur = tableSchema(table).getOrElse(throw new IllegalStateException(
      s"evolveAddColumn: $table has no recorded schema (pre-evolution table)"))
    require(!cur.exists(_._1 == name),
      s"evolveAddColumn: column `$name` already exists in $table")
    val old = Files.readString(Paths.get(table, "metadata", s"v$v.json"))
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"evolveAddColumn: no snapshot in $table"))
    val manifest = "\"manifest\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(old)
      .map(_.group(1)).getOrElse(s"$table/manifests/m-$snap.json")
    val buckets = "\"buckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(old)
      .map(_.group(1).toInt).getOrElse(0)
    val schema = (cur :+ (name, sqlType)).map { case (n, t) =>
      s"""{"name": ${q(n)}, "type": ${q(t)}}"""
    }.mkString("[", ", ", "]")
    writeAtomic(Paths.get(table, "metadata", s"v${v + 1}.json"),
      s"""{"format": "icelite/1", "current_snapshot": $snap,
         | "manifest": ${q(manifest)},
         | "buckets": $buckets,
         | "schema": $schema}""".stripMargin)
    v + 1
  }

  /** Snapshot-pinned DataFrame read under the DECLARED schema: data
    * files written before a column existed surface it as NULL (parquet
    * mergeSchema union + explicit null-fill) — Iceberg's read-time
    * schema resolution. Tables that predate schema tracking fall back
    * to the observed parquet schema. Same manifest min/max pruning as
    * [[read]]. */
  def readDf(spark: SparkSession, table: String, snap: Long,
      cellRange: Option[(Long, Long)] = None): DataFrame = {
    val files = manifestEntries(table, snap).flatMap { e =>
      if (e.rows == 0) None
      else cellRange match {
        case Some((a, b)) if e.maxCell < a || e.minCell > b => None // pruned
        case _ => Some(e.path)
      }
    }
    val declared = tableSchema(table)
    if (files.isEmpty) {
      // all files pruned/empty: the declared schema still shapes the
      // result; a pre-schema-tracking table derives it from the manifest
      // files themselves (limit(0) — footers only, no data) so pruned
      // and unpruned reads stay union-compatible
      val cols = declared.getOrElse {
        val allFiles = manifestEntries(table, snap).filter(_.rows > 0).map(_.path)
        if (allFiles.isEmpty) Seq("cellId" -> "BIGINT")
        else spark.read.option("mergeSchema", "true").parquet(allFiles: _*)
          .schema.fields.toSeq.map(f => (f.name, f.dataType.sql))
      }
      spark.range(0).select(cols.map { case (n, t) =>
        lit(null).cast(t).as(n) }: _*)
    } else {
      declared match {
        case Some(cols) =>
          // explicit declared schema: no inference or mergeSchema footer
          // jobs; parquet null-fills columns a file predates — exactly
          // what the former select/cast wrapper emulated
          spark.read.schema(structOf(cols)).parquet(files: _*)
        case None =>
          spark.read.option("mergeSchema", "true").parquet(files: _*)
      }
    }
  }

  /** Incremental CHANGELOG read between two committed snapshots — the
    * Iceberg incremental-scan / Delta Change-Data-Feed analog: every row
    * inserted, updated or deleted between `fromSnap` (exclusive state)
    * and `toSnap` (inclusive state), under the declared schema plus a
    * `_change_type` column (`insert` / `delete` / `update_preimage` /
    * `update_postimage` — updates emit BOTH images).
    *
    * Scale shape (the whole point at 100 TB): pruning is METADATA-ONLY —
    * a data file carried between the manifests BY REFERENCE (identical
    * path) cannot contain a change and is never opened; only rewritten /
    * added / dropped files are read, so a small COW upsert or delete
    * diffs just its touched buckets. The row-level diff is then ONE
    * full-outer equi-join on `cellId` over those changed files, with
    * content equality (null-safe, Spark NaN==NaN array semantics) as the
    * correctness backstop: rows a rewrite carried unchanged — and an
    * entire [[compact]], which rewrites every path without changing any
    * content — correctly collapse to an EMPTY changelog. */
  def readChanges(spark: SparkSession, table: String,
      fromSnap: Long, toSnap: Long): DataFrame = {
    require(fromSnap <= toSnap,
      s"readChanges: fromSnap $fromSnap must be <= toSnap $toSnap")
    val fromE = manifestEntries(table, fromSnap)
    val toE = manifestEntries(table, toSnap)
    val oldPaths = fromE.map(_.path).toSet
    val newPaths = toE.map(_.path).toSet
    val addedFiles =
      toE.filter(e => e.rows > 0 && !oldPaths.contains(e.path)).map(_.path)
    val droppedFiles =
      fromE.filter(e => e.rows > 0 && !newPaths.contains(e.path)).map(_.path)
    // both sides MUST project the same columns or the image structs
    // won't compare; a pre-schema-tracking table derives the union
    // schema from the changed files themselves (footers only)
    val declared = tableSchema(table).orElse {
      val any = addedFiles ++ droppedFiles
      if (any.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(any: _*)
        .schema.fields.toSeq.map(f => (f.name, f.dataType.sql)))
    }
    val nSide = readFilesDeclared(spark, addedFiles, declared)
    val oSide = readFilesDeclared(spark, droppedFiles, declared)
    val cols = nSide.columns.toSeq
    val n = nSide.select(col("cellId").as("_k"),
      struct(cols.map(col): _*).as("_img"))
    val o = oSide.select(col("cellId").as("_k"),
      struct(cols.map(col): _*).as("_img"))
    val j = n.as("n").join(o.as("o"), col("n._k") === col("o._k"), "full_outer")
    // one pass over the join: type each key, explode updates into the
    // pre/post image pair, drop content-equal carries
    val typed = j.select(col("n._img").as("_n"), col("o._img").as("_o"),
        when(col("o._k").isNull, "insert")
          .when(col("n._k").isNull, "delete")
          .when(!(col("n._img") <=> col("o._img")), "update")
          .as("_ct"))
      .filter(col("_ct").isNotNull)
    typed.select(explode(
        when(col("_ct") === "insert",
          array(struct(col("_n").as("img"), lit("insert").as("ct"))))
        .when(col("_ct") === "delete",
          array(struct(col("_o").as("img"), lit("delete").as("ct"))))
        .otherwise(array(
          struct(col("_n").as("img"), lit("update_postimage").as("ct")),
          struct(col("_o").as("img"), lit("update_preimage").as("ct"))))
      ).as("_e"))
      .select(col("_e.img.*"), col("_e.ct").as("_change_type"))
  }

  /** Changed-file sets between two snapshots' manifests (old-side paths,
    * new-side paths) — [[readChanges]]'s metadata-only pruning, exposed
    * so tests can assert reference-carried files are never read. */
  private[icelite] def changedFiles(table: String, fromSnap: Long,
      toSnap: Long): (Seq[String], Seq[String]) = {
    val fromE = manifestEntries(table, fromSnap)
    val toE = manifestEntries(table, toSnap)
    val oldPaths = fromE.map(_.path).toSet
    val newPaths = toE.map(_.path).toSet
    (fromE.filter(e => e.rows > 0 && !newPaths.contains(e.path)).map(_.path),
      toE.filter(e => e.rows > 0 && !oldPaths.contains(e.path)).map(_.path))
  }

  /** Read an explicit data-file list under a declared (name, type) schema
    * — absent columns null-fill, an empty file list yields an empty frame
    * of exactly the declared columns. */
  private def readFilesDeclared(spark: SparkSession, files: Seq[String],
      declared: Option[Seq[(String, String)]]): DataFrame = {
    if (files.isEmpty) {
      val cols = declared.getOrElse(Seq("cellId" -> "BIGINT"))
      spark.range(0).select(cols.map { case (nm, t) =>
        lit(null).cast(t).as(nm) }: _*)
    } else declared match {
      case Some(cols) =>
        // explicit schema — no inference/mergeSchema jobs (see readDf)
        spark.read.schema(structOf(cols)).parquet(files: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(files: _*)
    }
  }

  /** Parsed data-file list of a snapshot's manifest. */
  def manifestEntries(table: String, snap: Long): Seq[DataFileEntry] = {
    val manifest = Files.readString(Paths.get(table, "manifests", s"m-$snap.json"))
    val entryRe =
      """\{"path": "([^"]+)", "bucket": (\d+), "rows": (\d+), "min_cell": (-?\d+), "max_cell": (-?\d+)\}""".r
    entryRe.findAllMatchIn(manifest).map { m =>
      DataFileEntry(m.group(1), m.group(2).toInt, m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong)
    }.toSeq
  }

  /** Metadata-only row count (the Iceberg count(*) pushdown analog):
    * the snapshot's total rows straight from the manifest — no parquet
    * footer or data page is ever opened, O(manifest) at any table size. */
  def countRows(table: String, snap: Long): Long =
    manifestEntries(table, snap).map(_.rows).sum

  /** Live data files (rows > 0) in a snapshot — metadata-only. */
  def dataFileCount(table: String, snap: Long): Int =
    manifestEntries(table, snap).count(_.rows > 0)

  /** The scan-planning decision for a cell range, exposed for audit:
    * exactly the manifest entries a ranged [[read]] will open (min/max
    * overlap over live files). q30 puts this plan under the hash gate. */
  def planFiles(table: String, snap: Long, lo: Long,
      hi: Long): Seq[DataFileEntry] =
    manifestEntries(table, snap)
      .filter(e => e.rows > 0 && e.maxCell >= lo && e.minCell <= hi)

  /** Snapshot-pinned read; `cellRange` prunes whole data files via manifest
    * min/max before any parquet footer is opened. */
  def read(spark: SparkSession, table: String, snap: Long,
      cellRange: Option[(Long, Long)] = None): Dataset[Tile] = {
    import spark.implicits._
    val files = manifestEntries(table, snap).flatMap { e =>
      if (e.rows == 0) None
      else cellRange match {
        case Some((a, b)) if e.maxCell < a || e.minCell > b => None // pruned
        case _ => Some(e.path)
      }
    }
    if (files.isEmpty) spark.emptyDataset[Tile]
    // pinned Tile schema: no schema-inference footer job per read; files
    // carrying evolved extra columns simply don't surface them (same as
    // the untyped read + .as[Tile] projection)
    else spark.read.schema(tileSchema).parquet(files: _*).as[Tile]
  }

  /** Row-level UPSERT — the Iceberg MERGE INTO (copy-on-write) analog:
    * update rows REPLACE current rows with the same cellId; new cellIds
    * append. The copy-on-write unit is the DATA FILE, exactly Iceberg's
    * COW mode: each update key is range-assigned to its owning bucket (a
    * tiny broadcast range table built from the manifest; keys beyond
    * every range land in the edge bucket, whose range widens), and ONLY
    * the touched buckets are read back, LEFT ANTI-joined on cellId
    * against the update keys, merged with the updates and rewritten
    * under the NEW snapshot. Every untouched bucket enters the new
    * manifest BY REFERENCE — its parquet files are never opened, moved
    * or rewritten, and its lineage row is copied forward. Readers pinned
    * to the old snapshot are untouched; the current-snapshot pointer
    * flips atomically at the end (a crash mid-upsert leaves the table on
    * the old snapshot with orphaned staging files to GC). At 100 TB the
    * cost is proportional to the TOUCHED key ranges, not the table.
    * Caller contract: one row per cellId in `updates` (dedupe upstream).
    * Returns the new snapshot id. */
  def upsert(spark: SparkSession, table: String, updates: Dataset[Tile]): Long =
    upsertDf(spark, table, updates.toDF())

  /** DataFrame variant of [[upsert]] — the schema-evolution write path:
    * updates may carry columns added by [[evolveAddColumn]] after the
    * table's files were written. Touched buckets rewrite with the new
    * columns (survivors null-fill via unionByName allowMissingColumns);
    * untouched buckets still carry forward by reference, and [[readDf]]
    * null-fills them at read time. Requires a `cellId` key column. */
  def upsertDf(spark: SparkSession, table: String, updates: DataFrame): Long =
    cowMutate(spark, table, updates, isDelete = false)

  /** Row-level DELETE — the Iceberg `DELETE FROM ... WHERE key IN (keys)`
    * copy-on-write analog and [[upsertDf]]'s missing sibling: each delete
    * key is range-assigned to its owning bucket via the same broadcast
    * range table; ONLY the touched buckets are read back and rewritten
    * WITHOUT the deleted rows, every untouched bucket enters the new
    * manifest by reference, and a bucket deleted down to zero rows
    * records `rows: 0` (readers already skip empty entries). Old
    * snapshots still time-travel to the pre-delete rows. Keys that match
    * no row still rewrite their owning bucket (content-identical) — a
    * no-op delete of a missing key is safe, not an error. Cost is
    * proportional to the touched key ranges, not the table. */
  def deleteRows(spark: SparkSession, table: String, keys: DataFrame): Long =
    cowMutate(spark, table, keys.select("cellId"), isDelete = true)

  /** Range DELETE over the Z-order cell-id key — the retention /
    * partition-drop shape (`DELETE WHERE key BETWEEN lo AND hi`): a data
    * file whose manifest [minCell, maxCell] lies ENTIRELY inside the
    * range is dropped at the METADATA level — its rows-0 manifest entry
    * is written without the file ever being OPENED (old snapshots still
    * time-travel to it), so dropping a whole partition of a 100 TB table
    * is O(manifest), not O(data). Only files STRADDLING a range edge
    * COW-rewrite (read once, survivors outside the range kept); disjoint
    * files carry forward by reference. Returns the new snapshot. */
  def deleteRange(spark: SparkSession, table: String, lo: Long,
      hi: Long): Long = {
    import spark.implicits._
    require(lo <= hi, s"deleteRange: lo $lo must be <= hi $hi")
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"deleteRange: no committed snapshot in $table"))
    val newSnap = nextSnapshotId(table)
    clearUncommitted(table, newSnap)
    writeOpMarker(table, newSnap, "delete")
    val entries = manifestEntries(table, snap)
    require(entries.nonEmpty, s"deleteRange: empty manifest for $table@$snap")
    def overlaps(e: DataFileEntry) = e.rows > 0 && e.minCell <= hi && e.maxCell >= lo
    def fullIn(e: DataFileEntry) = e.rows > 0 && e.minCell >= lo && e.maxCell <= hi
    val straddle = entries.filter(e => overlaps(e) && !fullIn(e))
    val stageRoot = s"$table/data/$newSnap"
    val stats: Map[Int, (Int, Long, Long, Long, Long)] =
      if (straddle.isEmpty) Map.empty
      else {
        // re-derive the partition column from the ownership ranges, as in
        // the key-level COW path
        val owned = entries.filter(_.rows > 0).sortBy(_.minCell)
        val ranges = owned.zipWithIndex.map { case (e, i) =>
          val rl = if (i == 0) Long.MinValue else owned(i).minCell
          val rh = if (i == owned.length - 1) Long.MaxValue
                   else owned(i + 1).minCell - 1
          (e.bucket, rl, rh)
        }
        val rangeDf = spark.createDataset(ranges).toDF("bucket", "lo", "hi")
        val srcBase = tableSchema(table) match {
          case Some(cols) =>
            spark.read.schema(structOf(cols)).parquet(straddle.map(_.path): _*)
          case None => spark.read.option("mergeSchema", "true")
            .parquet(straddle.map(_.path): _*)
        }
        // persist the survivor frame: the write materializes it once and
        // the stats aggregation reads the cache (replaces the former
        // written-files read-back — deterministic write, same values)
        val surv = srcBase
          .join(broadcast(rangeDf), $"cellId" >= $"lo" && $"cellId" <= $"hi")
          .drop("lo", "hi")
          .filter($"cellId" < lit(lo) || $"cellId" > lit(hi))
          .localCheckpoint(false)
        surv.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(stageRoot)
        val st = surv
          .select($"bucket".cast("int"), $"cellId", size($"payload"))
          .as[(Int, Long, Int)]
          .map { case (b, cid, nn) => (b, cid, cid * 31 + nn) }
          .toDF("b", "cid", "chk")
          .groupBy($"b")
          .agg(count(lit(1)).as("rows"), expr("bit_xor(chk)").as("chk"),
            min($"cid").as("rl"), max($"cid").as("rh"))
          .as[(Int, Long, Long, Long, Long)]
          .collect().map(s => s._1 -> s).toMap
        surv.unpersist()
        st
      }
    val straddleBuckets = straddle.map(_.bucket).toSet
    mkdirs(Paths.get(table, "lineage", newSnap.toString))
    val newEntries = entries.map { e =>
      if (fullIn(e)) {
        // METADATA-ONLY drop: old path kept for time travel, rows 0
        writeAtomic(Paths.get(table, "lineage", newSnap.toString, s"b-${e.bucket}.json"),
          s"""{"bucket": ${e.bucket}, "rows": 0, "checksum": 0}""")
        s"""{"path": ${q(e.path)}, "bucket": ${e.bucket}, "rows": 0, "min_cell": 0, "max_cell": 0}"""
      } else if (straddleBuckets.contains(e.bucket)) {
        val (rows, chk, rl, rh) = stats.get(e.bucket)
          .map(s => (s._2, s._3, s._4, s._5)).getOrElse((0L, 0L, 0L, 0L))
        writeAtomic(Paths.get(table, "lineage", newSnap.toString, s"b-${e.bucket}.json"),
          s"""{"bucket": ${e.bucket}, "rows": $rows, "checksum": $chk}""")
        val dir = s"$stageRoot/bucket=${e.bucket}"
        s"""{"path": ${q(dir)}, "bucket": ${e.bucket}, "rows": $rows, "min_cell": $rl, "max_cell": $rh}"""
      } else {
        val oldLin = Paths.get(table, "lineage", snap.toString, s"b-${e.bucket}.json")
        if (Files.exists(oldLin))
          Files.copy(oldLin,
            Paths.get(table, "lineage", newSnap.toString, s"b-${e.bucket}.json"),
            StandardCopyOption.REPLACE_EXISTING)
        s"""{"path": ${q(e.path)}, "bucket": ${e.bucket}, "rows": ${e.rows}, "min_cell": ${e.minCell}, "max_cell": ${e.maxCell}}"""
      }
    }
    writeAtomic(Paths.get(table, "manifests", s"m-$newSnap.json"),
      newEntries.mkString("[", ",\n", "]"))
    val v = currentVersion(table) + 1
    // a pre-schema-tracking table keeps its metadata schema-LESS — an
    // empty "schema": [] would trip tableSchema's drift guard
    val schemaPart = tableSchema(table).map { cols =>
      ",\n \"schema\": " + cols.map { case (n, t) =>
        s"""{"name": ${q(n)}, "type": ${q(t)}}"""
      }.mkString("[", ", ", "]")
    }.getOrElse("")
    writeAtomic(Paths.get(table, "metadata", s"v$v.json"),
      s"""{"format": "icelite/1", "current_snapshot": $newSnap,
         | "manifest": ${q(s"$table/manifests/m-$newSnap.json")},
         | "buckets": ${entries.length}$schemaPart}""".stripMargin)
    newSnap
  }

  /** Shared copy-on-write mutation core of [[upsertDf]] (merge rows in)
    * and [[deleteRows]] (anti-join rows out): the two ops differ ONLY in
    * whether the incoming rows union back into the touched buckets'
    * survivors. */
  private def cowMutate(spark: SparkSession, table: String, updates: DataFrame,
      isDelete: Boolean): Long = {
    import spark.implicits._
    val op = if (isDelete) "delete" else "upsert"
    require(updates.columns.contains("cellId"),
      s"$op: rows must carry a cellId key column")
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"$op: no committed snapshot in $table"))
    val newSnap = nextSnapshotId(table)
    // upsert never resumes from partial state — any uncommitted debris
    // at newSnap (a previous crashed upsert, or a crashed compact's
    // staged buckets) would pollute the stageRoot read-back and the
    // dynamic-partition dirs; clear it and claim the id with a marker so
    // a LATER compact knows this lineage is not its own resume set
    clearUncommitted(table, newSnap)
    writeOpMarker(table, newSnap, op)
    val entries = manifestEntries(table, snap)
    require(entries.nonEmpty, s"$op: empty manifest for $table@$snap")
    val owned = entries.filter(_.rows > 0).sortBy(_.minCell)
    require(owned.nonEmpty, s"$op: no data files in $table@$snap")
    // ownership ranges: contiguous Z-ranges by construction; edges open
    val ranges = owned.zipWithIndex.map { case (e, i) =>
      val lo = if (i == 0) Long.MinValue else owned(i).minCell
      val hi = if (i == owned.length - 1) Long.MaxValue
               else owned(i + 1).minCell - 1
      (e.bucket, lo, hi)
    }
    val rangeDf = spark.createDataset(ranges).toDF("bucket", "lo", "hi")
    val updB = updates
      .join(broadcast(rangeDf), $"cellId" >= $"lo" && $"cellId" <= $"hi")
      .drop("lo", "hi").localCheckpoint(false)
    spark.sparkContext.setJobDescription(s"icelite $op $table@$newSnap touched-buckets")
    val touched = updB.select($"bucket").distinct().as[Int].collect().toSet
    if (touched.isEmpty) { updB.unpersist(); return snap } // no-op upsert
    val keys = updB.select($"cellId")
    val oldTouchedFiles = owned.filter(e => touched.contains(e.bucket)).map(_.path)
    // partition column `bucket` is not stored in the leaf files; survivors
    // re-derive it from the same range table (contiguous ranges guarantee
    // each row maps back to its own bucket)
    // mergeSchema: touched buckets may span SNAPSHOT EPOCHS with
    // different physical schemas (one already backfilled an evolved
    // column, another predates it) — without the union schema, parquet
    // would pick one file's schema arbitrarily and a previously
    // backfilled column could silently read as absent and be erased by
    // the rewrite
    val survivorsBase = tableSchema(table) match {
      case Some(cols) =>
        // declared schema read: no mergeSchema all-footers job; files
        // from older snapshot epochs null-fill the evolved columns —
        // the same union-schema view mergeSchema produced
        spark.read.schema(structOf(cols)).parquet(oldTouchedFiles: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(oldTouchedFiles: _*)
    }
    val survivors = survivorsBase
      .join(broadcast(rangeDf), $"cellId" >= $"lo" && $"cellId" <= $"hi")
      .drop("lo", "hi")
      .join(keys, Seq("cellId"), "left_anti")
    val stageRoot = s"$table/data/$newSnap"
    // allowMissingColumns: survivors written before an evolveAddColumn
    // lack the new columns — they null-fill here (schema evolution's
    // write path); updates lacking a dropped-from-updates column would
    // likewise null-fill rather than fail. Delete keeps ONLY survivors.
    val merged0 =
      if (isDelete) survivors
      else survivors.unionByName(updB, allowMissingColumns = true)
    // lineage checksums carried forward BY REFERENCE for untouched
    // buckets use the (cid*31 + payload size) formula — rewritten
    // buckets must use the same one or the table's checksum set would
    // mix two formulas; a payload-less table has no creation path here.
    // Validated BEFORE the stage write so a payload-less table fails
    // without leaving staged debris under data/<newSnap> (ADVICE r4 #3).
    require(merged0.columns.contains("payload"),
      s"$op: tables without a payload column are not supported " +
        "(lineage checksum formula is payload-based)")
    // stats of the rewritten buckets only: rows, order-independent
    // checksum, cell min/max (a delete that empties every touched bucket
    // simply yields empty stats; all touched buckets then record
    // rows: 0). FAST PATH (same as commitResumableDf): the stats ride
    // the write job as observed metrics — one job for merge + write +
    // stats, no persist of the merge frame at all. Wide touch sets
    // (> 64 buckets) persist and aggregate separately as before.
    val touchedSeq = touched.toSeq.sorted
    val useObserve = touchedSeq.size <= 64
    val obs = org.apache.spark.sql.Observation(s"$op$newSnap")
    val merged =
      if (useObserve) {
        val chkTerm = udf((cid: Long, nn: Int) => cid * 31 + nn)
        val aggs = touchedSeq.flatMap { b =>
          val c = $"bucket" === lit(b)
          Seq(count(when(c, lit(1))).as(s"n$b"),
            expr(s"bit_xor(IF(bucket = $b, chk_term, NULL))").as(s"x$b"),
            min(when(c, $"cellId")).as(s"lo$b"),
            max(when(c, $"cellId")).as(s"hi$b"))
        }
        merged0.withColumn("chk_term", chkTerm($"cellId", size($"payload")))
          .observe(obs, aggs.head, aggs.tail: _*)
          .drop("chk_term")
      } else
        merged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    spark.sparkContext.setJobDescription(s"icelite $op $table@$newSnap write")
    merged
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(stageRoot)
    updB.unpersist()
    def statsAgg(): Map[Int, (Int, Long, Long, Long, Long)] = merged
      .select($"bucket".cast("int"), $"cellId", size($"payload"))
      .as[(Int, Long, Int)]
      .map { case (b, cid, nn) => (b, cid, cid * 31 + nn) }
      .toDF("b", "cid", "chk")
      .groupBy($"b")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(chk)").as("chk"),
        min($"cid").as("lo"), max($"cid").as("hi"))
      .as[(Int, Long, Long, Long, Long)]
      .collect().map(s => s._1 -> s).toMap
    val stats: Map[Int, (Int, Long, Long, Long, Long)] =
      if (!useObserve) statsAgg()
      else {
        val m = awaitMetrics(obs)
        if (m.isEmpty) statsAgg()
        else touchedSeq.flatMap { b =>
          val rows = m(s"n$b").asInstanceOf[Long]
          if (rows == 0L) None // emptied bucket: records rows 0 below
          else {
            def l(k: String) = m(k).asInstanceOf[Long]
            Some(b -> ((b, rows, l(s"x$b"), l(s"lo$b"), l(s"hi$b"))))
          }
        }.toMap
      }
    if (!useObserve) merged.unpersist()
    spark.sparkContext.setJobDescription(null)
    mkdirs(Paths.get(table, "lineage", newSnap.toString))
    val newEntries = entries.map { e =>
      if (!touched.contains(e.bucket)) {
        // BY REFERENCE: untouched bucket keeps its old data files; its
        // lineage row carries forward unchanged
        val oldLin = Paths.get(table, "lineage", snap.toString, s"b-${e.bucket}.json")
        if (Files.exists(oldLin))
          Files.copy(oldLin,
            Paths.get(table, "lineage", newSnap.toString, s"b-${e.bucket}.json"),
            StandardCopyOption.REPLACE_EXISTING)
        s"""{"path": ${q(e.path)}, "bucket": ${e.bucket}, "rows": ${e.rows}, "min_cell": ${e.minCell}, "max_cell": ${e.maxCell}}"""
      } else {
        val (rows, chk, lo, hi) = stats.get(e.bucket)
          .map(s => (s._2, s._3, s._4, s._5)).getOrElse((0L, 0L, 0L, 0L))
        writeAtomic(Paths.get(table, "lineage", newSnap.toString, s"b-${e.bucket}.json"),
          s"""{"bucket": ${e.bucket}, "rows": $rows, "checksum": $chk}""")
        val dir = s"$stageRoot/bucket=${e.bucket}"
        s"""{"path": ${q(dir)}, "bucket": ${e.bucket}, "rows": $rows, "min_cell": $lo, "max_cell": $hi}"""
      }
    }
    writeAtomic(Paths.get(table, "manifests", s"m-$newSnap.json"),
      newEntries.mkString("[", ",\n", "]"))
    val v = currentVersion(table) + 1
    // declared schema survives an upsert that doesn't carry an evolved
    // column; columns first seen in this upsert append at the end
    val declared = tableSchema(table).getOrElse(Seq.empty)
    val written = merged.schema.fields.filterNot(_.name == "bucket")
      .map(f => (f.name, f.dataType.sql)).toSeq
    val outSchema = declared ++ written.filterNot(c => declared.exists(_._1 == c._1))
    val outSchemaJson = outSchema.map { case (n, t) =>
      s"""{"name": ${q(n)}, "type": ${q(t)}}"""
    }.mkString("[", ", ", "]")
    writeAtomic(Paths.get(table, "metadata", s"v$v.json"),
      s"""{"format": "icelite/1", "current_snapshot": $newSnap,
         | "manifest": ${q(s"$table/manifests/m-$newSnap.json")},
         | "buckets": ${entries.length},
         | "schema": $outSchemaJson}""".stripMargin)
    newSnap
  }

  /** Small-file COMPACTION — the Iceberg `rewrite_data_files` analog and
    * the table-maintenance op a 100 TB ingest cannot live without: many
    * small per-micro-batch buckets (the streaming-ingest debris) are
    * read back once and rewritten as `targetBuckets` contiguous Z-range
    * buckets under a NEW snapshot. Readers pinned to the old snapshot
    * are untouched (its data files and manifest stay on disk — time
    * travel preserved); the current-snapshot pointer flips atomically at
    * the end, so a crash mid-compaction leaves the table on the old
    * snapshot with only orphaned staging files to GC. Content is
    * byte-identical by construction (one distributed read -> one
    * dynamic-partition write; no kernel touches payloads), verified by
    * the order-independent lineage checksums. Reads under the DECLARED
    * schema ([[readDf]]), so evolved columns and their backfilled values
    * survive compaction and the recorded schema is unchanged — the
    * typed [[read]] would silently strip both. Returns the new snapshot.
    *
    * Debris rule: the resume set at `snap + 1` is honoured ONLY when a
    * `compact` op marker claims it (a crashed compact resumes exactly);
    * lineage rows or staged files left at that id by a DIFFERENT crashed
    * op (an upsert that died before its metadata flip) are deleted first
    * — resuming over them would skip rewriting those buckets and commit
    * a snapshot mixing half-applied upsert content into a supposedly
    * content-neutral compaction. */
  def compact(spark: SparkSession, table: String, targetBuckets: Int): Long = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"compact: no committed snapshot in $table"))
    // nextSnapshotId lands back on a crashed compact's id (its crash
    // predates the manifest, so the id is still free) — the marker check
    // then preserves that crash's resume set; any id holding a manifest
    // (e.g. a rollback-abandoned head) is skipped, never overwritten
    val newSnap = nextSnapshotId(table)
    if (opMarkerOf(table, newSnap) != Some("compact"))
      clearUncommitted(table, newSnap)
    writeOpMarker(table, newSnap, "compact")
    commitResumableDf(spark, readDf(spark, table, snap), table,
      targetBuckets, snap = newSnap)
  }

  /** Op marker disambiguating whose uncommitted work sits at a snapshot
    * id (lineage/<snap>/op.json). [[committedBuckets]] ignores it (the
    * resume set matches only b-*.json). */
  private def writeOpMarker(table: String, snap: Long, op: String): Unit = {
    mkdirs(Paths.get(table, "lineage", snap.toString))
    writeAtomic(Paths.get(table, "lineage", snap.toString, "op.json"),
      s"""{"op": ${q(op)}}""")
  }

  private def opMarkerOf(table: String, snap: Long): Option[String] = {
    val p = Paths.get(table, "lineage", snap.toString, "op.json")
    if (!Files.exists(p)) None
    else "\"op\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(Files.readString(p)).map(_.group(1))
  }

  /** Delete UNCOMMITTED lineage + staged data at a snapshot id (the
    * table's current snapshot must not reference it). */
  private def clearUncommitted(table: String, snap: Long): Unit = {
    require(currentSnapshot(table).forall(_ != snap),
      s"clearUncommitted: snapshot $snap is the committed current snapshot")
    deleteRecursively(Paths.get(table, "lineage", snap.toString))
    deleteRecursively(Paths.get(table, "data", snap.toString))
  }

  /** List a directory's children with the stream CLOSED afterwards
    * (bare `Files.list(...).iterator()` leaks one fd per call). */
  private def listDir(p: Path): Seq[Path] = {
    if (!Files.exists(p)) Seq.empty
    else {
      val st = Files.list(p)
      try st.iterator().asScala.toVector finally st.close()
    }
  }

  /** All snapshot ids with a manifest on disk, ascending. */
  def snapshots(table: String): Seq[Long] =
    listDir(Paths.get(table, "manifests")).flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith("m-") && n.endsWith(".json"))
        Some(n.stripPrefix("m-").stripSuffix(".json").toLong)
      else None
    }.sorted

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }

  /** SNAPSHOT EXPIRY — the Iceberg `expire_snapshots` analog: keep the
    * most recent `keepLast` snapshots (the current one always survives)
    * and delete the manifests, lineage dirs and data files of the rest.
    * Data files are REFCOUNTED across the surviving manifests before
    * deletion — upsert/evolution share files across snapshots by
    * reference, so a file owned by an expired snapshot but still listed
    * in a live manifest must stay. Time travel to an expired snapshot
    * stops working (that is the point: expiry is what bounds a 100 TB
    * table's storage growth). Returns the deleted data-dir count. */
  def expireSnapshots(table: String, keepLast: Int): Int = {
    require(keepLast >= 1, s"expireSnapshots: keepLast must be >= 1, got $keepLast")
    val all = snapshots(table)
    val current = currentSnapshot(table)
    // staged-but-unpublished WAP refs are pinned: expiring one would
    // leave publish() pointing at a deleted manifest
    val keep = (all.takeRight(keepLast) ++ current ++ stagedRefs(table)).toSet
    val expired = all.filterNot(keep.contains)
    if (expired.isEmpty) return 0
    val liveFiles = keep.toSeq.flatMap(s => manifestEntries(table, s).map(_.path))
      .map(Paths.get(_).normalize.toString).toSet
    var deleted = 0
    expired.foreach { s =>
      manifestEntries(table, s).foreach { e =>
        val p = Paths.get(e.path).normalize
        if (!liveFiles.contains(p.toString) && Files.exists(p)) {
          deleteRecursively(p); deleted += 1
        }
      }
      Files.deleteIfExists(Paths.get(table, "manifests", s"m-$s.json"))
      val lin = Paths.get(table, "lineage", s.toString)
      if (Files.exists(lin)) deleteRecursively(lin)
    }
    deleted
  }

  /** ORPHAN-FILE GC — the Iceberg `remove_orphan_files` analog: delete
    * every bucket dir under `table/data/` that no manifest on disk
    * references (the debris of a commit or upsert that crashed before
    * its atomic metadata flip). Never touches a referenced file.
    *
    * Resumability interplay: a manifest-LESS snapshot whose data is
    * deleted must also lose its `lineage/<snap>` checkpoint rows —
    * otherwise a resumed `commitResumable` would skip the checkpointed
    * buckets, find their files gone, and commit EMPTY buckets silently.
    * GC therefore clears both together (the resumed run redoes all
    * buckets — progress lost, correctness kept). Do not run concurrently
    * with an IN-FLIGHT commit on the same table: that job's staging
    * looks identical to crash debris. Returns the deleted dir count. */
  def removeOrphanFiles(table: String, graceMs: Long = 600000L): Int = {
    val dataRoot = Paths.get(table, "data")
    if (!Files.exists(dataRoot)) return 0
    val now = System.currentTimeMillis()
    // mtime grace window: an IN-FLIGHT upsert/commit stages its files
    // under data/<newSnap> BEFORE the atomic manifest rename makes the
    // snapshot live — a concurrent GC must not treat that staging as
    // orphaned. Anything touched within `graceMs` is skipped; the next
    // GC pass (after the window) reaps it if the commit truly died
    // (ADVICE r4 #3).
    def inGrace(p: java.nio.file.Path): Boolean =
      try now - Files.getLastModifiedTime(p).toMillis < graceMs
      catch { case _: java.io.IOException => true } // racing writer: skip
    val live = snapshots(table).toSet
    val referenced = live.toSeq
      .flatMap(s => manifestEntries(table, s).map(_.path))
      .map(Paths.get(_).normalize.toString).toSet
    var deleted = 0
    listDir(dataRoot).foreach { snapDir =>
      if (Files.isDirectory(snapDir)) {
        // grace evaluated BEFORE any deletion below: removing children
        // bumps the dir's mtime past the captured `now`, which would
        // otherwise read as "in grace" for the rest of this pass
        val snapFresh = inGrace(snapDir)
        listDir(snapDir).foreach { bucketDir =>
          // only bucket DIRS are data-file units; commit markers
          // (_SUCCESS etc.) at the snapshot level are never orphans
          if (Files.isDirectory(bucketDir) &&
              !referenced.contains(bucketDir.normalize.toString) &&
              !snapFresh && !inGrace(bucketDir)) {
            deleteRecursively(bucketDir); deleted += 1
          }
        }
        val snapName = snapDir.getFileName.toString
        val manifestLess = snapName.forall(_.isDigit) &&
          !live.contains(snapName.toLong)
        if (manifestLess && !snapFresh) {
          // the snapshot never committed: its checkpoint rows must die
          // with its data (see scaladoc)
          val lin = Paths.get(table, "lineage", snapName)
          if (Files.exists(lin)) deleteRecursively(lin)
        }
        if (listDir(snapDir).isEmpty) Files.deleteIfExists(snapDir)
      }
    }
    deleted
  }

  /** Lineage rows of a snapshot (metrics surface). */
  def lineage(table: String, snap: Long): Seq[Lineage] = {
    val dir = Paths.get(table, "lineage", snap.toString)
    if (!Files.exists(dir)) Seq.empty
    else {
      val re = """\{"bucket": (\d+), "rows": (\d+), "checksum": (-?\d+)\}""".r
      val out = Seq.newBuilder[Lineage]
      Files.list(dir).iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".json"))
          re.findFirstMatchIn(Files.readString(p)).foreach { m =>
            out += Lineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong)
          }
      }
      out.result().sortBy(_.bucket)
    }
  }
}
