package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}
import java.util.UUID
import scala.collection.mutable

/** Optimistic-concurrency commit log: the multi-writer ACID table layer
  * that upgrades the single-writer-per-table contract (docs/SCALE.md
  * §Writers called this "an integration, not a redesign" — this is that
  * integration, self-contained).
  *
  * Layout (the standard lakehouse shape — a transaction log of file-level
  * actions beside immutable data files):
  *
  * {{{
  *   <table>/_log/v000000000042.json   // one JSON-lines commit per version
  *   <table>/data/<uuid>.parquet       // immutable data files
  * }}}
  *
  * A commit file holds `add` / `remove` actions over data-file paths. The
  * table AT version V is the replay of v0..vV: files added and not yet
  * removed. Readers never lock anything — a snapshot is just the file
  * list at the latest (or a requested) version, and since data files are
  * immutable and commits are atomic, a pinned snapshot stays readable
  * forever (until vacuumed).
  *
  * Writer protocol (optimistic, lock-free):
  *   1. stage data files under `data/` (invisible until committed),
  *   2. read the current latest version N,
  *   3. try to publish the commit as version N+1 via an ATOMIC
  *      put-if-absent,
  *   4. lost the race → re-read the log, CHECK CONFLICTS against the
  *      commits that beat us, rebase, retry at the new tip.
  *
  * Conflict rules (per action type, checked on rebase):
  *   - append (adds only) commutes with everything → blind rebase;
  *   - rewrite (compaction: removes + adds) conflicts iff a commit that
  *     beat us REMOVED one of the files we are removing (it no longer
  *     exists to remove — two racing compactions, or compaction racing a
  *     delete); concurrent APPENDS commute with a rewrite (the rewrite
  *     simply doesn't cover them).
  *
  * The atomic primitive is abstracted as [[LogStore]] (the same shape the
  * public Delta Lake LogStore API takes): local filesystems get true
  * put-if-absent from `Files.createLink` (POSIX link(2) — atomic, full
  * content visible or nothing, fails EEXIST); HDFS would use
  * create-no-overwrite, and an object store without atomic namespace
  * operations needs an external arbiter for step 3 ONLY — everything
  * else is plain immutable-file I/O.
  *
  * Driver-side work per commit is O(commits since the last checkpoint)
  * small-file reads and one metadata write — independent of data volume,
  * so the protocol is the same at 100 TB. [[checkpoint]] rolls the state
  * up so replay stops scanning there, and [[appendOnce]] adds the
  * (appId, batchId) txn-marker idempotence that makes a `foreachBatch`
  * streaming sink exactly-once end-to-end.
  */
object CommitLog {

  /** One log action. `op` is `add`/`remove` (file-level; `path` is a
    * data-file path, `rows` bookkeeping), `txn` (writer-level
    * idempotence marker: `path` is the application id, `rows` its
    * batch/epoch number — the mechanism behind exactly-once streaming
    * sinks, see [[appendOnce]]), `meta` (schema evolution) or `cdc`
    * (a row-level change file recording the change rows a CDC-enabled
    * [[deleteWhere]]/[[mergeInto]] produced — never part of the live
    * table, read only by [[readChangesCdc]]).
    *
    * `lo`/`hi` are OPTIONAL per-file min/max bounds of the table's index
    * column (NaN = not recorded) — the data-skipping metadata
    * [[readWhere]] prunes by. `stats` generalizes them to a per-COLUMN
    * min/max zonemap ([[appendClustered]] records one, [[readWhereBox]]
    * prunes on every queried dimension at once). Absent bounds are
    * conservative: the file is always read. */
  final case class Action(op: String, path: String, rows: Long,
                          lo: Double = Double.NaN, hi: Double = Double.NaN,
                          stats: Map[String, (Double, Double)] = Map.empty,
                          bloom: String = "") {
    // Non-finite bounds are "no bounds": +/-Infinity can reach here from a
    // legal parquet column (min/max of an infinite double), and the line
    // codec's number regex does not decode the textual `Infinity` — so a
    // non-finite bound must degrade to conservative no-pruning, never
    // reach [[encode]] (a committed `"lo":Infinity` would poison every
    // subsequent read of the table with 'corrupt commit line').
    def hasBounds: Boolean = finite(lo) && finite(hi)
  }

  private def finite(d: Double): Boolean = !d.isNaN && !d.isInfinite

  final case class Snapshot(version: Long, files: Seq[String]) {
    def isEmpty: Boolean = files.isEmpty
  }

  /** Thrown when a rewrite's remove-set was invalidated by a commit that
    * won the race — the caller's snapshot is stale in a way that does NOT
    * commute; re-plan from a fresh snapshot (e.g. rerun the compaction). */
  final class ConcurrentRewriteException(msg: String)
    extends RuntimeException(msg)

  /** Thrown BEFORE any data is staged when an append's schema is
    * incompatible with the table's (same column name, different type) —
    * evolution is additive-only, so the table is never poisoned by a
    * committed-but-unreadable schema. Also raised from the conflict scan
    * when a RACING commit introduced the conflicting column. */
  final class SchemaConflictException(msg: String)
    extends IllegalArgumentException(msg)

  /** Thrown when a CHECK constraint rejects a write (every violating
    * batch aborts ATOMICALLY — staged files are cleaned up, nothing is
    * committed) or when [[addConstraint]] finds existing rows that
    * violate the constraint being added. */
  final class ConstraintViolationException(msg: String)
    extends IllegalArgumentException(msg)

  /** Thrown by [[readChangesCdc]] when the requested window contains a
    * MUTATION commit (delete/update/merge/apply) that recorded no change
    * files — the row-level feed cannot be reconstructed from file actions
    * alone, and silently classifying the commit as a reorganization would
    * let a replica diverge without any signal. Enable CDC on the table
    * (`setTableProperty(table, "cdc", "true")` makes every subsequent
    * mutation record change files) or pass `cdc = true` per mutation. */
  final class CdcGapException(msg: String) extends IllegalStateException(msg)

  /** Internal signal: a txn-marked commit found its (app, batch) already
    * committed by a racer — [[appendOnce]] turns this into a silent skip
    * (the batch IS in the table; that's success, not failure). */
  private final class TxnAlreadyApplied(val appId: String, val batchId: Long,
                                        val byVersion: Long)
    extends RuntimeException(
      s"txn ($appId, $batchId) already applied by commit v$byVersion")

  /** The atomic-commit primitive. Exactly one concurrent
    * `putIfAbsent(v, ..)` per version may succeed, and a successful put
    * must be all-or-nothing visible to readers. */
  trait LogStore {
    /** True iff this call published `content` as version file `target`. */
    def putIfAbsent(target: Path, content: String): Boolean
    def read(p: Path): String
    def list(dir: Path): Seq[Path]
  }

  /** Local-FS store: write the full content to a tmp file, then
    * `Files.createLink(target, tmp)` — POSIX hard-link creation is atomic
    * and fails `EEXIST` if the target exists, so a reader either sees the
    * complete commit file or no file; there is no partial-content window
    * (the content was durable in the tmp inode before the link). */
  object LocalStore extends LogStore {
    def putIfAbsent(target: Path, content: String): Boolean = {
      val tmp = target.resolveSibling(
        s".${target.getFileName}.${UUID.randomUUID().toString}.tmp")
      Files.write(tmp, content.getBytes("UTF-8"))
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    }
    def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")
    def list(dir: Path): Seq[Path] = {
      if (!Files.isDirectory(dir)) return Nil
      val s = Files.list(dir)
      try {
        val b = Seq.newBuilder[Path]
        s.forEach(p => b += p)
        b.result()
      } finally s.close()
    }
  }

  private val VersionRe = """v(\d{12})\.json""".r

  private def logDir(table: String): Path = Paths.get(table, "_log")
  private def dataDir(table: String): Path = Paths.get(table, "data")
  private def versionFile(table: String, v: Long): Path =
    logDir(table).resolve(f"v$v%012d.json")

  /** JSON-lines encode. Paths are always `data/<uuid>.parquet` strings this
    * object generated (no quotes/escapes possible), so the symmetric
    * regex decode below is exact, not a general JSON parser. Bounds are
    * emitted only when recorded, so stat-free logs are byte-identical to
    * the pre-stats format (old logs decode unchanged). */
  private def encode(actions: Seq[Action]): String =
    actions.map { a =>
      val bounds = if (a.hasBounds) s""","lo":${a.lo},"hi":${a.hi}""" else ""
      // column names are required to be plain identifiers at record time,
      // so the zonemap nests without any escaping; sorted for determinism
      // same finiteness discipline as hasBounds: a non-finite column range
      // is dropped from the zonemap (that column is simply never pruned on
      // for this file) instead of emitting undecodable `Infinity` text
      val finiteStats = a.stats.filter { case (_, (lo, hi)) => finite(lo) && finite(hi) }
      val zone =
        if (finiteStats.isEmpty) ""
        else finiteStats.toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s""""$c":[$lo,$hi]""" }
          .mkString(""","stats":{""", ",", "}")
      // bloom tokens are `<ident>:<m>:<k>:<b64url>` — every char quote-free
      // by construction (identifier enforced at record time, url-safe b64)
      val bl = if (a.bloom.isEmpty) "" else s""","bloom":"${a.bloom}""""
      s"""{"op":"${a.op}","path":"${a.path}","rows":${a.rows}$bounds$zone$bl}"""
    }.mkString("\n")

  private val ActionRe =
    ("""\{"op":"(add|remove|txn|meta|cdc|info|prop|dv|dvref|dvremove)","path":"([^"]+)","rows":(\d+)""" +
      """(?:,"lo":(-?[0-9.eE+-]+),"hi":(-?[0-9.eE+-]+))?""" +
      """(?:,"stats":\{([^}]*)\})?""" +
      """(?:,"bloom":"([^"]+)")?\}""").r

  private val StatRe = """"([A-Za-z0-9_]+)":\[(-?[0-9.eE+-]+),(-?[0-9.eE+-]+)\]""".r

  private def decodeStats(s: String): Map[String, (Double, Double)] =
    StatRe.findAllMatchIn(s)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
      .toMap

  // `meta` actions carry a schema: StructType JSON, base64-encoded so the
  // payload is a quote-free token the line codec handles unchanged.
  private def schemaToken(s: org.apache.spark.sql.types.StructType): String =
    java.util.Base64.getEncoder.encodeToString(s.json.getBytes("UTF-8"))
  private def tokenToSchema(t: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(
      new String(java.util.Base64.getDecoder.decode(t), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  private def decode(content: String): Seq[Action] =
    content.linesIterator.filter(_.nonEmpty).map {
      case ActionRe(op, path, rows, lo, hi, stats, bloom) =>
        Action(op, path, rows.toLong,
          lo = if (lo == null) Double.NaN else lo.toDouble,
          hi = if (hi == null) Double.NaN else hi.toDouble,
          stats = if (stats == null) Map.empty else decodeStats(stats),
          bloom = if (bloom == null) "" else bloom)
      case bad => throw new IllegalStateException(s"corrupt commit line: $bad")
    }.toSeq

  /** Latest committed version, or -1 for an empty/absent log. Versions are
    * dense by construction (a commit only lands at latest+1), so max of
    * the listing is the tip. */
  def latestVersion(table: String, store: LogStore = LocalStore): Long =
    store.list(logDir(table)).flatMap(p => p.getFileName.toString match {
      case VersionRe(v) => Some(v.toLong)
      case _            => None
    }).foldLeft(-1L)(math.max)

  private val CheckpointRe = """c(\d{12})\.json""".r
  private def checkpointFile(table: String, v: Long): Path =
    logDir(table).resolve(f"c$v%012d.json")

  /** Latest checkpoint version ≤ `v`, or -1 if none. */
  private def latestCheckpointAtOrBefore(table: String, v: Long,
                                         store: LogStore): Long =
    store.list(logDir(table)).flatMap(p => p.getFileName.toString match {
      case CheckpointRe(c) if c.toLong <= v => Some(c.toLong)
      case _                                => None
    }).foldLeft(-1L)(math.max)

  /** Full table state at a version: live files (insertion-ordered), their
    * recorded index-column bounds, the per-application txn high-water
    * marks, and the UNION of every committed schema (first-appearance
    * column order). Union — not last-wins — so two racing appends that
    * each add a different column commute: neither's column is lost from
    * the read schema. Same-name-different-type is the one thing that
    * cannot union; it throws the typed conflict. */
  private[sources] final case class State(live: mutable.LinkedHashSet[String],
                                 bounds: mutable.Map[String, (Double, Double)],
                                 txns: mutable.Map[String, Long],
                                 schema: mutable.LinkedHashMap[String, org.apache.spark.sql.types.StructField],
                                 zones: mutable.Map[String, Map[String, (Double, Double)]] = mutable.Map.empty,
                                 props: mutable.Map[String, String] = mutable.Map.empty,
                                 rowsOf: mutable.Map[String, Long] = mutable.Map.empty,
                                 dvs: mutable.LinkedHashSet[String] = mutable.LinkedHashSet.empty,
                                 dvRowsOf: mutable.Map[String, Long] = mutable.Map.empty,
                                 blooms: mutable.Map[String, String] = mutable.Map.empty) {
    def apply(a: Action): Unit = a.op match {
      case "add" =>
        live += a.path
        if (a.hasBounds) bounds(a.path) = (a.lo, a.hi)
        if (a.stats.nonEmpty) zones(a.path) = a.stats
        if (a.rows > 0) rowsOf(a.path) = a.rows
        if (a.bloom.nonEmpty) blooms(a.path) = a.bloom
      case "remove" =>
        live -= a.path; bounds -= a.path; zones -= a.path; rowsOf -= a.path
        blooms -= a.path
      case "txn" =>
        if (txns.getOrElse(a.path, -1L) < a.rows) txns(a.path) = a.rows
      case "meta" => mergeSchema(tokenToSchema(a.path))
      case "cdc"  => () // change files are not live table data
      case "dv" => // a live deletion-vector sidecar: masks rows on every read
        dvs += a.path
        if (a.rows > 0) dvRowsOf(a.path) = a.rows
      case "dvremove" => // sidecar retired (compaction materialized it, or restore)
        dvs -= a.path; dvRowsOf -= a.path
      case "dvref" => () // conflict metadata only (files a DV commit masks)
      case "info" => () // per-commit provenance; read by history/CDC, not state
      case "prop" => a.path.split("=", 2) match {
        case Array(k, "-") => props -= k // "-" is the removal tombstone
        case Array(k, v)   => props(k) = v // last committed value wins
        case _ => throw new IllegalStateException(s"corrupt prop action: ${a.path}")
      }
      case _ => throw new IllegalStateException(s"unknown action $a")
    }
    def mergeSchema(s: org.apache.spark.sql.types.StructType): Unit =
      s.fields.foreach { f =>
        schema.get(f.name) match {
          case Some(prev) =>
            schema(f.name) = prev.copy(
              dataType = widenNullability(f.name, prev.dataType, f.dataType))
          case None => schema(f.name) = f.copy(nullable = true)
        }
      }
    def schemaStruct: Option[org.apache.spark.sql.types.StructType] =
      if (schema.isEmpty) None
      else Some(org.apache.spark.sql.types.StructType(schema.values.toSeq))
    def liveActions: Seq[Action] = {
      val files = live.toSeq.map { p =>
        val (lo, hi) = bounds.getOrElse(p, (Double.NaN, Double.NaN))
        Action("add", p, rowsOf.getOrElse(p, 0L), lo, hi,
          zones.getOrElse(p, Map.empty), blooms.getOrElse(p, ""))
      }
      val propActs = props.toSeq.sortBy(_._1)
        .map { case (k, v) => Action("prop", s"$k=$v", 0L) }
      // live sidecars roll into checkpoints like live data files (dvref
      // actions do NOT: conflict scans read raw commit files, never
      // checkpoints, so the refs are per-commit metadata by construction)
      val dvActs = dvs.toSeq.map(p => Action("dv", p, dvRowsOf.getOrElse(p, 0L)))
      schemaStruct.map(s => Action("meta", schemaToken(s), 0L)).toSeq ++
        propActs ++ files ++ dvActs
    }
  }

  /** Replay through `v`, seeded from the latest checkpoint ≤ `v` when one
    * exists — replay cost is then O(commits since checkpoint), not
    * O(table lifetime); the pre-checkpoint commit files aren't even
    * opened (CommitLogSpec proves this by corrupting them). */
  /** The union of two occurrences of one column's type, nullability-wise:
    * the same STRUCTURE with differing array/map/struct nullability flags
    * merges to the more-nullable form (a parquet-seeded table and a
    * `Seq(...).toDF` frame routinely disagree only on `containsNull` —
    * that is schema NOISE, not evolution); a structural difference is the
    * typed additive-only conflict, exactly as before. */
  private def widenNullability(name: String,
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (x, y) if x == y => x
      case (ArrayType(ea, na), ArrayType(eb, nb)) =>
        ArrayType(widenNullability(name, ea, eb), na || nb)
      case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
        MapType(widenNullability(name, ka, kb), widenNullability(name, va, vb), na || nb)
      case (StructType(fa), StructType(fb))
          if fa.length == fb.length && fa.map(_.name).sameElements(fb.map(_.name)) =>
        StructType(fa.zip(fb).map { case (x, y) =>
          StructField(x.name, widenNullability(name, x.dataType, y.dataType),
            x.nullable || y.nullable, x.metadata)
        })
      case _ =>
        throw new SchemaConflictException(
          s"column $name: ${a.simpleString} vs " +
            s"${b.simpleString} — evolution is additive-only")
    }
  }

  private[sources] def replay(table: String, v: Long, store: LogStore): State = {
    val st = State(mutable.LinkedHashSet.empty, mutable.Map.empty,
      mutable.Map.empty, mutable.LinkedHashMap.empty)
    val cp = latestCheckpointAtOrBefore(table, v, store)
    if (cp >= 0)
      decode(store.read(checkpointFile(table, cp))).foreach(st.apply)
    ((cp + 1) to v).foreach { i =>
      decode(store.read(versionFile(table, i))).foreach(st.apply)
    }
    st
  }

  /** Per-commit provenance marker: every commit this object writes leads
    * with one, so [[history]] can describe the table and [[readChangesCdc]]
    * can distinguish a REORGANIZATION (compact — rows unchanged) from a
    * MUTATION (delete/update/merge/apply — rows changed) without guessing
    * from the action shape. The `rows` slot carries the commit's
    * wall-clock epoch-ms timestamp — the provenance [[commitTimestamps]]
    * adjusts into the monotone clock that timestamp-addressed time travel
    * ([[versionAtTimestamp]]) resolves against. Legacy commits without
    * one decode fine (the op set is additive), classify as they did
    * before, and time-travel as epoch 0 under the monotone adjustment. */
  private def infoAct(operation: String): Action =
    Action("info", operation, System.currentTimeMillis())

  private def operationOf(actions: Seq[Action]): Option[String] =
    actions.collectFirst { case a if a.op == "info" => a.path }

  /** Commit kinds whose remove-carrying commits rewrite rows that ALREADY
    * flowed — the change feeds skip them. Everything else that removes
    * files changes row content. */
  private val ReorgOps = Set("compact")

  /** Mutation kinds that change row content — under a remove-carrying
    * commit (copy-on-write) or a dv-carrying one (merge-on-read); without
    * change files the row-level feed cannot represent them, so
    * [[readChangesCdc]] raises the typed gap. */
  private val MutationOps =
    Set("delete", "update", "merge", "apply", "overwrite",
        "deletedv", "updatedv", "mergedv", "applydv")

  /** Set a table property (committed, versioned, checkpoint-carried like
    * any other log state). The one property the engine itself reads is
    * `cdc=true`: it auto-enables change-file recording on every
    * subsequent [[deleteWhere]]/[[updateWhere]]/[[mergeInto]], closing
    * the feed-gap failure mode where one forgotten `cdc = true` call
    * silently starves every downstream replica. Key and value must be
    * plain tokens (they are embedded in the commit line). */
  def setTableProperty(table: String, key: String, value: String,
                       store: LogStore = LocalStore): Long = {
    require(key.matches("[A-Za-z0-9_.-]+"), s"property key must be a plain token: $key")
    require(value.matches("[A-Za-z0-9_.-]+"), s"property value must be a plain token: $value")
    // "-" is replay's removal tombstone: letting it through as a VALUE
    // would silently DELETE the property instead of setting it — reject
    // here with the real API to use (the one legal-token/illegal-value)
    require(value != "-",
      s"'-' is the property-removal tombstone, not a value — " +
        s"use removeTableProperty($table, $key) to remove the property")
    val tip = latestVersion(table, store)
    commit(table, Seq(infoAct("property"), Action("prop", s"$key=$value", 0L)),
      readVersion = tip, store)
  }

  /** Remove a table property (committed tombstone; replay and checkpoints
    * drop the key). Removing an absent key is a legal no-op commit. */
  def removeTableProperty(table: String, key: String,
                          store: LogStore = LocalStore): Long = {
    require(key.matches("[A-Za-z0-9_.-]+"), s"property key must be a plain token: $key")
    val tip = latestVersion(table, store)
    commit(table, Seq(infoAct("property"), Action("prop", s"$key=-", 0L)),
      readVersion = tip, store)
  }

  /** The table's committed properties at the tip (last writer wins). */
  def tableProperties(table: String, store: LogStore = LocalStore): Map[String, String] = {
    val tip = latestVersion(table, store)
    if (tip < 0) Map.empty else replay(table, tip, store).props.toMap
  }

  // CHECK constraints ride the property mechanism: key `constraint.<name>`,
  // value = URL-safe unpadded base64 of the SQL predicate (the alphabet is
  // exactly the plain-token charset, so arbitrary predicates embed in the
  // line codec unchanged — the same trick the schema meta action uses).
  private val ConstraintPrefix = "constraint."
  private def b64url(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(s.getBytes("UTF-8"))
  private def unB64url(t: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(t), "UTF-8")
  private def constraintsOf(props: collection.Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(ConstraintPrefix) =>
      k.stripPrefix(ConstraintPrefix) -> unB64url(v) }.toMap
  private def checksAt(table: String, store: LogStore): Map[String, String] = {
    val tip = latestVersion(table, store)
    if (tip < 0) Map.empty else constraintsOf(replay(table, tip, store).props)
  }

  /** The table's CHECK constraints at the tip: name → SQL predicate. */
  def constraints(table: String, store: LogStore = LocalStore): Map[String, String] =
    checksAt(table, store)

  /** THE house CHECK rule, in one place: a row violates when its
    * predicate is false OR NULL (CHECK must hold; unknown does not hold
    * — deliberately stricter than ANSI, the conservative choice for a
    * data contract). One column-pruned aggregate counts violations of
    * EVERY predicate in a single job; staging, ADD CONSTRAINT, and
    * restore all validate through here, so the rule cannot drift
    * between write paths. */
  private def checkViolations(df: DataFrame,
                              checks: Map[String, String]): Seq[(String, String, Long)] = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not, sum, when}
    val cs = checks.toSeq
    val aggs = cs.zipWithIndex.map { case ((_, p), i) =>
      sum(when(not(coalesce(expr(p), lit(false))), 1L).otherwise(0L)).as(s"c$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cs.zipWithIndex.map { case ((n, p), i) =>
      (n, p, if (row.isNullAt(i)) 0L else row.getLong(i)) }
  }

  /** ALTER TABLE ADD CONSTRAINT ... CHECK (<predicate>): existing rows are
    * validated FIRST (one column-pruned scan; same rule as every lakehouse
    * ADD CONSTRAINT — a constraint the live data already violates is
    * rejected with the typed error, nothing committed), then the
    * constraint commits as versioned log state. From that version on,
    * EVERY write path that introduces new row values — append, streaming
    * append, UPDATE, MERGE, CDC apply — validates its staged output
    * before committing; a violating batch aborts atomically. SQL CHECK
    * semantics: a row where the predicate is NULL violates (CHECK must
    * hold, unknown does not hold — the conservative choice for a data
    * CONTRACT; note ANSI CHECK accepts unknown, so this is deliberately
    * stricter). */
  def addConstraint(spark: SparkSession, table: String, name: String,
                    predicate: String, store: LogStore = LocalStore): Long = {
    require(name.matches("[A-Za-z0-9_]+"), s"constraint name must be a plain token: $name")
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table does not exist — append first")
    val st = replay(table, tip, store)
    if (st.live.nonEmpty) {
      val reader = st.schemaStruct match {
        case Some(s) => spark.read.schema(s)
        case None    => spark.read
      }
      val live = reader
        .parquet(st.live.toSeq.map(f => Paths.get(table, f).toString): _*)
      checkViolations(live, Map(name -> predicate)).foreach { case (n, p, bad) =>
        if (bad > 0) throw new ConstraintViolationException(
          s"cannot add CHECK constraint $n ($p): " +
            s"$bad existing rows violate it — nothing was committed")
      }
    }
    commit(table, Seq(infoAct("constraint"),
      Action("prop", s"$ConstraintPrefix$name=${b64url(predicate)}", 0L)),
      readVersion = tip, store)
  }

  /** ALTER TABLE DROP CONSTRAINT: removes the named constraint via the
    * property tombstone; later writes stop validating it. */
  def dropConstraint(table: String, name: String,
                     store: LogStore = LocalStore): Long = {
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table does not exist")
    commit(table, Seq(infoAct("constraint"),
      Action("prop", s"$ConstraintPrefix$name=-", 0L)),
      readVersion = tip, store)
  }

  /** The log-carried schema at `asOf` (default tip) — derived purely from
    * replayed meta actions, so it works on a table whose live file set is
    * momentarily EMPTY (all rows deleted): schema is log state, not a
    * property of whichever files happen to be live. `None` only for a
    * legacy log that never committed a meta action. */
  def tableSchema(table: String, asOf: Option[Long] = None,
                  store: LogStore = LocalStore): Option[org.apache.spark.sql.types.StructType] = {
    val tip = latestVersion(table, store)
    if (tip < 0) return None
    val v = asOf.getOrElse(tip)
    require(v <= tip, s"version $v does not exist (tip is $tip)")
    replay(table, v, store).schemaStruct
  }

  /** Snapshot of the table through `asOf` (default: tip). Add-then-removed
    * files drop out; order within one commit is irrelevant because a
    * single commit never adds AND removes the same path. */
  def snapshot(table: String, asOf: Option[Long] = None,
               store: LogStore = LocalStore): Snapshot = {
    val tip = latestVersion(table, store)
    val v = asOf.getOrElse(tip)
    require(v <= tip, s"version $v does not exist (tip is $tip)")
    Snapshot(v, replay(table, v, store).live.toSeq)
  }

  /** Highest batch id committed for `appId` (-1 if none) — the idempotence
    * cursor [[appendOnce]] checks. */
  def txnHighWater(table: String, appId: String,
                   store: LogStore = LocalStore): Long = {
    val tip = latestVersion(table, store)
    if (tip < 0) -1L else replay(table, tip, store).txns.getOrElse(appId, -1L)
  }

  /** Roll the state at the current tip into a checkpoint file so replay
    * (and conflict checking) stops scanning at the checkpoint. Published
    * with the same put-if-absent primitive — racing checkpointers are
    * harmless (first wins; the state content for a version is a pure
    * function of the log, so any winner wrote the same thing). */
  def checkpoint(table: String, store: LogStore = LocalStore): Long = {
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table has no commits to checkpoint")
    val st = replay(table, tip, store)
    val acts = st.liveActions ++
      st.txns.toSeq.sortBy(_._1).map { case (app, b) => Action("txn", app, b) }
    store.putIfAbsent(checkpointFile(table, tip), encode(acts))
    tip
  }

  // --- deletion vectors (merge-on-read) --------------------------------------

  /** Helper-column names for the DV mask join — deliberately outside any
    * plausible user schema. */
  private val DvFile = "__graft_dv_file"
  private val DvPos  = "__graft_dv_pos"

  /** Above this many masked positions the mask side is no longer hinted
    * broadcast (the join still works — AQE plans it); ~4M (file, pos)
    * rows is ~200 MB of hash relation, the conventional broadcast
    * ceiling. A table carrying more masked rows than that should be
    * compacted (compaction materializes and retires every sidecar). */
  private val DvBroadcastRows = 4L * 1000 * 1000

  /** Tag a raw parquet scan with the (file, position) identity every DV
    * operation keys on. `_metadata.file_name` / `row_index` are hidden
    * parquet metadata columns (public Spark API, SPARK-37980): the row's
    * ordinal within its file is computed from row-group offsets, so it is
    * deterministic across read parallelism — the property that makes a
    * position-based delete replayable at any cluster size. */
  private def dvKeyed(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn(DvFile, col("_metadata.file_name"))
      .withColumn(DvPos, col("_metadata.row_index"))
  }

  /** The live mask frame a read over `scanFiles` must anti-join against:
    * the union of every live sidecar, PRE-FILTERED to the scanned files'
    * names whenever the scan covers a strict subset of the live set — so
    * a bloom- or bounds-pruned point lookup over a heavily-masked table
    * pays O(opened files' mask positions), not O(total mask) (the r16
    * verdict's "missing #3": sidecar rows for unopened files used to be
    * scanned and shuffled on every pruned read once the mask outgrew the
    * broadcast ceiling). The filter is a pushed-down `file IN (...)` over
    * the sidecar parquet — evaluated at the mask scan, never shuffled. */
  private def dvMaskFrame(spark: SparkSession, table: String, st: State,
                          scanFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dv = spark.read.parquet(
        st.dvs.toSeq.map(f => Paths.get(table, f).toString): _*)
      .select(col("file"), col("pos"))
    if (scanFiles.size >= st.live.size) dv
    else {
      val names = scanFiles.map(f => Paths.get(f).getFileName.toString)
      dv.where(col("file").isin(names: _*))
    }
  }

  /** Mask-side input rows a masked read over `files` pays after file
    * pruning — observability for specs and operators (a compaction-due
    * signal reads [[deletionVectors]]; THIS tells you what a specific
    * pruned read actually joins against). */
  def dvMaskRowsFor(spark: SparkSession, table: String, files: Seq[String],
                    store: LogStore = LocalStore): Long = {
    val st = replay(table, latestVersion(table, store), store)
    if (st.dvs.isEmpty) 0L else dvMaskFrame(spark, table, st, files).count()
  }

  /** Anti-join a `dvKeyed` scan against the snapshot's live sidecars —
    * the merge-on-read half of [[deleteWhereDv]]. Keeps the key columns
    * (callers that need a clean table frame drop them). `scanFiles` is
    * the file set the keyed frame scans: the mask side is pruned to it
    * ([[dvMaskFrame]]), so sidecar rows for unopened files are never
    * read, let alone shuffled. */
  private def dvMaskKeyed(spark: SparkSession, table: String, st: State,
                          keyed: DataFrame, scanFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    if (st.dvs.isEmpty) keyed
    else {
      val dv = dvMaskFrame(spark, table, st, scanFiles)
        .select(col("file").as("__graft_dv_mfile"),
                col("pos").as("__graft_dv_mpos"))
      // broadcast decision on the TOTAL recorded mask size — an upper
      // bound of the pruned side (per-data-file counts aren't log state);
      // past the ceiling AQE still re-plans a small pruned side at runtime
      val total = st.dvs.toSeq.map(st.dvRowsOf.getOrElse(_, 0L)).sum
      val side = if (total <= DvBroadcastRows) broadcast(dv) else dv
      keyed.join(side,
        keyed(DvFile) === col("__graft_dv_mfile") &&
          keyed(DvPos) === col("__graft_dv_mpos"), "left_anti")
    }
  }

  /** Read `files` under the snapshot's schema with every live deletion
    * vector applied — THE read primitive once a table carries DVs: a
    * position-keyed anti-join against the (broadcast) mask, zero work
    * when no sidecar is live (the plan is the plain scan, byte-identical
    * to the pre-DV engine). */
  private[sources] def maskedRead(spark: SparkSession, table: String, st: State,
                         files: Seq[String]): DataFrame = {
    val reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val base = reader.parquet(files.map(f => Paths.get(table, f).toString): _*)
    if (st.dvs.isEmpty) base
    else dvMaskKeyed(spark, table, st, dvKeyed(base), files).drop(DvFile, DvPos)
  }

  /** Live deletion-vector sidecars at a version (log path → masked-
    * position count) — the observability hook: `sum(counts)` against the
    * table's row count tells an operator when [[compact]] (which
    * materializes and retires every sidecar) is due, and specs assert
    * mask lifecycle on it. */
  def deletionVectors(table: String, asOf: Option[Long] = None,
                      store: LogStore = LocalStore): Seq[(String, Long)] = {
    val tip = latestVersion(table, store)
    val v = asOf.getOrElse(tip)
    require(v <= tip, s"version $v does not exist (tip is $tip)")
    val st = replay(table, v, store)
    st.dvs.toSeq.map(p => p -> st.dvRowsOf.getOrElse(p, 0L))
  }

  /** Snapshot read, optionally time-traveled. The file list is explicit,
    * so uncommitted (staged or orphaned) files under `data/` are invisible
    * by construction — crash cleanup is a vacuum concern, never a
    * correctness concern. Live deletion vectors ([[deleteWhereDv]]) are
    * applied as of the requested version — time travel to a pre-DV
    * version shows the rows back, the same contract as copy-on-write. */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None,
           store: LogStore = LocalStore): DataFrame = {
    val tip = latestVersion(table, store)
    val v = asOf.getOrElse(tip)
    require(v <= tip, s"version $v does not exist (tip is $tip)")
    val st = replay(table, v, store)
    require(st.live.nonEmpty, s"$table has no live files at v$v")
    // The log's schema (as of v — time travel reads the columns that
    // existed THEN) is authoritative: files written before a column was
    // added read it as NULL; no footer-merging pass is ever needed.
    maskedRead(spark, table, st, st.live.toSeq)
  }

  /** Pre-flight schema check + the meta action an append-shaped commit
    * carries: merging the frame's schema into the CURRENT table schema
    * throws the typed conflict BEFORE anything is staged. Returns the
    * tip the check covered — the commit's conflict scan starts AFTER it
    * (only the commits that RACE this one are re-read; an append never
    * scans table history). */
  private def metaFor(table: String, df: DataFrame,
                      store: LogStore): (Long, Action) = {
    val tip = latestVersion(table, store)
    if (tip >= 0) replay(table, tip, store).mergeSchema(df.schema)
    (tip, Action("meta", schemaToken(df.schema), 0L))
  }

  /** Stage `df` as immutable uuid-named files under `data/` and return the
    * add-actions. Staged files are invisible until a commit references
    * them. Spark writes a directory; each part file is moved to a flat
    * uuid name so commits own files, not directories. */
  /** Probe count for commit-recorded bloom filters: 4 hash positions per
    * value is the classic sweet spot for ~10 bits/key sizing (~1-2% false
    * positives); the writer picks `m` (bits) to match its per-file key
    * count. */
  private val BloomK = 4

  /** Driver-side per-file (rowCount, per-column min/max) from the staged
    * parquet FOOTERS — the stats the writer already computed. Returns
    * None (caller falls back to the Spark-job aggregate) when any
    * requested stat column is missing from a footer or is not a numeric
    * primitive whose footer statistics decode losslessly to the double
    * bounds the log records (INT32/INT64/FLOAT/DOUBLE; strings, decimals
    * and nested types fall back). Multiple row groups per file fold;
    * all-null columns record no bounds (conservative: never pruned on). */
  private def footerStats(spark: SparkSession, parts: Seq[java.nio.file.Path],
      statCols: Seq[String]): Option[Map[String, (Long, Map[String, (Double, Double)])]] = {
    import org.apache.parquet.column.statistics.{DoubleStatistics, FloatStatistics, IntStatistics, LongStatistics, Statistics}
    val conf = spark.sessionState.newHadoopConf()
    def boundsOf(st: Statistics[_]): Option[(Double, Double)] = st match {
      case s: LongStatistics   => Some((s.getMin.toDouble, s.getMax.toDouble))
      case s: IntStatistics    => Some((s.getMin.toDouble, s.getMax.toDouble))
      case s: DoubleStatistics => Some((s.getMin, s.getMax))
      case s: FloatStatistics  => Some((s.getMin.toDouble, s.getMax.toDouble))
      case _                   => None
    }
    try {
      Some(parts.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toString), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          val rows = blocks.asScala.map(_.getRowCount).sum
          val per = statCols.flatMap { c =>
            val chunks = blocks.asScala.map { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == c)
                .getOrElse(throw new NoSuchElementException(c))
            }
            // a column with any unusable footer statistics aborts the
            // whole footer path (throw → None → job fallback), so bounds
            // never silently degrade relative to the aggregate path
            val perBlock = chunks.map { ch =>
              // reject annotated physical types (timestamp/decimal ride
              // INT64/INT32 but mean different values than Spark's cast
              // to double — the job path must own those); plain signed
              // ints and IEEE floats decode identically on both paths
              val ann = ch.getPrimitiveType.getLogicalTypeAnnotation
              val annOk = ann == null || (ann match {
                case i: org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                  i.isSigned
                case _ => false
              })
              if (!annOk)
                throw new NoSuchElementException(s"annotated stats type for $c")
              val st = ch.getStatistics
              if (st == null || st.isEmpty)
                throw new NoSuchElementException(s"no stats for $c")
              if (!st.hasNonNullValue) None // all-null block
              else Some(boundsOf(st).getOrElse(
                throw new NoSuchElementException(s"non-primitive stats for $c")))
            }
            val defined = perBlock.flatten
            if (defined.isEmpty) None // all-null column: no bounds
            else Some(c -> ((defined.map(_._1).min, defined.map(_._2).max)))
          }.toMap
          p.getFileName.toString -> ((rows, per))
        } finally reader.close()
      }.toMap)
    } catch { case _: Exception => None }
  }

  private def stage(spark: SparkSession, table: String, df: DataFrame,
                    indexCol: Option[String] = None,
                    statsCols: Seq[String] = Nil,
                    checks: Map[String, String] = Map.empty,
                    bloom: Option[(String, Int)] = None): Seq[Action] = {
    Files.createDirectories(dataDir(table))
    val staging = Paths.get(table, s".staging-${UUID.randomUUID()}")
    df.write.parquet(staging.toString)
    val parts = LocalStore.list(staging)
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
    // CHECK-constraint enforcement over the STAGED output, before anything
    // becomes visible: one column-pruned aggregate over the just-written
    // compact parquet (all constraints in a single job), so a violating
    // batch aborts atomically — staging is deleted, nothing is committed.
    // Validating the staged files rather than the input plan also means a
    // non-deterministic input can't pass the check yet commit bad rows.
    if (checks.nonEmpty && parts.nonEmpty) {
      checkViolations(spark.read.parquet(staging.toString), checks)
        .foreach { case (n, p, bad) =>
          if (bad > 0) {
            LocalStore.list(staging).foreach(Files.delete)
            Files.delete(staging)
            throw new ConstraintViolationException(
              s"CHECK constraint $n ($p) rejected $bad rows — " +
                "the batch was aborted; nothing was committed")
          }
        }
    }
    // Per-file stats — ROW COUNT always, plus a single index column
    // and/or a multi-column zonemap when asked. The parquet writer
    // already computed exactly these into each staged file's FOOTER, so
    // the primary path reads the footers directly on the driver — O(files)
    // metadata work, the same order as the commit itself — instead of
    // launching a Spark job per staging call to re-derive them (guide
    // §1.2 step 1: a bench pass spends a measurable slice of every
    // commit-log query on these one-per-commit stats jobs, and at any
    // scale the job's task-launch floor dwarfs the footer read). Commits
    // still OWN the stats (they ride the add-action; a pruning read never
    // opens the file). Non-primitive stat columns (strings, decimals)
    // fall back to the old one-job aggregate, so bounds semantics are
    // unchanged. The row count makes every add/cdc action
    // self-describing, which is what row-based stream admission control
    // ([[versionFeedRows]], the change-feed source's maxRowsPerTrigger)
    // paces on.
    val statCols = (indexCol.toSeq ++ statsCols).distinct
    statCols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"stats column must be a plain identifier: $c"))
    val fileStats: Map[String, (Long, Map[String, (Double, Double)])] =
      if (parts.isEmpty) Map.empty
      else footerStats(spark, parts, statCols).getOrElse {
        import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
        val aggs = count(lit(1)).as("__rows") +: statCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"lo_$c"),
          max(col(c)).cast("double").as(s"hi_$c")))
        spark.read.parquet(staging.toString)
          .groupBy(input_file_name().as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val name = Paths.get(new java.net.URI(r.getString(0)).getPath)
              .getFileName.toString
            val per = statCols.zipWithIndex.flatMap { case (c, i) =>
              // all-null file: no bounds for that column, never pruned on it
              if (r.isNullAt(2 + 2 * i) || r.isNullAt(3 + 2 * i)) None
              else Some(c -> (r.getDouble(2 + 2 * i), r.getDouble(3 + 2 * i)))
            }.toMap
            name -> (r.getLong(1), per)
          }.toMap
      }
    // Per-file BLOOM membership of one column, for point-lookup pruning
    // where min/max ranges cannot discriminate (an unclustered table's
    // every file spans the whole key domain). One extra pass over the
    // staged output — k probe positions per value, exploded, deduped
    // distributedly (≤ m distinct positions per file reach the driver,
    // never a per-row set) — and the bitset rides the add-action as a
    // base64url token: reads prune at file-LISTING time, no data touched.
    val fileBlooms: Map[String, String] = bloom match {
      case None => Map.empty
      case Some((c, m)) =>
        require(c.matches("[A-Za-z0-9_]+"),
          s"bloom column must be a plain identifier: $c")
        require(m >= 64 && m <= (1 << 24), s"bloom bits out of range: $m")
        if (parts.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.functions.{array, col, collect_set,
            explode, input_file_name, lit, pmod, xxhash64}
          val probes = array((0 until BloomK).map(i =>
            pmod(xxhash64(col("__v"), lit(i)), lit(m.toLong))): _*)
          spark.read.parquet(staging.toString)
            .select(input_file_name().as("__f"),
                    col(c).cast("string").as("__v"))
            .where(col("__v").isNotNull)
            .select(col("__f"), explode(probes).as("__p"))
            .groupBy("__f").agg(collect_set(col("__p")).as("__ps"))
            .collect()
            .map { r =>
              val name = Paths.get(new java.net.URI(r.getString(0)).getPath)
                .getFileName.toString
              val bits = new Array[Byte]((m + 7) / 8)
              r.getSeq[Long](1).foreach { p =>
                val j = p.toInt
                bits(j >> 3) = (bits(j >> 3) | (1 << (j & 7))).toByte
              }
              name -> (s"$c:$m:$BloomK:" + java.util.Base64.getUrlEncoder
                .withoutPadding.encodeToString(bits))
            }.toMap
        }
    }
    val acts = parts.map { p =>
      val name = s"${UUID.randomUUID()}.parquet"
      Files.move(p, dataDir(table).resolve(name))
      val (nRows, per) = fileStats.getOrElse(p.getFileName.toString,
        (0L, Map.empty[String, (Double, Double)]))
      val (lo, hi) = indexCol.flatMap(per.get)
        .getOrElse((Double.NaN, Double.NaN))
      val zone = if (statsCols.isEmpty) Map.empty[String, (Double, Double)]
                 else per.filter { case (c, _) => statsCols.contains(c) }
      Action("add", s"data/$name", nRows, lo, hi, zone,
        fileBlooms.getOrElse(p.getFileName.toString, ""))
    }
    // staging dir now holds only _SUCCESS etc.
    LocalStore.list(staging).foreach(Files.delete)
    Files.delete(staging)
    acts
  }

  /** Stage row-level change files (the frame already carries
    * `_change_type`): same immutable uuid-file mechanics as [[stage]],
    * committed as `cdc` actions — never part of the live set, protected
    * by vacuum within the retention window like any window file. */
  private def stageChanges(spark: SparkSession, table: String,
                           df: DataFrame): Seq[Action] =
    stage(spark, table, df).map(_.copy(op = "cdc"))

  /** The optimistic commit loop. `readVersion` is the snapshot the caller
    * planned against (-1 for blind appends). Returns the version the
    * commit landed at. */
  private def commit(table: String, actions: Seq[Action], readVersion: Long,
                     store: LogStore, maxAttempts: Int = 50): Long = {
    Files.createDirectories(logDir(table))
    // dvremove participates in remove-vs-remove conflicts (two racing
    // compactions retiring the same sidecar must not both land), so it
    // joins the remove-set here; it is NEVER read as table rows though —
    // the CDC restore branch collects op == "remove" only.
    val removes = actions.collect {
      case a if a.op == "remove" || a.op == "dvremove" => a.path }.toSet
    val dvRefs = actions.collect { case a if a.op == "dvref" => a.path }.toSet
    val ourAdds = actions.exists(_.op == "add")
    val txns = actions.collect { case a if a.op == "txn" => (a.path, a.rows) }
    val ourMetaFields: Seq[(String, org.apache.spark.sql.types.DataType)] =
      actions.collect { case a if a.op == "meta" => a.path }
        .flatMap(tok => tokenToSchema(tok).fields.map(f => f.name -> f.dataType))
    var attempt = 0
    var target = math.max(latestVersion(table, store), readVersion) + 1
    while (attempt < maxAttempts) {
      // Conflict check against every commit that landed after our read
      // snapshot (they won earlier races): a rewrite only commutes if its
      // remove-set is still fully live, and a txn-marked append must not
      // land twice for the same (app, batch) — the rule that makes
      // retried streaming batches exactly-once even when the retry RACES
      // the original (both stage, both reach here; the loser of the
      // version race sees the winner's txn marker and aborts).
      if (removes.nonEmpty || dvRefs.nonEmpty || txns.nonEmpty || ourMetaFields.nonEmpty) {
        ((readVersion + 1) until target).foreach { v =>
          val theirs = decode(store.read(versionFile(table, v)))
          val theirRemoves = theirs.collect {
            case a if a.op == "remove" || a.op == "dvremove" => a.path }.toSet
          val clash = removes.intersect(theirRemoves)
          if (clash.nonEmpty)
            throw new ConcurrentRewriteException(
              s"commit v$v already removed ${clash.head} (+${clash.size - 1} more) — " +
                s"rewrite planned at v$readVersion is stale, re-plan from a fresh snapshot")
          // deletion-vector races: DV-vs-rewrite conflicts BOTH ways — a
          // racer that removed a file our DV masks leaves our row positions
          // pointing at nothing (the delete would be silently lost in its
          // rewrite), and a racer that masked a file we are removing wrote
          // deletes our rewrite's output does not reflect. DV-vs-DV is
          // decided below on whether either commit appends.
          val theirDvRefs = theirs.collect { case a if a.op == "dvref" => a.path }.toSet
          // DV-vs-DV: two pure dv-DELETES commute (reads apply the UNION of
          // live masks and masking an already-masked position is
          // idempotent), but a dv commit that also APPENDS rows
          // (updateWhereDv / mergeIntoDv / applyChangesDv) is a
          // read-modify-write: two racers updating the same key from the
          // same snapshot would BOTH mask the old row and BOTH append a new
          // one (duplicate live rows for one key), and a dv-delete racing a
          // dv-update of the same row would have its delete silently
          // overridden by the update's appended postimage. So dvref-vs-dvref
          // conflicts whenever EITHER commit carries adds — the same
          // file-granularity conservatism remove-vs-remove already applies
          // (disjoint-key racers on a shared file re-plan and land on retry).
          val theirAdds = theirs.exists(_.op == "add")
          val dvDv = dvRefs.intersect(theirDvRefs)
          if (dvDv.nonEmpty && (ourAdds || theirAdds))
            throw new ConcurrentRewriteException(
              s"commit v$v also masked rows of ${dvDv.head} (+${dvDv.size - 1} more) " +
                s"and ${if (theirAdds) "appended replacement rows" else "raced our appended rows"} — " +
                s"merge-on-read DML planned at v$readVersion is stale, re-plan from a fresh snapshot")
          val staleDv = dvRefs.intersect(theirRemoves)
          if (staleDv.nonEmpty)
            throw new ConcurrentRewriteException(
              s"commit v$v already removed ${staleDv.head} (+${staleDv.size - 1} more) — " +
                s"deletion vector planned at v$readVersion masks stale row positions, " +
                "re-plan from a fresh snapshot")
          val lostDv = removes.intersect(theirDvRefs)
          if (lostDv.nonEmpty)
            throw new ConcurrentRewriteException(
              s"commit v$v added a deletion vector over ${lostDv.head} " +
                s"(+${lostDv.size - 1} more) — rewrite planned at v$readVersion would " +
                "drop its deletes, re-plan from a fresh snapshot")
          val theirTxns = theirs.collect { case a if a.op == "txn" => (a.path, a.rows) }.toMap
          txns.foreach { case (app, b) =>
            if (theirTxns.getOrElse(app, -1L) >= b)
              throw new TxnAlreadyApplied(app, b, v)
          }
          // schema races: a racer introducing the SAME column with a
          // DIFFERENT type can't union — surface the typed conflict on
          // the loser instead of poisoning replay for every reader
          theirs.collect { case a if a.op == "meta" => a.path }
            .foreach { tok =>
              val theirFields = tokenToSchema(tok).fields.map(f => f.name -> f.dataType).toMap
              ourMetaFields.foreach { case (name, dt) =>
                // nullability-only differences widen at replay (mergeSchema);
                // only a STRUCTURAL mismatch is the race loser's conflict
                theirFields.get(name).filter(_ != dt).foreach { theirDt =>
                  try { widenNullability(name, theirDt, dt); () }
                  catch {
                    case _: SchemaConflictException =>
                      throw new SchemaConflictException(
                        s"commit v$v added column $name: ${theirDt.simpleString} vs " +
                          s"our ${dt.simpleString} — evolution is additive-only")
                  }
                }
              }
            }
        }
      }
      if (store.putIfAbsent(versionFile(table, target), encode(actions)))
        return target
      // Lost the race: someone owns `target` now. Rebase to the new tip
      // (conflict window widens to include the commit(s) that beat us).
      target = latestVersion(table, store) + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit to $table failed $maxAttempts races in a row — livelock guard")
  }

  /** Multi-writer append: stage, then commit adds-only (commutes with
    * every concurrent commit, so the rebase loop never conflicts — under
    * contention every append lands, each at its own version). */
  def append(spark: SparkSession, table: String, df: DataFrame,
             store: LogStore = LocalStore): Long = {
    val (tip, meta) = metaFor(table, df, store)
    commit(table, infoAct("append") +: meta +:
      stage(spark, table, df, checks = checksAt(table, store)),
      readVersion = tip, store)
  }

  /** Atomic CREATE: stage the frame, then claim EXACTLY version 0 with one
    * `putIfAbsent` — never the rebase loop, so two racing creators cannot
    * both land (the r17 ADVICE hole in SaveMode.ErrorIfExists/Ignore: a
    * check-then-append pair lets both racers see exists=false and both
    * append, silently merging the loser's rows into the winner's table).
    * Returns Some(0) iff THIS call created the table; None if any other
    * commit owns v0 — the caller maps None to its SaveMode contract
    * (typed already-exists error for ErrorIfExists, no-op for Ignore).
    * A lost race deletes the staged files: they are uuid-named and
    * unreferenced, so the cleanup can never touch another writer's data. */
  def createOnly(spark: SparkSession, table: String, df: DataFrame,
                 indexCol: Option[String] = None,
                 store: LogStore = LocalStore): Option[Long] = {
    Files.createDirectories(logDir(table))
    if (latestVersion(table, store) >= 0) return None // fast path: no staging
    val meta = Action("meta", schemaToken(df.schema), 0L)
    val adds = stage(spark, table, df, indexCol)
    if (store.putIfAbsent(versionFile(table, 0L),
        encode(infoAct("append") +: meta +: adds)))
      Some(0L)
    else {
      adds.foreach(a => Files.deleteIfExists(Paths.get(table, a.path)))
      None
    }
  }

  /** INSERT OVERWRITE as ONE atomic commit: stage the frame, then commit
    * remove(every live file at the read snapshot) + dvremove(every live
    * sidecar — masks die with the data they masked) + add(staged). A
    * reader sees the old table or the new one, never a mix; time travel
    * keeps the pre-overwrite versions; the removes make a racing
    * rewrite/DV commit surface as the typed conflict, while a racing
    * APPEND commutes and its rows SURVIVE the overwrite (it was not in
    * the snapshot being replaced — the same write-serializable rule the
    * public lakehouse formats apply to blind appends vs overwrite).
    *
    * Schema stays ADDITIVE-union like every commit (an overwrite
    * replaces DATA, not history: columns the table ever carried still
    * read as NULL where absent, and a same-name-different-type frame
    * still throws before staging). CHECK constraints validate the new
    * rows. With CDC on (property or flag) the commit records the old
    * rows as `delete` and the new as `insert` change files — without
    * them a CDC consumer would hit the typed gap, since an overwrite is
    * a row mutation, not a reorganization. Pass `indexCol` to record
    * data-skipping bounds on the new files. Returns the commit version. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame,
                indexCol: Option[String] = None,
                cdc: Boolean = false,
                store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.lit
    val (tip, meta) = metaFor(table, df, store)
    if (tip < 0) // nothing to replace: an overwrite of no table is a create
      return commit(table, infoAct("append") +: meta +:
        stage(spark, table, df, indexCol), readVersion = -1L, store)
    val st = replay(table, tip, store)
    val adds = stage(spark, table, df, indexCol,
      checks = constraintsOf(st.props))
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn || st.live.isEmpty) Nil
      else {
        // old rows retract, new rows insert — both sides full-fidelity.
        // The new side re-reads the STAGED files (not the input plan), so
        // a non-deterministic frame cannot make the feed diverge from
        // the table (the stage-time CHECK rationale, applied to CDC).
        val oldRows = maskedRead(spark, table, st, st.live.toSeq)
          .withColumn("_change_type", lit("delete"))
        // An empty frame can stage ZERO files (a truncate-shaped
        // overwrite); reading an empty path list throws schema-inference
        // errors, and the correct feed there is pure retraction anyway
        // (r17 ADVICE).
        val feed =
          if (adds.isEmpty) oldRows
          else oldRows.unionByName(
            spark.read.parquet(
                adds.map(a => Paths.get(table, a.path).toString): _*)
              .withColumn("_change_type", lit("insert")),
            allowMissingColumns = true)
        stageChanges(spark, table, feed)
      }
    val removes = st.live.toSeq.map(Action("remove", _, 0L)) ++
      st.dvs.toSeq.map(p => Action("dvremove", p, st.dvRowsOf.getOrElse(p, 0L)))
    commit(table, infoAct("overwrite") +: meta +: (removes ++ adds ++ cdcActs),
      readVersion = tip, store)
  }

  /** Append with data-skipping stats: each staged file's add-action
    * carries the min/max of `indexCol`, so [[readWhere]] on that column
    * prunes non-overlapping files at file-LISTING time — no footer read,
    * no task launched. Cluster the frame first
    * (`df.repartitionByRange(n, col(indexCol))`) so files cover disjoint
    * ranges and a selective predicate keeps O(1) of them; unclustered
    * appends still work, they just prune less (every file's range spans
    * the domain). This is the commit-log analog of the engine's bucket
    * partitioning everywhere else: metadata, not data, bounds the scan. */
  def appendIndexed(spark: SparkSession, table: String, df: DataFrame,
                    indexCol: String, store: LogStore = LocalStore): Long = {
    val (tip, meta) = metaFor(table, df, store)
    commit(table, infoAct("append") +: meta +:
      stage(spark, table, df, Some(indexCol), checks = checksAt(table, store)),
      readVersion = tip, store)
  }

  /** Live files whose recorded index bounds overlap `[lo, hi]`, plus any
    * file with no recorded bounds (conservative: unknown = read it).
    * Exposed so specs assert pruning on the deterministic FILE COUNT, not
    * on byte metrics. */
  def prunedFiles(table: String, lo: Double, hi: Double,
                  store: LogStore = LocalStore): Seq[String] = {
    val tip = latestVersion(table, store)
    val st = replay(table, tip, store)
    st.live.toSeq.filter { p =>
      st.bounds.get(p).forall { case (flo, fhi) => fhi >= lo && flo <= hi }
    }
  }

  /** Range read with file skipping: open only the files [[prunedFiles]]
    * keeps, then apply the EXACT predicate — bounds select files, the
    * filter selects rows, so the result is identical to a full scan with
    * the same predicate regardless of how (or whether) the table was
    * clustered. */
  def readWhere(spark: SparkSession, table: String, indexCol: String,
                lo: Double, hi: Double,
                store: LogStore = LocalStore): DataFrame = {
    import org.apache.spark.sql.functions.col
    val st = replay(table, latestVersion(table, store), store)
    val files = st.live.toSeq.filter { p =>
      st.bounds.get(p).forall { case (flo, fhi) => fhi >= lo && flo <= hi }
    }
    if (files.isEmpty) {
      // schema-stable empty result: read the live set's schema, keep no rows
      read(spark, table, None, store).where(org.apache.spark.sql.functions.lit(false))
    } else {
      maskedRead(spark, table, st, files)
        .where(col(indexCol) >= lo && col(indexCol) <= hi)
    }
  }

  /** Z-order clustered append with a multi-column zonemap: interleave the
    * cluster columns' low bits ([[Layout.zvalueN]]), range-partition on
    * the z-value into ~`files` files, and record per-file min/max of
    * EVERY cluster column in the commit ([[Action.stats]]). Because
    * z-order keeps each file's bounding box small on ALL interleaved
    * dimensions at once, [[readWhereBox]] then prunes on any combination
    * of them — the commit-log form of OPTIMIZE ZORDER BY, and the 100 TB
    * answer to "my scans filter on two columns": one layout serves both
    * predicates instead of one partition key serving one.
    *
    * The z-value interleaves 16 masked bits per column — layout quality
    * degrades gracefully if a domain outgrows the mask (values wrap into
    * shared z-cells) but PRUNING stays exact: the recorded stats are true
    * min/max of the raw values. Cluster columns must be numeric. */
  def appendClustered(spark: SparkSession, table: String, df: DataFrame,
                      clusterCols: Seq[String], files: Int,
                      store: LogStore = LocalStore): Long = {
    require(clusterCols.nonEmpty, "appendClustered needs cluster columns")
    val (tip, meta) = metaFor(table, df, store)
    commit(table, infoAct("append") +: meta +: stage(spark, table,
      zcluster(df, clusterCols, files), None, clusterCols,
      checks = checksAt(table, store)),
      readVersion = tip, store)
  }

  /** The shared clustering shuffle: one column range-partitions directly,
    * several interleave into a z-value first. The interleave width scales
    * down as columns are added (`min(16, 62 / N)` bits each) so ANY
    * column count fits one long — a 4-plus-column OPTIMIZE ZORDER is a
    * legitimate shape, and pruning stays EXACT regardless of width: the
    * recorded zonemap stats are raw min/max, the mask only shapes layout
    * quality. */
  private def zcluster(df: DataFrame, clusterCols: Seq[String],
                       files: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    if (clusterCols.size == 1)
      df.repartitionByRange(files, col(clusterCols.head))
    else {
      val bits = math.min(16, 62 / clusterCols.size)
      val mask = (1L << bits) - 1L
      // try_cast, not cast: under ANSI mode a NaN/Infinity row would fail
      // the whole clustering job, but layout is best-effort by contract
      // (pruning correctness comes from the recorded raw min/max, and a
      // NULL z-value just range-partitions into the null bucket)
      val masked = clusterCols.map(c =>
        org.apache.spark.sql.functions.expr(s"try_cast($c AS BIGINT)")
          .bitwiseAND(lit(mask)))
      df.withColumn("__z", Layout.zvalueN(masked, bits))
        .repartitionByRange(files, col("__z")).drop("__z")
    }
  }

  /** Live files whose recorded zonemap overlaps EVERY `[lo, hi]` range in
    * `box` (a file with no recorded stats for a queried column is kept —
    * conservative). Exposed so specs assert multi-dimension pruning on
    * deterministic file counts. */
  def prunedFilesBox(table: String, box: Map[String, (Double, Double)],
                     store: LogStore = LocalStore): Seq[String] = {
    val st = replay(table, latestVersion(table, store), store)
    st.live.toSeq.filter { p =>
      val zone = st.zones.getOrElse(p, Map.empty)
      box.forall { case (c, (lo, hi)) =>
        zone.get(c).forall { case (flo, fhi) => fhi >= lo && flo <= hi } }
    }
  }

  /** Multi-dimension box read: open only the files whose zonemap
    * overlaps the box on every queried column, then apply the exact
    * conjunctive predicate — identical to a full scan with the same
    * filter regardless of layout, just cheaper when [[appendClustered]]
    * kept the boxes tight. */
  def readWhereBox(spark: SparkSession, table: String,
                   box: Map[String, (Double, Double)],
                   store: LogStore = LocalStore): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val st = replay(table, latestVersion(table, store), store)
    val files = st.live.toSeq.filter { p =>
      val zone = st.zones.getOrElse(p, Map.empty)
      box.forall { case (c, (lo, hi)) =>
        zone.get(c).forall { case (flo, fhi) => fhi >= lo && flo <= hi } }
    }
    val exact = box.toSeq.sortBy(_._1)
      .map { case (c, (lo, hi)) => col(c) >= lo && col(c) <= hi }
      .reduceOption(_ && _).getOrElse(lit(true))
    if (files.isEmpty)
      read(spark, table, None, store).where(lit(false))
    else
      maskedRead(spark, table, st, files).where(exact)
  }

  /** Append with a per-file BLOOM filter on `bloomCol` — the point-lookup
    * complement to range stats: an unclustered table's every file spans
    * the whole key domain, so min/max keeps ALL of them for `key = x`,
    * while the bloom keeps O(1) files (plus a sizing-controlled false-
    * positive tail). Size `bits` at ~10× the expected DISTINCT keys per
    * file for ~1-2% false positives at the fixed k=4 probes; the bitset
    * costs bits/6 bytes of commit line per file (base64), which
    * checkpoints roll up like any other action metadata. Bloom pruning
    * NEVER misses: a file containing the key always tests positive (the
    * invariant BloomSkipSpec sweeps every key for). Values are hashed in
    * canonical string form: `CAST(col AS STRING)` at write, and at lookup
    * the probe value is cast through the COLUMN's type with a round-trip
    * guard ([[canonicalProbe]]) — a type-mismatched probe (`Double 11.0`
    * against bigint) canonicalizes to the written form, and one that
    * cannot be represented exactly disables pruning instead of silently
    * missing every file. */
  def appendBloomed(spark: SparkSession, table: String, df: DataFrame,
                    bloomCol: String, bits: Int = 1 << 17,
                    store: LogStore = LocalStore): Long = {
    val (tip, meta) = metaFor(table, df, store)
    commit(table, infoAct("append") +: meta +: stage(spark, table, df,
      checks = checksAt(table, store), bloom = Some((bloomCol, bits))),
      readVersion = tip, store)
  }

  /** Driver-side probe positions for `value` — MUST match the staged
    * job's `pmod(xxhash64(cast(col as string), i), m)` exactly, so the
    * catalyst XxHash64 expression (seed 42, same as the SQL function) is
    * evaluated directly instead of reimplementing the hash. */
  private def bloomProbes(value: String, m: Long, k: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (0 until k).map { i =>
      val h = XxHash64(Seq(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(value),
          org.apache.spark.sql.types.StringType),
        Literal(i)), 42L).eval(null).asInstanceOf[Long]
      val p = h % m
      (if (p < 0) p + m else p).toInt
    }
  }

  /** Canonical string form of a point-lookup probe value — the form the
    * WRITE side hashed (`CAST(col AS STRING)`), reached THROUGH the
    * column's log-carried type. `String.valueOf` alone is a bloom false
    * negative factory (the r16 advisory's finding): probing a bigint
    * column with `Double 11.0` stringifies as `"11.0"` while the writer
    * hashed `"11"`, so every probe misses, every file is pruned, and the
    * lookup silently returns empty even though `col === lit(11.0)` would
    * match. So: cast the value to the column's type (TRY semantics —
    * never throws), and only trust the result when it ROUND-TRIPS back to
    * the original value exactly (a probe of `11.5` against bigint
    * truncates to 11, fails the round trip, and disables pruning instead
    * of probing the wrong key). `None` = cannot canonicalize exactly →
    * the caller keeps ALL files (pruning is an optimization, never a
    * filter). A legacy log with no typed schema falls back to the raw
    * string form — exact for the same-typed int/string probes it always
    * served. */
  private[sources] def canonicalProbe(st: State, column: String, value: Any): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    import org.apache.spark.sql.types.StringType
    st.schemaStruct.flatMap(_.fields.find(_.name == column)).map(_.dataType) match {
      case None => Some(String.valueOf(value))
      case Some(dt) =>
        scala.util.Try {
          val lit = Literal(value)
          if (lit.dataType == dt)
            Option(Cast(lit, StringType, None, EvalMode.TRY).eval(null)).map(_.toString)
          else {
            val cv = Cast(lit, dt, None, EvalMode.TRY).eval(null)
            if (cv == null) None
            else {
              val back = Cast(Literal(cv, dt), lit.dataType, None, EvalMode.TRY).eval(null)
              if (back != lit.value) None
              else Option(Cast(Literal(cv, dt), StringType, None, EvalMode.TRY).eval(null))
                .map(_.toString)
            }
          }
        }.toOption.flatten // an unrepresentable value/type: no pruning
    }
  }

  /** The files a point lookup must open: bloom-negative files are
    * dropped; files with no bloom, or a bloom on a DIFFERENT column, are
    * kept, and a probe value that cannot be canonicalized to the write
    * side's hashed form keeps EVERYTHING (conservative — pruning is an
    * optimization, never a filter). */
  private[sources] def bloomKeeps(st: State, column: String, value: Any): Seq[String] =
    canonicalProbe(st, column, value) match {
      case None => st.live.toSeq
      case Some(canon) =>
        st.live.toSeq.filter { p =>
          st.blooms.get(p) match {
            case None => true
            case Some(tok) =>
              val Array(c, mS, kS, b64) = tok.split(":", 4)
              c != column || {
                val bits = java.util.Base64.getUrlDecoder.decode(b64)
                bloomProbes(canon, mS.toLong, kS.toInt)
                  .forall(j => (bits(j >> 3) & (1 << (j & 7))) != 0)
              }
          }
        }
    }

  /** Live files a `column = value` lookup keeps after bloom pruning —
    * exposed so specs assert skipping on deterministic counts. */
  def prunedFilesBloom(table: String, column: String, value: Any,
                       store: LogStore = LocalStore): Seq[String] =
    bloomKeeps(replay(table, latestVersion(table, store), store),
      column, value)

  /** Point-lookup read: open only the bloom-positive files, then apply
    * the exact typed equality (so a false positive costs one extra file
    * scan, never a wrong row) — identical to a full scan with the same
    * predicate, just O(1) files instead of O(table). Deletion vectors
    * apply as on every read. */
  def readWhereEquals(spark: SparkSession, table: String,
                      column: String, value: Any,
                      store: LogStore = LocalStore): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(value != null, "point lookup of NULL is never true under SQL equality")
    val st = replay(table, latestVersion(table, store), store)
    val files = bloomKeeps(st, column, value)
    if (files.isEmpty)
      read(spark, table, None, store).where(lit(false))
    else
      maskedRead(spark, table, st, files).where(col(column) === lit(value))
  }

  /** Idempotent append keyed by (appId, batchId) — the exactly-once
    * primitive for streaming sinks (use from `foreachBatch`): the commit
    * carries a `txn` marker, replay tracks the per-app high-water mark,
    * and a batch at or below it is skipped WITHOUT staging. A retry that
    * races the original is also safe: both may stage, but the version
    * race serializes them and the loser's conflict check finds the
    * winner's marker (the loser's staged files stay invisible and are
    * vacuumed later). Returns the commit version, or -1 if skipped.
    *
    * `appId` names the writing pipeline (quote-free token; it is embedded
    * in the commit JSON), `batchId` must be monotone per app — exactly
    * what Structured Streaming's `foreachBatch` hands its function. */
  def appendOnce(spark: SparkSession, table: String, df: DataFrame,
                 appId: String, batchId: Long,
                 indexCol: Option[String] = None,
                 store: LogStore = LocalStore): Long = {
    require(appId.matches("[A-Za-z0-9_.-]+"), s"appId must be a plain token: $appId")
    // a negative batch id would encode as `"rows":-N`, which the line
    // codec's (\d+) decode rejects — reject it HERE, before it can land
    // in a commit and poison every subsequent read of the table
    require(batchId >= 0, s"batchId must be non-negative: $batchId")
    // The high-water check covers every commit ≤ tip, so the commit's
    // conflict scan starts AFTER tip — it only ever reads the commits
    // that raced this one, never the table's history.
    val tip = latestVersion(table, store)
    val checks: Map[String, String] =
      if (tip < 0) Map.empty
      else {
        val st = replay(table, tip, store)
        if (st.txns.getOrElse(appId, -1L) >= batchId) return -1L
        st.mergeSchema(df.schema) // typed conflict BEFORE staging
        constraintsOf(st.props)
      }
    val acts = (infoAct("append") +: Action("meta", schemaToken(df.schema), 0L) +:
      stage(spark, table, df, indexCol, checks = checks)) :+ Action("txn", appId, batchId)
    try commit(table, acts, readVersion = tip, store)
    catch { case _: TxnAlreadyApplied => -1L }
  }

  /** Copy-on-write row deletion (the right-to-be-forgotten primitive a
    * training corpus needs): rewrite ONLY the files that contain matching
    * rows, dropping them; untouched files are not rewritten, not even
    * read twice. One job finds the affected files (live scan keyed by
    * `input_file_name`), one rewrite job per delete covers them, and the
    * commit is remove(affected)+add(rewritten) — so a racing delete or
    * compaction of the same files surfaces as the typed
    * [[ConcurrentRewriteException]], and time travel still shows the
    * pre-delete rows (physical erasure completes when vacuum retention
    * passes the delete version).
    *
    * SQL DELETE semantics: rows where the predicate is NULL survive
    * (the keep-filter is `NOT coalesce(pred, false)`). Pass `indexCol`
    * to re-record data-skipping bounds on the rewritten files. With
    * `cdc = true` the commit also carries a change file of the deleted
    * rows (`_change_type = 'delete'`) for [[readChangesCdc]] consumers.
    * Returns the commit version, or -1 if nothing matched (no commit). */
  def deleteWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column,
                  indexCol: Option[String] = None,
                  cdc: Boolean = false,
                  store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, not}
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to delete from in $table")
    // the log schema applies here too: the predicate may reference a
    // column added AFTER some live files were written (NULL there)
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val files = st.live.toSeq
    val paths = files.map(f => Paths.get(table, f).toString)
    // On a DV-carrying table the discovery scan and the rewrite read both
    // go through the mask: a dv-deleted row must neither trigger a rewrite
    // nor be resurrected by one (input_file_name is unusable after the
    // mask join — the metadata file-name column is the same identity,
    // captured at scan time).
    val affectedNames =
      if (st.dvs.isEmpty)
        reader.parquet(paths: _*)
          .where(coalesce(predicate, lit(false)))
          .select(input_file_name().as("f")).distinct().collect()
          .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath)
            .getFileName.toString).toSet
      else
        dvMaskKeyed(spark, table, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
          .where(coalesce(predicate, lit(false)))
          .select(DvFile).distinct().collect()
          .map(_.getString(0)).toSet
    if (affectedNames.isEmpty) return -1L
    val affected = files.filter(f =>
      affectedNames.contains(Paths.get(f).getFileName.toString))
    val affectedDf = maskedRead(spark, table, st, affected)
    val survivors = affectedDf.where(not(coalesce(predicate, lit(false))))
    val adds = stage(spark, table, survivors, indexCol)
    // the cdc table property makes change recording a TABLE decision, not
    // a per-call one — a forgotten flag can no longer starve the feed
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else stageChanges(spark, table,
        affectedDf.where(coalesce(predicate, lit(false)))
          .withColumn("_change_type", lit("delete")))
    val removes = affected.map(Action("remove", _, 0L))
    commit(table, infoAct("delete") +: (removes ++ adds ++ cdcActs),
      readVersion = version, store)
  }

  /** Merge-on-read row deletion via a DELETION VECTOR — the scale path for
    * SPARSE deletes that [[deleteWhere]]'s copy-on-write cannot afford: at
    * 100 TB, deleting 0.1% of rows scattered across the table rewrites
    * terabytes under copy-on-write, while this writes ONE tiny sidecar of
    * (file, position) pairs and leaves every data file untouched. The
    * public precedent is Iceberg's position-delete files / Delta's
    * deletion vectors; the Spark-first realization is parquet's hidden
    * `_metadata.file_name` / `row_index` columns plus a broadcast
    * anti-join on every subsequent read ([[maskedRead]]).
    *
    * Semantics are identical to [[deleteWhere]] from a reader's view:
    * NULL-predicate rows survive; time travel to a pre-delete version
    * shows the rows back; with CDC on (the `cdc=true` table property or
    * the flag) the commit carries the deleted rows as change files, so
    * the row-level feed is full-fidelity either way the delete ran.
    * Already-masked rows are not re-deleted (the predicate scan itself
    * reads through the mask), so repeating a delete is a no-commit no-op.
    *
    * Commit shape: `dv` (the sidecar — live state, replayed, carried by
    * checkpoints, protected by vacuum) + one `dvref` per masked data file
    * (conflict metadata: a racing rewrite of a referenced file conflicts
    * BOTH ways, while DV-over-DV commutes — see [[commit]]). Reads stay
    * cheap while the mask is small; [[compact]] materializes and retires
    * all sidecars. Returns the commit version, or -1 if nothing matched. */
  def deleteWhereDv(spark: SparkSession, table: String,
                    predicate: org.apache.spark.sql.Column,
                    cdc: Boolean = false,
                    store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to delete from in $table")
    val reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val paths = st.live.toSeq.map(f => Paths.get(table, f).toString)
    // one masked scan finds the doomed positions; pinned so the sidecar,
    // the per-file refs and the CDC rows all see the SAME row set even
    // under a non-deterministic predicate
    val hits = dvMaskKeyed(spark, table, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
      .where(coalesce(predicate, lit(false)))
      .localCheckpoint()
    val perFile = hits.groupBy(DvFile).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (perFile.isEmpty) return -1L
    val dvActs = stage(spark, table,
        hits.select(col(DvFile).as("file"), col(DvPos).as("pos"))
          .repartition(1))
      .map(_.copy(op = "dv"))
    val dvRefActs = perFile.sortBy(_._1).map { case (name, n) =>
      Action("dvref", s"data/$name", n)
    }.toSeq
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else stageChanges(spark, table,
        hits.drop(DvFile, DvPos).withColumn("_change_type", lit("delete")))
    commit(table, infoAct("deletedv") +: (dvActs ++ dvRefActs ++ cdcActs),
      readVersion = version, store)
  }

  /** Merge-on-read UPDATE: the [[updateWhere]] semantics at
    * [[deleteWhereDv]] cost — old versions of the matched rows are masked
    * by a deletion vector and the updated rows are APPENDED, so a sparse
    * update never rewrites a data file. SET right-hand sides evaluate
    * against the OLD row; NULL-predicate rows are not updated; the
    * appended rows are validated against the table's CHECK constraints;
    * CDC records `update_preimage`/`update_postimage` change rows. The
    * commit is `dv` + `dvref` + `add` — no removes, so concurrent appends
    * commute and a racing rewrite of a masked file hits the typed
    * conflict. Returns the commit version, or -1 if nothing matched. */
  def updateWhereDv(spark: SparkSession, table: String,
                    predicate: org.apache.spark.sql.Column,
                    set: Map[String, org.apache.spark.sql.Column],
                    cdc: Boolean = false,
                    store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(set.nonEmpty, "updateWhereDv needs at least one SET column")
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to update in $table")
    set.keys.foreach(c => require(
      st.schemaStruct.forall(_.fieldNames.contains(c)),
      s"SET column $c is not a table column — UPDATE cannot add columns (use append/merge evolution)"))
    val reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val paths = st.live.toSeq.map(f => Paths.get(table, f).toString)
    val hits = dvMaskKeyed(spark, table, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
      .where(coalesce(predicate, lit(false)))
      .localCheckpoint()
    val perFile = hits.groupBy(DvFile).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (perFile.isEmpty) return -1L
    val matched = hits.drop(DvFile, DvPos)
    // RHS over the OLD row, exactly updateWhere's projection rule
    val post = matched.select(matched.columns.map { c =>
      set.get(c).map(_.as(c)).getOrElse(col(c))
    }.toSeq: _*)
    val dvActs = stage(spark, table,
        hits.select(col(DvFile).as("file"), col(DvPos).as("pos"))
          .repartition(1))
      .map(_.copy(op = "dv"))
    val dvRefActs = perFile.sortBy(_._1).map { case (name, n) =>
      Action("dvref", s"data/$name", n)
    }.toSeq
    val adds = stage(spark, table, post, checks = constraintsOf(st.props))
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else stageChanges(spark, table,
        matched.withColumn("_change_type", lit("update_preimage"))
          .unionByName(post.withColumn("_change_type", lit("update_postimage")),
            allowMissingColumns = true))
    commit(table, infoAct("updatedv") +: (dvActs ++ dvRefActs ++ adds ++ cdcActs),
      readVersion = version, store)
  }

  /** Merge-on-read MERGE (upsert): [[mergeInto]] semantics — `WHEN
    * MATCHED THEN UPDATE SET *` / `WHEN NOT MATCHED THEN INSERT *` on
    * `keyCols` — at deletion-vector cost: the matched keys' OLD rows are
    * masked by one (file, position) sidecar and ALL source rows are
    * appended, so a CDC batch touching a million scattered keys on a
    * 100 TB table writes one sidecar + one append instead of rewriting
    * every file that holds a matched key. Same contracts as mergeInto:
    * duplicate-key sources rejected (ANSI's ambiguous-match rule), NULL
    * keys never match, additive schema evolution with the typed
    * conflict before staging, CHECK constraints validate the appended
    * rows, CDC records preimage/postimage/insert change rows. The
    * commit is `dv` + `dvref` + `add` — no removes, so concurrent
    * appends commute and a racing rewrite of a masked file hits the
    * typed conflict. Returns the commit version. */
  def mergeIntoDv(spark: SparkSession, table: String, source: DataFrame,
                  keyCols: Seq[String], cdc: Boolean = false,
                  store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{col, count, lit}
    require(keyCols.nonEmpty, "mergeIntoDv needs at least one key column")
    val version = latestVersion(table, store)
    require(version >= 0, s"$table does not exist — append first")
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to merge into in $table")
    st.mergeSchema(source.schema) // typed conflict BEFORE staging
    val src = source.localCheckpoint()
    val dup = src.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(1).count()
    require(dup == 0L,
      s"source has duplicate keys on (${keyCols.mkString(", ")}) — MERGE match is ambiguous")
    val keys = src.select(keyCols.map(col): _*)
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val paths = st.live.toSeq.map(f => Paths.get(table, f).toString)
    // matched OLD rows through the existing mask, with their positions —
    // pinned: the sidecar, the refs and the CDC preimages must agree
    val hits = dvMaskKeyed(spark, table, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
      .join(keys, keyCols, "left_semi")
      .localCheckpoint()
    val perFile = hits.groupBy(DvFile).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val dvActs =
      if (perFile.isEmpty) Nil // pure insert: no file holds a matching key
      else stage(spark, table,
          hits.select(col(DvFile).as("file"), col(DvPos).as("pos"))
            .repartition(1))
        .map(_.copy(op = "dv"))
    val dvRefActs = perFile.sortBy(_._1).map { case (name, n) =>
      Action("dvref", s"data/$name", n)
    }.toSeq
    val meta = Action("meta", schemaToken(src.schema), 0L)
    val adds = stage(spark, table, src, checks = constraintsOf(st.props))
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else {
        val matched = hits.drop(DvFile, DvPos)
        val matchedKeys = matched.select(keyCols.map(col): _*)
        val pre = matched.withColumn("_change_type", lit("update_preimage"))
        val post = src.join(matchedKeys, keyCols, "left_semi")
          .withColumn("_change_type", lit("update_postimage"))
        val ins = src.join(matchedKeys, keyCols, "left_anti")
          .withColumn("_change_type", lit("insert"))
        stageChanges(spark, table,
          pre.unionByName(post, allowMissingColumns = true)
            .unionByName(ins, allowMissingColumns = true))
      }
    commit(table,
      (infoAct("mergedv") +: meta +: (dvActs ++ dvRefActs)) ++ adds ++ cdcActs,
      readVersion = version, store)
  }

  /** Copy-on-write UPDATE: `UPDATE <table> SET col = expr, ... WHERE
    * pred` — the log-layer form of the reference's UPDATE dispatch
    * (process.py:339-366), completing the DML square (INSERT = append,
    * DELETE = [[deleteWhere]], MERGE = [[mergeInto]]). Same
    * copy-on-write discipline as DELETE: one `input_file_name`-keyed job
    * finds the files holding matching rows, ONLY those are rewritten —
    * matching rows projected through `set`, non-matching rows copied
    * verbatim — and the commit is remove(affected)+add(rewritten), so
    * racing rewrites hit the typed conflict and time travel keeps the
    * pre-update rows. SQL semantics: a NULL predicate row is NOT
    * updated. `set` expressions may reference any existing column (the
    * right-hand sides evaluate against the OLD row, as SQL requires).
    * With `cdc = true` the commit carries `update_preimage` /
    * `update_postimage` change rows. Returns the commit version, or -1
    * if nothing matched (no commit). */
  def updateWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column],
                  indexCol: Option[String] = None,
                  cdc: Boolean = false,
                  store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, when}
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to update in $table")
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    set.keys.foreach(c => require(
      st.schemaStruct.forall(_.fieldNames.contains(c)) ,
      s"SET column $c is not a table column — UPDATE cannot add columns (use append/merge evolution)"))
    val files = st.live.toSeq
    val paths = files.map(f => Paths.get(table, f).toString)
    val hit = coalesce(predicate, lit(false))
    // masked discovery + masked rewrite on a DV-carrying table — same
    // discipline as deleteWhere (a dv-deleted row is not a row)
    val affectedNames =
      if (st.dvs.isEmpty)
        reader.parquet(paths: _*)
          .where(hit)
          .select(input_file_name().as("f")).distinct().collect()
          .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath)
            .getFileName.toString).toSet
      else
        dvMaskKeyed(spark, table, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
          .where(hit)
          .select(DvFile).distinct().collect()
          .map(_.getString(0)).toSet
    if (affectedNames.isEmpty) return -1L
    val affected = files.filter(f =>
      affectedNames.contains(Paths.get(f).getFileName.toString))
    val affectedDf = maskedRead(spark, table, st, affected)
    // every RHS evaluates against the OLD row: all `when`s are built over
    // the same input projection, never over each other's outputs
    val rewritten = affectedDf.select(affectedDf.columns.map { c =>
      set.get(c) match {
        case Some(rhs) => when(hit, rhs).otherwise(col(c)).as(c)
        case None      => col(c)
      }
    }.toSeq: _*)
    // UPDATE can introduce new values: the rewritten files must satisfy
    // the table's CHECK constraints (survivor rows trivially pass — they
    // passed on their own write — so this only ever rejects SET output)
    val adds = stage(spark, table, rewritten, indexCol,
      checks = constraintsOf(st.props))
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else {
        // both images derive from the matched OLD rows — re-filtering the
        // rewritten frame would be wrong when SET touches a predicate column
        val matched = affectedDf.where(hit)
        val pre = matched.withColumn("_change_type", lit("update_preimage"))
        val post = matched.select(affectedDf.columns.map { c =>
          set.get(c).map(_.as(c)).getOrElse(col(c))
        }.toSeq: _*).withColumn("_change_type", lit("update_postimage"))
        stageChanges(spark, table,
          pre.unionByName(post, allowMissingColumns = true))
      }
    val removes = affected.map(Action("remove", _, 0L))
    commit(table, infoAct("update") +: (removes ++ adds ++ cdcActs),
      readVersion = version, store)
  }

  /** Copy-on-write MERGE (upsert): `WHEN MATCHED THEN UPDATE SET *` /
    * `WHEN NOT MATCHED THEN INSERT *` keyed on `keyCols`. The standard
    * CDC-apply primitive a training-data table needs (reference anchor:
    * the reference's UPDATE dispatch at process.py:339-366 is the
    * single-row special case of this).
    *
    * Shape (all distributed; only FILE NAMES ever reach the driver):
    *   1. the source is pinned once (`localCheckpoint`) — it is consumed
    *      by three plans and must not recompute differently per consumer;
    *   2. ambiguous-match guard: a source with duplicate keys makes
    *      MATCHED undefined — rejected up front (the same rule ANSI MERGE
    *      and every lakehouse implementation enforces);
    *   3. affected files = live files holding at least one matching key
    *      (semi-join keyed by `input_file_name`). When the table is
    *      range-clustered on the single key column (caller passes
    *      `indexCol == keyCols.head`), the candidate set is FIRST pruned
    *      to files whose recorded bounds overlap the source's key range —
    *      a CDC batch touching a narrow key range scans O(batch) files,
    *      not O(table);
    *   4. rewrite = affected rows anti-joined against source keys (the
    *      survivors), unioned with ALL source rows (updates + inserts);
    *      untouched files are not rewritten, not even read twice;
    *   5. commit remove(affected)+add(rewritten): a racing delete or
    *      compaction of the same files surfaces as the typed
    *      [[ConcurrentRewriteException]]; racing appends commute (their
    *      rows are not covered by the remove-set — same caveat as every
    *      write-serializable lakehouse: a racing append may introduce a
    *      key this merge also inserts).
    *
    * NULL keys follow SQL equality: a NULL key never matches, so
    * NULL-key source rows insert and NULL-key target rows survive.
    * Additive schema evolution applies: a source carrying a NEW column
    * evolves the table (old files read it as NULL); a same-name
    * different-type column throws [[SchemaConflictException]] before
    * anything is staged. With `cdc = true` the commit also carries
    * change files typing every row it touched — `update_preimage` /
    * `update_postimage` for matched keys, `insert` for unmatched source
    * rows — for [[readChangesCdc]]. Returns the commit version. */
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
                keyCols: Seq[String], indexCol: Option[String] = None,
                cdc: Boolean = false,
                store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    val version = latestVersion(table, store)
    require(version >= 0, s"$table does not exist — append first")
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to merge into in $table")
    st.mergeSchema(source.schema) // typed conflict BEFORE staging or checkpointing
    val src = source.localCheckpoint()
    val dup = src.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(1).count()
    require(dup == 0L,
      s"source has duplicate keys on (${keyCols.mkString(", ")}) — MERGE match is ambiguous")
    val keys = src.select(keyCols.map(col): _*)
    // candidate files: bounds-pruned iff the table is clustered on the key
    val candidates: Seq[String] =
      if (keyCols.size == 1 && indexCol.contains(keyCols.head)) {
        val r = keys.agg(min(col(keyCols.head).cast("double")).as("lo"),
                         max(col(keyCols.head).cast("double")).as("hi")).head()
        if (r.isNullAt(0)) Seq.empty // all-NULL keys: nothing can match
        else st.live.toSeq.filter { p =>
          st.bounds.get(p).forall { case (flo, fhi) =>
            fhi >= r.getDouble(0) && flo <= r.getDouble(1) }
        }
      } else st.live.toSeq
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    // input_file_name BEFORE the join — see the applyChanges comment:
    // post-join projection loses the scan task under a shuffle join (on a
    // DV-carrying table the metadata file-name column plays the same
    // scan-time role, and the mask join runs before the key semi-join so
    // a dv-deleted row can neither match nor survive as a preimage)
    val affectedNames: Set[String] =
      if (candidates.isEmpty) Set.empty
      else if (st.dvs.isEmpty)
        reader.parquet(candidates.map(f => Paths.get(table, f).toString): _*)
          .select(keyCols.map(col) :+ input_file_name().as("__f"): _*)
          .join(keys, keyCols, "left_semi")
          .select("__f").distinct().collect()
          .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath)
            .getFileName.toString).toSet
      else
        dvMaskKeyed(spark, table, st, dvKeyed(
            reader.parquet(candidates.map(f => Paths.get(table, f).toString): _*)),
            candidates)
          .join(keys, keyCols, "left_semi")
          .select(DvFile).distinct().collect()
          .map(_.getString(0)).toSet
    val affected = candidates.filter(f =>
      affectedNames.contains(Paths.get(f).getFileName.toString))
    val affectedDf =
      if (affected.isEmpty) None
      else Some(maskedRead(spark, table, st, affected))
    val rewritten = affectedDf match {
      case None     => src // pure insert: no file holds a matching key
      case Some(ar) => ar.join(keys, keyCols, "left_anti")
        .unionByName(src, allowMissingColumns = true)
    }
    val cdcOn = cdc || st.props.get("cdc").contains("true")
    val cdcActs =
      if (!cdcOn) Nil
      else {
        val matched = affectedDf.map(_.join(keys, keyCols, "left_semi"))
        val matchedKeys = matched.map(_.select(keyCols.map(col): _*))
        val pre = matched.map(
          _.withColumn("_change_type", lit("update_preimage")))
        val post = matchedKeys.map(mk => src.join(mk, keyCols, "left_semi")
          .withColumn("_change_type", lit("update_postimage")))
        val ins = matchedKeys.map(mk => src.join(mk, keyCols, "left_anti"))
          .getOrElse(src).withColumn("_change_type", lit("insert"))
        val changes = (pre.toSeq ++ post.toSeq :+ ins)
          .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        stageChanges(spark, table, changes)
      }
    val meta = Action("meta", schemaToken(rewritten.schema), 0L)
    val adds = stage(spark, table, rewritten, indexCol,
      checks = constraintsOf(st.props))
    val removes = affected.map(Action("remove", _, 0L))
    commit(table, (infoAct("merge") +: meta +: removes) ++ adds ++ cdcActs,
      readVersion = version, store)
  }

  /** Data files carrying NEW rows in versions `(fromVersion, toVersion]` —
    * the change-data feed a downstream incremental consumer tails. A
    * commit containing any `remove` is a REORGANIZATION (compaction
    * rewrites rows that already flowed), so its adds are excluded — the
    * feed sees each row exactly once however often the table is
    * compacted behind it. Files are returned even if a LATER rewrite
    * tombstoned them (immutability keeps them readable; vacuum retention
    * must cover the consumer's lag, docs/SCALE.md).
    *
    * This is an APPEND feed: [[deleteWhere]] commits are also
    * remove-carrying rewrites, so downstream consumers are not told to
    * retract rows they already saw. Consumers that need retractions use
    * [[readChangesCdc]] — the full-fidelity row-level feed backed by the
    * per-row change files CDC-enabled mutations store. */
  def changedFiles(table: String, fromVersion: Long, toVersion: Long,
                   store: LogStore = LocalStore): Seq[String] =
    ((fromVersion + 1) to toVersion).flatMap { v =>
      val acts = decode(store.read(versionFile(table, v)))
      // dv- and dvremove-carrying commits are mutations or mask
      // reorganizations (merge-on-read delete/update, a restore retiring
      // sidecars): the APPEND feed skips them exactly as it skips
      // copy-on-write rewrites — an updatedv's appended postimages are not
      // new rows, and a dvSame restore's re-added files may carry rows a
      // still-live sidecar masks. Matches [[versionFeedRows]]'s mutation
      // classification (the r16 advisory's consistency finding).
      if (acts.exists(a => a.op == "remove" || a.op == "dv" || a.op == "dvremove")) Nil
      else acts.collect { case a if a.op == "add" => a.path }
    }

  /** Rows the change feed would deliver for version `v` — the metadata
    * row-based stream admission control paces on ([[graft.streaming
    * .ChangeFeedSource]]'s `maxRowsPerTrigger`), straight from the row
    * counts every add/cdc action records at stage time: one O(1) commit-
    * file read, no data touched. Mirrors each feed's classification:
    * the append feed counts adds of remove-free commits; the cdc feed
    * counts stored change files when present, synthesized inserts for
    * pure appends, and a restore's re-added rows (its retracted rows
    * ride remove actions, which carry no counts — a restore paces as
    * its insert side, an UNDERcount, so pacing admits at least as much
    * as it claims, never less). Legacy pre-count commits read 0 —
    * admission control degrades to version-based, correctness
    * unaffected. */
  def versionFeedRows(table: String, v: Long, cdc: Boolean,
                      store: LogStore = LocalStore): Long = {
    val acts = decode(store.read(versionFile(table, v)))
    val addRows = acts.collect { case a if a.op == "add" => a.rows }.sum
    val cdcRows = acts.collect { case a if a.op == "cdc" => a.rows }.sum
    // dv-carrying commits classify with remove-carrying ones on both
    // feeds: mutations, represented only by their stored change files
    val hasRemoves = acts.exists(a =>
      a.op == "remove" || a.op == "dv" || a.op == "dvremove")
    if (cdc) {
      if (cdcRows > 0) cdcRows
      else if (!hasRemoves) addRows
      else if (operationOf(acts).contains("restore"))
        // a restore synthesizes: re-added rows (adds), resurrections
        // (retired-mask rows) and fresh mask deletions (added-mask rows)
        // — each term an upper bound of its synthesized arm, so pacing
        // never under-budgets a trigger
        addRows +
          acts.collect { case a if a.op == "dv" => a.rows }.sum +
          acts.collect { case a if a.op == "dvremove" => a.rows }.sum
      else 0L
    } else if (hasRemoves) 0L else addRows
  }

  /** Incremental read of the rows appended in `(fromVersion, toVersion]`
    * (default `toVersion` = tip). Returns the version the read covers
    * through and the new rows — `None` when the window holds no new data.
    * The returned version is the consumer's next cursor; feeding it to
    * [[appendOnce]] as the batch id makes a log-to-log pipeline
    * exactly-once end-to-end (spec'd in CommitLogSpec). */
  def readChanges(spark: SparkSession, table: String, fromVersion: Long,
                  toVersion: Option[Long] = None,
                  store: LogStore = LocalStore): (Long, Option[DataFrame]) = {
    val to = toVersion.getOrElse(latestVersion(table, store))
    val files = changedFiles(table, fromVersion, to, store)
    if (files.isEmpty) (to, None)
    else {
      // schema as of `to`: a window may span an evolution boundary, so the
      // union schema (missing columns = NULL) keeps the batch well-typed
      val reader = replay(table, to, store).schemaStruct match {
        case Some(s) => spark.read.schema(s)
        case None    => spark.read
      }
      (to, Some(reader.parquet(
        files.map(f => Paths.get(table, f).toString): _*)))
    }
  }

  /** Full-fidelity change-data feed over `(fromVersion, toVersion]`:
    * every row change, typed by `_change_type` and stamped with the
    * `_commit_version` it landed at. Append commits synthesize `insert`
    * rows straight from their add files (no storage cost — the standard
    * lakehouse CDF trick); CDC-enabled [[deleteWhere]]/[[mergeInto]]
    * commits contribute their stored change files (`delete`,
    * `update_preimage`/`update_postimage`, `insert`); reorganizations
    * (compaction, non-CDC rewrites) contribute nothing — their rows
    * already flowed. Unlike [[readChanges]] (the append-only feed), a
    * downstream consumer of THIS feed can maintain a row-level replica,
    * retractions included. Vacuum retention must cover the consumer's
    * lag: change files older than the window are GC'd with the
    * tombstones. Returns the cursor and the change rows (`None` when
    * the window holds no changes). */
  def readChangesCdc(spark: SparkSession, table: String, fromVersion: Long,
                     toVersion: Option[Long] = None,
                     store: LogStore = LocalStore): (Long, Option[DataFrame]) = {
    import org.apache.spark.sql.functions.lit
    val to = toVersion.getOrElse(latestVersion(table, store))
    val base = replay(table, to, store).schemaStruct
    val withCt = base.map(s => org.apache.spark.sql.types.StructType(
      s.fields :+ org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)))
    def readerFor(schema: Option[org.apache.spark.sql.types.StructType]) =
      schema match {
        case Some(s) => spark.read.schema(s)
        case None    => spark.read
      }
    val parts = ((fromVersion + 1) to to).flatMap { v =>
      val acts = decode(store.read(versionFile(table, v)))
      val cdcFiles = acts.collect { case a if a.op == "cdc" => a.path }
      val adds = acts.collect { case a if a.op == "add" => a.path }
      val removes = acts.collect { case a if a.op == "remove" => a.path }
      val dvAdds = acts.collect { case a if a.op == "dv" => a.path }
      val dvRems = acts.collect { case a if a.op == "dvremove" => a.path }
      val op = operationOf(acts)
      def readAs(files: Seq[String], changeType: String): DataFrame =
        readerFor(base).parquet(files.map(f => Paths.get(table, f).toString): _*)
          .withColumn("_change_type", lit(changeType))
      val frame: Option[DataFrame] =
        if (cdcFiles.nonEmpty)
          Some(readerFor(withCt).parquet(
            cdcFiles.map(f => Paths.get(table, f).toString): _*))
        else if (removes.isEmpty && dvAdds.isEmpty && dvRems.isEmpty) {
          // adds-only commits are pure inserts WHATEVER their operation:
          // a merge/apply that matched nothing destructive (no removes,
          // no mask change) appended rows and nothing else, so insert
          // synthesis is exact even without stored change files
          if (adds.isEmpty) None
          else Some(readAs(adds, "insert"))
        } else if (op.contains("restore")) {
          // a restore rewrites NO rows — its re-added files are exactly
          // the restored rows and its removed files exactly the retracted
          // ones, so full-fidelity change rows synthesize straight from
          // the (immutable, pre-vacuum) files: no change-file storage cost.
          //
          // Deletion vectors keep this commit-local because restoreImpl
          // CONSOLIDATES: a dv-state-changing restore retires every prior
          // sidecar (`dvremove` — the OLD mask, still readable pre-vacuum)
          // and commits one fresh sidecar holding the FULL restored mask
          // (`dv`). So: re-added files synthesize inserts THROUGH the new
          // mask; rows of still-live files the old mask covered but the
          // new one does not are resurrections (insert); rows the new mask
          // covers but the old did not are fresh deletions (delete). The
          // removed-file delete side may include rows the old mask had
          // already deleted — a spurious retraction of an absent key,
          // which every keyed replica applies idempotently.
          import org.apache.spark.sql.functions.{broadcast, col}
          def maskOf(paths: Seq[String]): DataFrame =
            spark.read.parquet(paths.map(f => Paths.get(table, f).toString): _*)
              .select(col("file"), col("pos"))
          def maskJoin(files: Seq[String], positions: DataFrame,
                       changeType: String): Option[DataFrame] =
            if (files.isEmpty) None
            else {
              val keyed = dvKeyed(readerFor(base).parquet(
                files.map(f => Paths.get(table, f).toString): _*))
              val m = positions.select(col("file").as("__graft_dv_mfile"),
                                       col("pos").as("__graft_dv_mpos"))
              Some(keyed.join(broadcast(m),
                  keyed(DvFile) === m("__graft_dv_mfile") &&
                    keyed(DvPos) === m("__graft_dv_mpos"),
                  if (changeType == "insert_masked") "left_anti" else "left_semi")
                .drop(DvFile, DvPos)
                .withColumn("_change_type",
                  lit(if (changeType == "insert_masked") "insert" else changeType)))
            }
          // the insert side masks with the FULL live dv state AT v, not
          // just the commit's own dv actions: a dvSame restore (mask
          // unchanged) can still re-add files an inert-but-live sidecar
          // masks — e.g. dv-delete on F, copy-on-write delete removes F
          // (sidecar stays live), restore re-adds F — and synthesizing
          // F's rows unmasked would resurrect deleted rows downstream.
          // One checkpoint-seeded replay per restore commit; restores are
          // rare and the replay is O(commits), never data-sized.
          lazy val stateAtV = replay(table, v, store)
          val ins1 =
            if (adds.isEmpty) None
            else {
              val liveDvsAtV = stateAtV.dvs.toSeq
              if (liveDvsAtV.isEmpty) Some(readAs(adds, "insert"))
              else maskJoin(adds, maskOf(liveDvsAtV), "insert_masked")
            }
          val (ins2, del2) =
            if (dvRems.isEmpty && dvAdds.isEmpty) (None, None)
            else {
              val oldM = if (dvRems.isEmpty) spark.emptyDataFrame
                            .selectExpr("'' AS file", "0L AS pos").limit(0)
                         else maskOf(dvRems)
              val newM = if (dvAdds.isEmpty) spark.emptyDataFrame
                            .selectExpr("'' AS file", "0L AS pos").limit(0)
                         else maskOf(dvAdds)
              val resurrected = oldM.join(newM, Seq("file", "pos"), "left_anti")
                .localCheckpoint()
              val newlyMasked = newM.join(oldM, Seq("file", "pos"), "left_anti")
                .localCheckpoint()
              // only files still live at v and not in adds (those are
              // fully covered by ins1) can carry delta rows; the masks are
              // small by design, so the file lists collect cheaply
              val stayed = stateAtV.live.filterNot(adds.contains)
              def deltaFiles(m: DataFrame): Seq[String] =
                m.select("file").distinct().collect().map(_.getString(0)).toSeq
                  .map(n => s"data/$n").filter(stayed.contains)
              (maskJoin(deltaFiles(resurrected), resurrected, "insert"),
               maskJoin(deltaFiles(newlyMasked), newlyMasked, "delete"))
            }
          val del = if (removes.isEmpty) None else Some(readAs(removes, "delete"))
          (ins1.toSeq ++ ins2.toSeq ++ del2.toSeq ++ del.toSeq)
            .reduceOption(_.unionByName(_, allowMissingColumns = true))
        } else if (op.exists(MutationOps.contains)) {
          // the advisor-flagged failure mode: a delete/update/merge —
          // copy-on-write (remove-carrying) or merge-on-read (dv-carrying)
          // — that ran with cdc=false changed rows but stored no change
          // files; silently classifying it as a reorganization would let
          // every downstream replica diverge without a signal. Loud stop.
          throw new CdcGapException(
            s"commit v$v of $table is a '${op.get}' mutation with no change files — " +
              "the row-level feed cannot represent it. Enable CDC on the table " +
              "(setTableProperty(table, \"cdc\", \"true\")) or pass cdc = true " +
              "on every mutation, then re-run the mutation path")
        } else None // compaction (or legacy pre-info commit): rows already flowed
      frame.map(_.withColumn("_commit_version", lit(v)))
    }
    if (parts.isEmpty) (to, None)
    else (to, Some(parts.reduce(_.unionByName(_, allowMissingColumns = true))))
  }

  /** Apply a [[readChangesCdc]] batch to a REPLICA table — the consumer
    * half of CDC, proving the feed is sufficient to maintain a row-level
    * copy (retractions included). One copy-on-write rewrite handles both
    * shapes: per key, the LAST relevant change in the batch wins
    * (`_commit_version` order; preimages are informational and ignored),
    * then every touched key is dropped from the affected files and the
    * surviving upsert rows are unioned back — a key whose last change is
    * `delete` simply isn't re-added. Batches must be applied in version
    * order (the change-feed stream delivers them that way).
    *
    * Exactly-once across replays: apply is idempotent per batch anyway
    * (replaying the same batch converges to the same replica state), but
    * pass `txn = Some((appId, batchId))` — what `foreachBatch` hands its
    * function — and a replayed batch is SKIPPED at the commit level, the
    * same (appId, batchId) txn-marker ledger [[appendOnce]] uses: no
    * second rewrite job, no second replica version, even when the replay
    * RACES the original. This is the discipline the streaming replica
    * ([[graft.streaming.CdcReplica]]) runs under. Returns the replica
    * commit version, or -1 for an empty or already-applied batch. */
  def applyChanges(spark: SparkSession, replica: String, changes: DataFrame,
                   keyCols: Seq[String],
                   txn: Option[(String, Long)] = None,
                   store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name, row_number}
    require(keyCols.nonEmpty, "applyChanges needs key columns")
    txn.foreach { case (app, b) =>
      require(app.matches("[A-Za-z0-9_.-]+"), s"appId must be a plain token: $app")
      require(b >= 0, s"batchId must be non-negative: $b")
    }
    val version = latestVersion(replica, store)
    val stOpt = if (version < 0) None else Some(replay(replica, version, store))
    // the high-water skip runs BEFORE any batch computation: a replayed
    // batch costs one log replay, zero Spark jobs
    txn.foreach { case (app, b) =>
      stOpt.foreach { st =>
        if (st.txns.getOrElse(app, -1L) >= b) return -1L
      }
    }
    val txnActs = txn.map { case (app, b) => Action("txn", app, b) }.toSeq
    val relevant = changes.where(col("_change_type")
      .isin("insert", "update_postimage", "delete"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc, col("_change_type").desc)
    val last = relevant.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn").localCheckpoint()
    if (last.isEmpty) return -1L
    val upserts = last.where(col("_change_type") =!= "delete")
      .drop("_change_type", "_commit_version")
    val keys = last.select(keyCols.map(col): _*)
    if (version < 0) {
      // first batch bootstraps; all-deletes against nothing is a no-op
      if (upserts.isEmpty) return -1L
      val meta = Action("meta", schemaToken(upserts.schema), 0L)
      val acts = (infoAct("apply") +: meta +: stage(spark, replica, upserts)) ++ txnActs
      return (try commit(replica, acts, readVersion = -1L, store)
              catch { case _: TxnAlreadyApplied => -1L })
    }
    val st = stOpt.get
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val files = st.live.toSeq
    // input_file_name is captured BEFORE the join: projected after it,
    // the expression silently returns "" whenever the planner picks a
    // shuffle join (the row leaves its scan task), and no file matches
    val affectedNames: Set[String] =
      if (files.isEmpty) Set.empty
      else reader.parquet(files.map(f => Paths.get(replica, f).toString): _*)
        .select(keyCols.map(col) :+ input_file_name().as("__f"): _*)
        .join(keys, keyCols, "left_semi")
        .select("__f").distinct().collect()
        .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath)
          .getFileName.toString).toSet
    val affected = files.filter(f =>
      affectedNames.contains(Paths.get(f).getFileName.toString))
    val rewritten =
      if (affected.isEmpty) upserts
      else reader.parquet(affected.map(f => Paths.get(replica, f).toString): _*)
        .join(keys, keyCols, "left_anti")
        .unionByName(upserts, allowMissingColumns = true)
    val meta = Action("meta", schemaToken(rewritten.schema), 0L)
    val adds = stage(spark, replica, rewritten,
      checks = constraintsOf(st.props))
    val removes = affected.map(Action("remove", _, 0L))
    try commit(replica, (infoAct("apply") +: meta +: removes) ++ adds ++ txnActs,
      readVersion = version, store)
    catch { case _: TxnAlreadyApplied => -1L }
  }

  /** [[applyChanges]] at merge-on-read cost: every touched key's current
    * row is MASKED by one (file, position) sidecar and the surviving
    * upserts are APPENDED — no replica file is rewritten, so a CDC batch
    * over scattered keys applies as one sidecar + one append on a 100 TB
    * replica (run [[compact]] periodically to materialize the
    * accumulated masks; [[deletionVectors]] tells you when). Semantics,
    * batch reduction (last change per key wins) and the `(appId,
    * batchId)` exactly-once txn discipline are identical to
    * [[applyChanges]] — the streaming replica ([[graft.streaming
    * .CdcReplica]]) selects this form with `mergeOnRead = true`.
    * Returns the replica commit version, or -1 for an empty or
    * already-applied batch. */
  def applyChangesDv(spark: SparkSession, replica: String, changes: DataFrame,
                     keyCols: Seq[String],
                     txn: Option[(String, Long)] = None,
                     store: LogStore = LocalStore): Long = {
    import org.apache.spark.sql.functions.{col, row_number}
    require(keyCols.nonEmpty, "applyChangesDv needs key columns")
    txn.foreach { case (app, b) =>
      require(app.matches("[A-Za-z0-9_.-]+"), s"appId must be a plain token: $app")
      require(b >= 0, s"batchId must be non-negative: $b")
    }
    val version = latestVersion(replica, store)
    val stOpt = if (version < 0) None else Some(replay(replica, version, store))
    txn.foreach { case (app, b) =>
      stOpt.foreach { st =>
        if (st.txns.getOrElse(app, -1L) >= b) return -1L
      }
    }
    val txnActs = txn.map { case (app, b) => Action("txn", app, b) }.toSeq
    val relevant = changes.where(col("_change_type")
      .isin("insert", "update_postimage", "delete"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc, col("_change_type").desc)
    val last = relevant.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn").localCheckpoint()
    if (last.isEmpty) return -1L
    val upserts = last.where(col("_change_type") =!= "delete")
      .drop("_change_type", "_commit_version")
    val keys = last.select(keyCols.map(col): _*)
    if (version < 0) {
      if (upserts.isEmpty) return -1L
      val meta = Action("meta", schemaToken(upserts.schema), 0L)
      val acts = (infoAct("applydv") +: meta +: stage(spark, replica, upserts)) ++ txnActs
      return (try commit(replica, acts, readVersion = -1L, store)
              catch { case _: TxnAlreadyApplied => -1L })
    }
    val st = stOpt.get
    def reader = st.schemaStruct match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    val paths = st.live.toSeq.map(f => Paths.get(replica, f).toString)
    // current rows of every touched key, with positions, through the
    // replica's existing mask — these are exactly the rows to retire
    val hits =
      if (paths.isEmpty) None
      else Some(dvMaskKeyed(spark, replica, st, dvKeyed(reader.parquet(paths: _*)), st.live.toSeq)
        .join(keys, keyCols, "left_semi")
        .localCheckpoint())
    val perFile = hits.map(_.groupBy(DvFile).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))).getOrElse(Array.empty)
    val dvActs =
      if (perFile.isEmpty) Nil
      else stage(spark, replica,
          hits.get.select(col(DvFile).as("file"), col(DvPos).as("pos"))
            .repartition(1))
        .map(_.copy(op = "dv"))
    val dvRefActs = perFile.sortBy(_._1).map { case (name, n) =>
      Action("dvref", s"data/$name", n)
    }.toSeq
    val meta = Action("meta", schemaToken(upserts.schema), 0L)
    val adds = stage(spark, replica, upserts, checks = constraintsOf(st.props))
    try commit(replica,
      (infoAct("applydv") +: meta +: (dvActs ++ dvRefActs)) ++ adds ++ txnActs,
      readVersion = version, store)
    catch { case _: TxnAlreadyApplied => -1L }
  }

  /** OCC compaction: rewrite the current live set into ~`targetFiles`
    * files and commit remove(old)+add(new). Concurrent APPENDS commute
    * (they land before or after; either way no data is covered twice);
    * a concurrent rewrite of the same files raises
    * [[ConcurrentRewriteException]] on exactly one of the racers. */
  def compact(spark: SparkSession, table: String, targetFiles: Int,
              store: LogStore = LocalStore): Long = {
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to compact in $table")
    // masked read: compaction MATERIALIZES live deletion vectors (the
    // rewritten files no longer contain the masked rows) and retires every
    // sidecar — the maintenance pass that keeps merge-on-read reads cheap
    val df = maskedRead(spark, table, st, st.live.toSeq)
      .repartition(math.max(1, targetFiles))
    val adds = stage(spark, table, df)
    val removes = st.live.toSeq.map(Action("remove", _, 0L)) ++
      st.dvs.toSeq.map(p => Action("dvremove", p, st.dvRowsOf.getOrElse(p, 0L)))
    commit(table, infoAct("compact") +: (removes ++ adds),
      readVersion = version, store)
  }

  /** Policy-driven maintenance — the operator loop in one idempotent
    * call: compact when the live set fragments past `maxFiles` (a
    * streaming sink writes a file per trigger; ten thousand small files
    * is the classic read-amplification failure) or when accumulated
    * deletion-vector masks exceed `maxMaskRows` (every masked read pays
    * the anti-join until compaction materializes the masks —
    * [[deletionVectors]] is the gauge, this is the actuator). Re-clusters
    * on `clusterCols` when given (restoring zonemap pruning fragmented by
    * small appends), plain-compacts otherwise. Below both thresholds it
    * commits NOTHING (a no-op maintenance tick is free, so it can run on
    * a schedule). OCC as always: racing appends commute, a racing rewrite
    * hits the typed conflict — run it beside live writers, no window.
    * Returns the compaction version, or -1 for the no-op tick. */
  def maintain(spark: SparkSession, table: String,
               maxFiles: Int = 64, maxMaskRows: Long = 1000000L,
               targetFiles: Int = 8, clusterCols: Seq[String] = Nil,
               store: LogStore = LocalStore): Long = {
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table has no commits to maintain")
    val st = replay(table, tip, store)
    val maskRows = st.dvs.toSeq.map(st.dvRowsOf.getOrElse(_, 0L)).sum
    if (st.live.size <= maxFiles && maskRows <= maxMaskRows) return -1L
    if (clusterCols.nonEmpty)
      compactClustered(spark, table, clusterCols, targetFiles, store)
    else compact(spark, table, targetFiles, store)
  }

  /** OPTIMIZE-ZORDER maintenance: compaction that RE-CLUSTERS — rewrite
    * the live set z-ordered on `clusterCols` and re-record the
    * multi-column zonemap, so a table fragmented by many small
    * (unclustered or stream-written) appends gets its box-pruning back
    * in one pass. Same OCC semantics as [[compact]]: racing appends
    * commute, a racing rewrite of the same files raises the typed
    * conflict; the change feed ignores it (remove-carrying commit). */
  def compactClustered(spark: SparkSession, table: String,
                       clusterCols: Seq[String], targetFiles: Int,
                       store: LogStore = LocalStore): Long = {
    require(clusterCols.nonEmpty, "compactClustered needs cluster columns")
    val version = latestVersion(table, store)
    val st = replay(table, version, store)
    require(st.live.nonEmpty, s"nothing to compact in $table")
    // same DV materialization contract as [[compact]]
    val df = maskedRead(spark, table, st, st.live.toSeq)
    val adds = stage(spark, table,
      zcluster(df, clusterCols, targetFiles), None, clusterCols)
    val removes = st.live.toSeq.map(Action("remove", _, 0L)) ++
      st.dvs.toSeq.map(p => Action("dvremove", p, st.dvRowsOf.getOrElse(p, 0L)))
    commit(table, infoAct("compact") +: (removes ++ adds),
      readVersion = version, store)
  }

  /** RESTORE TABLE ... TO VERSION: roll the table's DATA back to what it
    * was at `asOf`, as a new commit at the tip — history is never erased
    * (the bad versions stay time-travelable; this is the undo primitive
    * for a botched delete/merge, the same shape as Delta's RESTORE).
    * Metadata-only: tombstoned files are RE-ADDED and later files removed;
    * no data is copied, so restoring 100 TB costs one commit write. The
    * re-added files' recorded bounds/zonemaps are restored with them, so
    * data skipping survives the round trip.
    *
    * Restorability is gated by vacuum retention: a target file the vacuum
    * already deleted cannot be re-added — checked up front, typed error,
    * nothing committed. Schema is NOT rolled back (evolution is
    * additive-only; restored files read any later-added column as NULL —
    * the exact contract every snapshot read already honors). OCC applies:
    * the commit carries removes, so racing rewrites of the same files
    * surface as [[ConcurrentRewriteException]]. [[readChangesCdc]] stays
    * full-fidelity across a restore WITHOUT stored change files: the
    * re-added files synthesize `insert` rows and the removed files
    * `delete` rows.
    *
    * CHECK constraints apply to restore like any write that introduces
    * row values: the RE-ADDED files are validated against the ACTIVE
    * (tip) constraints before anything commits — a constraint added
    * after `asOf` would otherwise be silently violated by rows the
    * constraint was created to keep out (one column-pruned scan over
    * `toAdd` only; files that stayed live already passed on their own
    * write). Validation needs a SparkSession, so on a constrained table
    * use the `restore(spark, ...)` overload — the sessionless form
    * refuses (typed error, nothing committed) rather than skip the
    * check. Returns the commit version, or -1 when the tip already
    * equals the target (no commit). */
  def restore(table: String, asOf: Long, store: LogStore = LocalStore): Long =
    restoreImpl(None, table, asOf, store)

  /** [[restore]] with CHECK-constraint validation of the re-added files —
    * required when the table has active constraints. */
  def restore(spark: SparkSession, table: String, asOf: Long): Long =
    restoreImpl(Some(spark), table, asOf, LocalStore)

  def restore(spark: SparkSession, table: String, asOf: Long,
              store: LogStore): Long =
    restoreImpl(Some(spark), table, asOf, store)

  private def restoreImpl(spark: Option[SparkSession], table: String,
                          asOf: Long, store: LogStore): Long = {
    val version = latestVersion(table, store)
    require(version >= 0, s"$table has no commits to restore")
    require(asOf >= 0 && asOf <= version,
      s"version $asOf does not exist (tip is $version)")
    val target = replay(table, asOf, store)
    val current = replay(table, version, store)
    val toRemove = current.live.toSeq.filterNot(target.live.contains)
    val toAdd = target.live.toSeq.filterNot(current.live.contains)
    // deletion-vector state restores with the data: set equality is state
    // equality (sidecars are immutable uuid files)
    val dvSame = current.dvs == target.dvs
    if (toRemove.isEmpty && toAdd.isEmpty && dvSame) return -1L
    (toAdd ++ (if (dvSame) Nil else target.dvs.toSeq)).foreach { f =>
      require(Files.exists(Paths.get(table, f)),
        s"cannot restore $table to v$asOf: $f was already vacuumed — " +
          "vacuum retention must cover the restore window")
    }
    // Restoring across a DV-state change consolidates the target mask into
    // ONE fresh sidecar and retires every current one. That keeps the
    // commit self-describing — [[readChangesCdc]] synthesizes the restore's
    // row-level changes from the commit's OWN dv/dvremove actions, no
    // replay — and doubles as mask maintenance. Needs a session (the
    // consolidated sidecar is written by Spark), so the sessionless form
    // refuses, same contract as the constrained-restore case.
    val dvActs: Seq[Action] =
      if (dvSame) Nil
      else {
        val s = spark.getOrElse(throw new IllegalStateException(
          s"restoring $table across a deletion-vector state change — " +
            "use restore(spark, table, asOf) so the target mask can be " +
            "consolidated into a fresh sidecar"))
        val retire = current.dvs.toSeq.map(p => Action("dvremove", p, current.dvRowsOf.getOrElse(p, 0L)))
        if (target.dvs.isEmpty) retire
        else {
          val mask = s.read.parquet(
            target.dvs.toSeq.map(f => Paths.get(table, f).toString): _*)
            .localCheckpoint() // pinned: the sidecar and the refs must agree
          val consolidated = stage(s, table, mask.repartition(1))
            .map(_.copy(op = "dv"))
          // dvref per masked file: a racing rewrite of a file the restored
          // mask covers must hit the typed conflict (its rows would
          // otherwise be materialized back under our feet)
          val refs = mask.groupBy("file").count().collect()
            .map(r => Action("dvref", s"data/${r.getString(0)}", r.getLong(1)))
            .sortBy(_.path).toSeq
          retire ++ consolidated ++ refs
        }
      }
    val checks = constraintsOf(current.props)
    if (checks.nonEmpty && toAdd.nonEmpty) {
      val s = spark.getOrElse(throw new IllegalStateException(
        s"$table has active CHECK constraints (${checks.keys.mkString(", ")}) — " +
          "use restore(spark, table, asOf) so the re-added files can be " +
          "validated against them before committing"))
      // current (tip) schema: a constraint may reference a column added
      // after asOf, which the re-added files read as NULL — and NULL
      // violates under the house CHECK rule, same as addConstraint
      val reader = current.schemaStruct match {
        case Some(sc) => s.read.schema(sc)
        case None     => s.read
      }
      // validate the rows a reader will actually SEE: re-added files are
      // masked by the target's dv state (a dv-deleted violating row is
      // not a row, so it must not block the restore)
      val readded = reader.parquet(
        toAdd.map(f => Paths.get(table, f).toString): _*)
      val validated =
        if (target.dvs.isEmpty) readded
        else dvMaskKeyed(s, table, target, dvKeyed(readded), toAdd).drop(DvFile, DvPos)
      checkViolations(validated, checks).foreach { case (n, p, bad) =>
        if (bad > 0)
          throw new ConstraintViolationException(
            s"cannot restore $table to v$asOf: $bad re-added rows " +
              s"violate active CHECK constraint $n ($p) — drop the constraint " +
              "or restore to a compliant version; nothing was committed")
      }
    }
    val addActs = toAdd.map { p =>
      val (lo, hi) = target.bounds.getOrElse(p, (Double.NaN, Double.NaN))
      Action("add", p, target.rowsOf.getOrElse(p, 0L), lo, hi,
        target.zones.getOrElse(p, Map.empty), target.blooms.getOrElse(p, ""))
    }
    val removeActs = toRemove.map(Action("remove", _, 0L))
    commit(table, infoAct("restore") +: (removeActs ++ addActs ++ dvActs),
      readVersion = version, store)
  }

  /** DESCRIBE HISTORY: one row per commit — version, the provenance
    * operation its info action recorded (`unknown` for legacy commits),
    * and its add/remove/change-file counts. Driver-side by design: the
    * log is O(commits) metadata, never data-sized, and this is the audit
    * surface an operator reads before a [[restore]]. */
  def history(spark: SparkSession, table: String,
              store: LogStore = LocalStore): DataFrame = {
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table has no commits")
    val rows = (0L to tip).map { v =>
      val acts = decode(store.read(versionFile(table, v)))
      (v, operationOf(acts).getOrElse("unknown"),
        acts.count(_.op == "add").toLong,
        acts.count(_.op == "remove").toLong,
        acts.count(_.op == "cdc").toLong)
    }
    spark.createDataFrame(rows)
      .toDF("version", "operation", "num_added", "num_removed", "num_change_files")
  }

  /** Every commit's (version, timestamp) under the MONOTONE provenance
    * clock: each commit's recorded wall-clock stamp, adjusted to
    * `max(recorded, previous + 1)` — the public Delta/Iceberg rule that
    * makes timestamp addressing well-defined even when racing commits,
    * clock skew, or a sub-millisecond commit burst record out-of-order
    * raw stamps (version order is the ONLY true order; the clock must
    * never contradict it). Legacy commits with no provenance action read
    * as epoch 0 and inherit `previous + 1`; an UNREADABLE commit file
    * degrades the same way instead of failing the whole clock — replay
    * explicitly tolerates lost/corrupt PRE-CHECKPOINT commit files, so
    * timestamp addressing must too (stamps in the damaged prefix
    * collapse to the epoch-0 monotone ramp; every readable commit's
    * stamp stays exact, and the ramp only ever moves addressing toward
    * OLDER versions — AS OF never serves data newer than asked).
    * Driver-side O(commits), the same cost class as [[history]]. */
  def commitTimestamps(table: String, store: LogStore = LocalStore): Seq[(Long, Long)] = {
    val tip = latestVersion(table, store)
    require(tip >= 0, s"$table has no commits")
    var prev = Long.MinValue
    (0L to tip).map { v =>
      val raw = scala.util.Try(decode(store.read(versionFile(table, v))))
        .toOption.flatMap(_.collectFirst { case a if a.op == "info" => a.rows })
        .getOrElse(0L)
      prev = if (prev == Long.MinValue) raw else math.max(raw, prev + 1)
      (v, prev)
    }
  }

  /** The version a timestamp addresses: the LATEST version whose monotone
    * commit timestamp is ≤ `ts` (the boundary rule every lakehouse AS OF
    * uses — "the table as it was AT that moment"). A `ts` before the
    * first commit is a typed error, not version 0: there WAS no table
    * then, and silently rounding up would hand back data from the
    * caller's future. */
  def versionAtTimestamp(table: String, ts: Long,
                         store: LogStore = LocalStore): Long = {
    val tss = commitTimestamps(table, store)
    require(ts >= tss.head._2,
      s"timestamp $ts is before $table's first commit (${tss.head._2}) — " +
        "the table did not exist yet")
    tss.takeWhile(_._2 <= ts).last._1
  }

  /** Snapshot read AS OF a timestamp — the form users actually type
    * (`SELECT ... TIMESTAMP AS OF`), mapped onto version-addressed
    * [[read]] through the monotone provenance clock. */
  def readAsOfTimestamp(spark: SparkSession, table: String, ts: Long,
                        store: LogStore = LocalStore): DataFrame =
    read(spark, table, Some(versionAtTimestamp(table, ts, store)), store)

  /** RESTORE TABLE ... TO TIMESTAMP: [[restore]] addressed by the
    * monotone clock (validated form — a constrained table validates the
    * re-added files like any timestamp- or version-addressed restore). */
  def restoreToTimestamp(spark: SparkSession, table: String, ts: Long,
                         store: LogStore = LocalStore): Long =
    restoreImpl(Some(spark), table, versionAtTimestamp(table, ts, store), store)

  /** Delete data files no retained snapshot references: orphans from
    * crashed writers (staged, never committed) and tombstones (removed by
    * a rewrite) older than the retention window.
    *
    * Two independent guards make this safe to run against a LIVE table —
    * the production posture docs/SCALE.md §Writers used to list as the
    * one remaining delta:
    *
    *   - `retainVersions`: every file live in ANY version in
    *     `[tip - retainVersions, tip]` is protected, so a reader pinned
    *     (time-traveled) at a version inside the window never loses files
    *     mid-scan. The protected set is `live(floor) ∪ adds(floor..tip]`
    *     — a file added then removed inside the window was live at the
    *     version right after its add, so the union form is exact. Cost is
    *     one checkpoint-seeded replay to the window floor plus the window's
    *     commit files — never the table's full history.
    *   - `minAgeMs`: a data file younger than this is never deleted, even
    *     if unreferenced — it may be a racing writer's staged-but-not-yet-
    *     committed file (stage happens BEFORE the commit publishes, so an
    *     age-blind vacuum could delete a commit's files in the gap).
    *     Retention can't cover this case: an in-flight file is in no
    *     version at all.
    *
    * Defaults (0, 0) give the aggressive quiesced-table semantics the
    * early specs pin: only the tip survives. Returns deleted file names. */
  def vacuum(table: String, retainVersions: Int = 0, minAgeMs: Long = 0L,
             store: LogStore = LocalStore): Seq[String] = {
    val tip = latestVersion(table, store)
    if (tip < 0) return Nil // no commits: every data file may be an in-flight stage
    val floor = math.max(0L, tip - retainVersions.toLong)
    val floorState = replay(table, floor, store)
    val kept = mutable.Set.empty[String] ++ floorState.live ++ floorState.dvs
    ((floor + 1) to tip).foreach { v =>
      decode(store.read(versionFile(table, v))).foreach {
        // window adds, change files AND deletion-vector sidecars stay
        // readable; files from commits at or before the floor age out
        // with the tombstones
        case a if a.op == "add" || a.op == "cdc" || a.op == "dv" => kept += a.path
        case _                                                   => ()
      }
    }
    val cutoff = System.currentTimeMillis() - minAgeMs
    LocalStore.list(dataDir(table))
      .filter(p => Files.isRegularFile(p) &&
        !kept.contains(s"data/${p.getFileName}") &&
        Files.getLastModifiedTime(p).toMillis <= cutoff)
      .map { p => Files.delete(p); p.getFileName.toString }
  }

  // --- oracle-checked query forms (SparkEntry registry) ---------------------

  /** Two concurrent appends of the nation projection through the full OCC
    * protocol (real threads, real race on v0/v1), then a tip snapshot
    * read. Oracle: nation UNION ALL nation — exactly-once append under
    * contention is the assertion. */
  def occAppendSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("occ_nation").toString
    val src = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val threads = (1 to 2).map { _ =>
      new Thread(() => { append(spark, table, src); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    read(spark, table).orderBy("n_nationkey", "n_name")
  }

  val occAppendSnapshotSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey, n_name""".stripMargin

  /** Time travel: append nation at v0, append region-keyed rows at v1,
    * compact at v2 — then read AS OF v0. Oracle: plain nation (later
    * commits, including the rewrite, must be invisible to the pinned
    * version). */
  def occTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("occ_tt").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val v0 = append(spark, table, nation)
    append(spark, table, nation.limit(5))
    compact(spark, table, targetFiles = 1)
    read(spark, table, asOf = Some(v0)).orderBy("n_nationkey")
  }

  val occTimeTravelSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Timestamp-addressed time travel: the same three-commit script as
    * [[occTimeTravel]], read back AS OF a timestamp strictly BETWEEN
    * v0's and v1's monotone commit stamps (v1's stamp minus one — the
    * monotone clock guarantees that instant exists and addresses v0
    * under the latest-version-≤-ts boundary rule). Oracle: plain nation
    * — the later append and the rewrite must be invisible at that
    * instant. */
  def occTimeTravelTs(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("occ_tt_ts").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, table, nation)
    append(spark, table, nation.limit(5))
    compact(spark, table, targetFiles = 1)
    val ts = commitTimestamps(table).toMap
    readAsOfTimestamp(spark, table, ts(1L) - 1).orderBy("n_nationkey")
  }

  val occTimeTravelTsSql: String = occTimeTravelSql

  /** Data skipping through the log: cluster lineitem by orderkey into
    * range-disjoint files via [[appendIndexed]], then [[readWhere]] a
    * selective key range — the scan opens only the files whose recorded
    * bounds overlap (CommitLogSpec asserts the pruned file count; here
    * the oracle asserts the pruning lost no rows). Oracle: the same
    * predicate as a plain filter over the source table. */
  def occReadWhere(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_skip").toString
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    appendIndexed(spark, table, li.repartitionByRange(8, col("l_orderkey")),
      "l_orderkey")
    readWhere(spark, table, "l_orderkey", 1000d, 2000d)
      .orderBy("l_orderkey", "l_linenumber")
  }

  val occReadWhereSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_orderkey BETWEEN 1000 AND 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Copy-on-write delete through the log: range-cluster orders, delete a
    * key range (touches only the overlapping files — CommitLogSpec
    * asserts the untouched files keep their identity), read the tip.
    * Oracle: the complement filter over the source table. */
  def occDeleteWhere(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_del").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    deleteWhere(spark, table, col("o_orderkey").between(1000, 3000),
      Some("o_orderkey"))
    read(spark, table).orderBy("o_orderkey")
  }

  val occDeleteWhereSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey NOT BETWEEN 1000 AND 3000
      |ORDER BY o_orderkey""".stripMargin

  /** Schema evolution through the log: append nation, then append a
    * 5-row slice carrying a NEW column — the tip read returns the union
    * schema, with the pre-evolution rows reading the new column as NULL
    * straight off the log's meta actions (no footer merging). Oracle:
    * NULL-padded UNION ALL of the two appends. */
  def occSchemaEvolve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_evo").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, table, nation)
    append(spark, table, nation.where(col("n_nationkey") < 5)
      .withColumn("extra", (col("n_nationkey") * 2).cast("long")))
    read(spark, table).orderBy("n_nationkey", "extra")
  }

  val occSchemaEvolveSql: String =
    """SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS BIGINT) AS extra
      |FROM nation
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey,
      |       CAST(n_nationkey * 2 AS BIGINT) AS extra
      |FROM nation WHERE n_nationkey < 5
      |ORDER BY n_nationkey, extra""".stripMargin

  /** MERGE (upsert) through the log: range-cluster orders on the key,
    * merge a CDC-shaped source — doubled prices for a key range (updates)
    * plus negated-key copies of a low range (inserts) — and read the tip.
    * The key range is clustered AND passed as indexCol, so the merge's
    * affected-file scan is bounds-pruned (CommitLogSpec asserts the file
    * counts; here the oracle asserts the upsert arithmetic). Oracle: the
    * three-way complement / updated / inserted UNION ALL. */
  def occMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_merge").toString
    // persisted within this invocation only: the seed and both CDC arms
    // read the same projection (see occConstraints)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    val updates = o.where(col("o_orderkey").between(1000, 3000))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = o.where(col("o_orderkey").between(1, 100))
      .withColumn("o_orderkey", -col("o_orderkey"))
    mergeInto(spark, table, updates.unionByName(inserts),
      Seq("o_orderkey"), Some("o_orderkey"))
    o.unpersist()
    read(spark, table).orderBy("o_orderkey")
  }

  val occMergeUpsertSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey NOT BETWEEN 1000 AND 3000
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
      |UNION ALL
      |SELECT -o_orderkey AS o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey BETWEEN 1 AND 100
      |ORDER BY o_orderkey""".stripMargin

  /** Merge-on-read MERGE through a deletion vector: the same upsert
    * arithmetic as [[occMergeUpsert]] (doubled prices for a key range =
    * updates, negated-key copies of a low range = inserts) but via
    * [[mergeIntoDv]] — matched keys' old rows masked by ONE sidecar, all
    * source rows appended, zero data files rewritten (CommitLogDvSpec
    * asserts the physical claims; here the oracle asserts reader-visible
    * MERGE semantics match the copy-on-write form exactly). */
  def occMergeDv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_mergedv").toString
    // persisted within this invocation only (see occMergeUpsert)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    val updates = o.where(col("o_orderkey").between(1000, 3000))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = o.where(col("o_orderkey").between(1, 100))
      .withColumn("o_orderkey", -col("o_orderkey"))
    mergeIntoDv(spark, table, updates.unionByName(inserts), Seq("o_orderkey"))
    o.unpersist()
    read(spark, table).orderBy("o_orderkey")
  }

  val occMergeDvSql: String = occMergeUpsertSql

  /** Append-feed window read: three appends with a compaction in between —
    * [[readChanges]] from the first version must return the post-v0 rows
    * exactly once, with the compaction's rewritten files excluded (those
    * rows already flowed at v0/v1). Oracle: the two later appends. */
  def occChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_cdf").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val v0 = append(spark, table, nation)
    append(spark, table, nation.where(col("n_nationkey") < 5))
    compact(spark, table, targetFiles = 1)
    append(spark, table, nation.where(col("n_nationkey") >= 20))
    val (_, batch) = readChanges(spark, table, fromVersion = v0)
    batch.get.orderBy("n_nationkey")
  }

  val occChangeFeedSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |WHERE n_nationkey < 5
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey FROM nation
      |WHERE n_nationkey >= 20
      |ORDER BY n_nationkey""".stripMargin

  /** Z-order clustered append + two-dimension box read: orders clustered
    * on the interleaved (o_custkey, o_orderkey) z-value with a per-file
    * zonemap on BOTH columns, then a box predicate over both dimensions —
    * [[readWhereBox]] opens only zonemap-overlapping files (CommitLogSpec
    * asserts the pruned file counts on each axis; here the oracle asserts
    * the pruning lost no rows). Oracle: the same conjunctive filter as a
    * plain scan. */
  def occZorderRead(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("occ_zorder").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    appendClustered(spark, table, o, Seq("o_custkey", "o_orderkey"), files = 16)
    readWhereBox(spark, table,
      Map("o_custkey" -> (100d, 500d), "o_orderkey" -> (0d, 100000d)))
      .orderBy("o_orderkey")
  }

  val occZorderReadSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey BETWEEN 100 AND 500
      |  AND o_orderkey BETWEEN 0 AND 100000
      |ORDER BY o_orderkey""".stripMargin

  /** Merge-on-read DML through deletion vectors: range-cluster orders,
    * dv-delete a key range (v1 — ONE tiny (file, pos) sidecar, ZERO data
    * files rewritten), dv-delete an OVERLAPPING range (v2 — the masked
    * scan finds only the not-yet-masked remainder; masking is
    * idempotent), dv-update a disjoint range (v3 — old positions masked,
    * updated rows appended), then read the tip through the mask.
    * CommitLogDvSpec asserts the physical claims (file identity
    * preserved, sidecar sizes, conflict rules, compaction
    * materialization); here the oracle asserts reader-visible SQL
    * semantics match copy-on-write exactly. */
  def occDeleteDv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_dv").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    deleteWhereDv(spark, table, col("o_orderkey").between(1000, 3000))
    deleteWhereDv(spark, table, col("o_orderkey").between(2500, 3500))
    updateWhereDv(spark, table, col("o_orderkey").between(4000, 4500),
      Map("o_totalprice" -> (col("o_totalprice") * 2)))
    read(spark, table).orderBy("o_orderkey")
  }

  val occDeleteDvSql: String =
    """SELECT o_orderkey, o_orderstatus,
      |       CASE WHEN o_orderkey BETWEEN 4000 AND 4500
      |            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey NOT BETWEEN 1000 AND 3500
      |ORDER BY o_orderkey""".stripMargin

  /** Bloom-pruned point lookups: orders lands ROUND-ROBIN in 8 files (so
    * every file spans the full key domain and range stats cannot prune
    * anything) with a per-file bloom on the key, then three point reads
    * open only bloom-positive files (BloomSkipSpec asserts the file
    * counts and the no-false-negative sweep; here the oracle asserts the
    * lookups return exactly the right rows). */
  def occBloomRead(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("occ_bloom").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendBloomed(spark, table, o.repartition(8), "o_orderkey", bits = 1 << 18)
    Seq(11L, 702L, 1303L)
      .map(k => readWhereEquals(spark, table, "o_orderkey", k))
      .reduce(_.unionByName(_))
      .orderBy("o_orderkey")
  }

  val occBloomReadSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey IN (11, 702, 1303)
      |ORDER BY o_orderkey""".stripMargin

  /** Row-level CDC feed: append nation (v0), CDC-enabled merge — updated
    * regionkeys for keys < 5 plus key+100 inserts — (v1), CDC-enabled
    * delete of the untouched keys in [20, 100) (v2), then the
    * full-fidelity feed from genesis: v0's adds synthesize `insert`
    * rows, v1 contributes pre/postimage + insert change rows, v2 the
    * `delete` rows. Oracle: the five arms written out. */
  def occCdcFeed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_cdc_rows").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, table, nation)
    val updates = nation.where(col("n_nationkey") < 5)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
    val inserts = nation.where(col("n_nationkey") < 5)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    mergeInto(spark, table, updates.unionByName(inserts),
      Seq("n_nationkey"), cdc = true)
    deleteWhere(spark, table,
      col("n_nationkey") >= 20 && col("n_nationkey") < 100, cdc = true)
    val (_, feed) = readChangesCdc(spark, table, fromVersion = -1L)
    feed.get.orderBy("_commit_version", "_change_type", "n_nationkey")
  }

  /** CDC replica maintenance end-to-end through the BATCH api: the same
    * mutation script as [[occCdcFeed]] runs against a source table, and a
    * replica is maintained purely from [[readChangesCdc]] windows applied
    * with [[applyChanges]] (bootstrap insert batch, then a window spanning
    * a CDC merge AND a CDC delete — per-key last-change-wins across the
    * window). Oracle: the source's expected final state — proving the
    * feed + apply pair reconstructs the table exactly, retractions
    * included. (The STREAMING face of the same loop is
    * ChangeFeedStreamSpec's replica test.) */
  def occApplyChanges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("occ_apply_src").toString
    val replica = Files.createTempDirectory("occ_apply_rep").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, src, nation)
    val (cursor, boot) = readChangesCdc(spark, src, fromVersion = -1L)
    boot.foreach(b => applyChanges(spark, replica, b, Seq("n_nationkey")))
    val updates = nation.where(col("n_nationkey") < 5)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
    val inserts = nation.where(col("n_nationkey") < 5)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    mergeInto(spark, src, updates.unionByName(inserts),
      Seq("n_nationkey"), cdc = true)
    deleteWhere(spark, src,
      col("n_nationkey") >= 20 && col("n_nationkey") < 100, cdc = true)
    val (_, window) = readChangesCdc(spark, src, fromVersion = cursor)
    window.foreach(w => applyChanges(spark, replica, w, Seq("n_nationkey")))
    // a zero-row fixture never creates the replica (an all-empty apply is
    // a no-op by design) — return the source's schema-stable empty frame
    if (latestVersion(replica) < 0)
      read(spark, src).where(org.apache.spark.sql.functions.lit(false))
        .orderBy("n_nationkey")
    else read(spark, replica).orderBy("n_nationkey")
  }

  val occApplyChangesSql: String =
    """SELECT n_nationkey, n_name,
      |       CASE WHEN n_nationkey < 5 THEN n_regionkey + 100
      |            ELSE n_regionkey END AS n_regionkey
      |FROM nation WHERE n_nationkey < 20
      |UNION ALL
      |SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey
      |FROM nation WHERE n_nationkey < 5
      |ORDER BY n_nationkey""".stripMargin

  /** Copy-on-write UPDATE through the log: range-cluster orders, update a
    * key range (status overwritten, price scaled — RHS referencing the
    * OLD row), read the tip. Untouched files keep their identity
    * (CommitLogSpec asserts the counts); here the oracle asserts the SQL
    * UPDATE arithmetic via the equivalent CASE projection. */
  def occUpdateWhere(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val table = Files.createTempDirectory("occ_upd").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    updateWhere(spark, table, col("o_orderkey").between(1000, 3000),
      Map("o_orderstatus" -> lit("U"),
          "o_totalprice"  -> col("o_totalprice") * 2),
      Some("o_orderkey"))
    read(spark, table).orderBy("o_orderkey")
  }

  val occUpdateWhereSql: String =
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey BETWEEN 1000 AND 3000
      |            THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
      |       CASE WHEN o_orderkey BETWEEN 1000 AND 3000
      |            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** RESTORE through the log: append nation (v0), copy-on-write delete of
    * keys ≥ 10 (v1 — rewrites files), append extra rows (v2), then
    * restore to v0 — the later files are removed, v0's tombstoned files
    * re-added, and the tip reads as the ORIGINAL nation (the delete and
    * the extra append both undone; file-identity assertions live in
    * CommitLogSpec). Oracle: plain nation. */
  def occRestore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_restore").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val v0 = append(spark, table, nation)
    deleteWhere(spark, table, col("n_nationkey") >= 10)
    append(spark, table, nation.where(col("n_nationkey") < 3)
      .withColumn("n_nationkey", col("n_nationkey") + 1000))
    restore(table, v0)
    read(spark, table).orderBy("n_nationkey")
  }

  val occRestoreSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** CHECK constraints through the log: append orders, add a positivity
    * constraint, attempt a violating batch (atomically rejected — typed
    * error, nothing committed), then land a compliant doubled-price batch
    * and read the tip. Oracle: orders UNION ALL the compliant batch — the
    * violating batch is provably absent. */
  def occConstraints(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_check").toString
    // persisted within this invocation only (the occ_maintain pattern):
    // the seed append, the violating batch and the compliant batch all
    // filter the same projection — one scan instead of three
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    append(spark, table, o)
    addConstraint(spark, table, "positive_price", "o_totalprice > 0")
    val violating = o.where(col("o_orderkey") <= 200)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val rejected =
      try { append(spark, table, violating); false }
      catch { case _: ConstraintViolationException => true }
    // on a zero-row fixture there is nothing to violate — the batch
    // legitimately lands empty; on any populated fixture it MUST reject
    require(rejected || violating.isEmpty,
      "a non-empty violating batch must be rejected")
    append(spark, table, o.where(col("o_orderkey") <= 100)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    o.unpersist()
    read(spark, table).orderBy("o_orderkey", "o_totalprice")
  }

  val occConstraintsSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      |FROM orders WHERE o_orderkey <= 100
      |ORDER BY o_orderkey, o_totalprice""".stripMargin

  /** DESCRIBE HISTORY through the log: a deterministic six-commit script
    * (single-file appends so the add/remove counts are pinned) — append,
    * append, CDC delete, compact, property, restore — then the history
    * table itself is the query result. Oracle: the six rows as literals,
    * which is the point — provenance is now a queryable contract, not a
    * debug printout. */
  def occHistory(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_history").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, table, nation.coalesce(1))
    val v1 = append(spark, table, nation.where(col("n_nationkey") < 5).coalesce(1))
    deleteWhere(spark, table, col("n_nationkey") >= 20, cdc = true)
    compact(spark, table, targetFiles = 1)
    setTableProperty(table, "cdc", "true")
    restore(table, v1)
    history(spark, table).orderBy("version")
  }

  val occHistorySql: String =
    """SELECT CAST(version AS BIGINT) AS version, operation,
      |       CAST(num_added AS BIGINT) AS num_added,
      |       CAST(num_removed AS BIGINT) AS num_removed,
      |       CAST(num_change_files AS BIGINT) AS num_change_files
      |FROM (VALUES (0, 'append',   1, 0, 0),
      |             (1, 'append',   1, 0, 0),
      |             (2, 'delete',   1, 1, 1),
      |             (3, 'compact',  1, 2, 0),
      |             (4, 'property', 0, 0, 0),
      |             (5, 'restore',  2, 1, 0))
      |  AS t(version, operation, num_added, num_removed, num_change_files)
      |ORDER BY version""".stripMargin

  /** The capture-lifecycle unification proof as a QUERY: the events fact
    * table lives on the commit log (range-clustered appendIndexed on
    * user_id, the layout the per-user analytics prune on) and the
    * flagship user_energy analytic runs over [[read]] UNCHANGED — same
    * oracle as `user_energy` itself, so the gate proves the ACID layer
    * is a drop-in storage for the reference lifecycle (the remaining
    * four analytics are pinned equal in CaptureLogSpec). */
  def occKomodoEnergy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_events").toString
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "ts_ms", "k", "x", "y", "z")
    appendIndexed(spark, table, ev.repartitionByRange(8, col("user_id")),
      "user_id")
    graft.operators.Komodo.userEnergyFrom(read(spark, table))
  }

  /** The SQL surface end-to-end (the r16 verdict's #2 ask): orders lands
    * range-clustered through [[appendIndexed]], a key range is dv-deleted
    * (merge-on-read — the mask must apply through SQL too), the table is
    * loaded via `spark.read.format("graft-commitlog")` with the
    * `indexCol` option naming the clustered column, registered as a temp
    * view, and the analytic is RAW SQL TEXT over that view — the
    * reference's native mode (every reference analytic is a SQL string,
    * process.py:79-84). The BETWEEN predicate is pushed into the
    * relation, which prunes files on the recorded bounds exactly as
    * [[readWhere]] does (CommitLogRelationSpec pins the file-count
    * equality); the oracle asserts the pruning + mask lost no rows. */
  def occSqlRead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_sql").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey")
    deleteWhereDv(spark, table, col("o_orderkey").between(1500, 1600))
    spark.read.format("graft-commitlog")
      .option("table", table).option("indexCol", "o_orderkey").load()
      .createOrReplaceTempView("occ_sql_read_view")
    spark.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM occ_sql_read_view
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin)
  }

  val occSqlReadSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey BETWEEN 1000 AND 2000
      |  AND o_orderkey NOT BETWEEN 1500 AND 1600
      |ORDER BY o_orderkey""".stripMargin

  /** The OBJECT-STORE commit protocol under the gate (r18): the same
    * script as [[occSqlRead]] — range-clustered append, dv delete, SQL
    * text over the loaded view — but EVERY log access goes through
    * [[FencedStore]] (staged blind PUT + claim arbiter + read repair,
    * the no-atomic-rename protocol), selected via the DataSource `store`
    * option. Before the read, a SECOND writer claims the next version
    * and crashes before publishing (the step-3→4 crash window), so the
    * SQL path itself must read-repair the claimed tip to resolve the
    * snapshot. Oracle: [[occSqlReadSql]] verbatim — a commit protocol
    * must never change one row. */
  def occStoreFenced(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_fenced").toString
    val store = new FencedStore()
    CommitLogProvider.registerStore("occ-fenced", store)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    appendIndexed(spark, table, o.repartitionByRange(8, col("o_orderkey")),
      "o_orderkey", store)
    deleteWhereDv(spark, table, col("o_orderkey").between(1500, 1600),
      store = store)
    // the crash window: a claim with no published object (its content —
    // an empty commit — is durable in the staged payload the repair
    // replays; FencedStoreSpec proves the non-empty forms)
    new FencedStore(crashBeforePublish = true).putIfAbsent(
      Paths.get(table, "_log", f"v${latestVersion(table, store) + 1}%012d.json"), "")
    spark.read.format("graft-commitlog")
      .option("table", table).option("indexCol", "o_orderkey")
      .option("store", "occ-fenced").load()
      .createOrReplaceTempView("occ_fenced_view")
    spark.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM occ_fenced_view
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin)
  }

  val occStoreFencedSql: String = occSqlReadSql

  /** Maintenance through the gate: orders lands as EIGHT fragmented
    * single-file appends (the streaming-sink shape), a key range is
    * dv-deleted, then ONE [[maintain]] tick — over threshold on both
    * gauges — compacts the fragments and materializes the mask, and a
    * second tick proves idempotence (no-op, nothing committed). The
    * oracle asserts maintenance changed NOTHING a reader can see: the
    * tip equals the plain complement filter. CommitLogSpec asserts the
    * physical side (file counts, retired sidecars, no-op tick). */
  def occMaintain(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_maint").toString
    // persisted WITHIN this invocation only: the eight fragmented appends
    // each filter the same projection, and without the cache each one
    // re-scans the source parquet (8 scans for 1 table's bytes — guide
    // §1.2 step 1, don't re-read what you already hold). Released before
    // returning, so nothing outlives the call.
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    (0 until 8).foreach { i =>
      append(spark, table, o.where(pmod8(col("o_orderkey")) === i).coalesce(1))
    }
    o.unpersist()
    deleteWhereDv(spark, table, col("o_orderkey").between(1000, 3000))
    val v = maintain(spark, table, maxFiles = 4, maxMaskRows = 0L, targetFiles = 2)
    require(v >= 0, "the over-threshold tick must compact")
    require(maintain(spark, table, maxFiles = 4, maxMaskRows = 0L) == -1L,
      "the second tick must be a no-op")
    read(spark, table).orderBy("o_orderkey")
  }

  private def pmod8(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.pmod(c, org.apache.spark.sql.functions.lit(8))

  val occMaintainSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey NOT BETWEEN 1000 AND 3000
      |ORDER BY o_orderkey""".stripMargin

  /** The change feed's SQL surface: the same three-commit CDC script as
    * [[occCdcFeed]], but the feed is loaded as a BATCH window through
    * `spark.read.format("graft-changefeed").option("cdc", "true")`,
    * registered as a view, and the analytic is SQL text over it — the
    * `table_changes()` shape. Oracle: [[occCdcFeedSql]] unchanged (the
    * window is the whole feed, and windows are immutable). */
  def occSqlChanges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_sql_cdc").toString
    val nation = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    append(spark, table, nation)
    val updates = nation.where(col("n_nationkey") < 5)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
    val inserts = nation.where(col("n_nationkey") < 5)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    mergeInto(spark, table, updates.unionByName(inserts),
      Seq("n_nationkey"), cdc = true)
    deleteWhere(spark, table,
      col("n_nationkey") >= 20 && col("n_nationkey") < 100, cdc = true)
    spark.read.format("graft-changefeed")
      .option("table", table).option("cdc", "true").load()
      .createOrReplaceTempView("occ_sql_changes_view")
    spark.sql(
      """SELECT n_nationkey, n_name, n_regionkey, _change_type, _commit_version
        |FROM occ_sql_changes_view
        |ORDER BY _commit_version, _change_type, n_nationkey""".stripMargin)
  }

  // def, not val: occCdcFeedSql is declared later in this object and a
  // val here would capture null during object initialization
  def occSqlChangesSql: String = occCdcFeedSql

  /** The batch WRITE face end-to-end: the table is created, extended and
    * replaced purely through `df.write.format("graft-commitlog")` —
    * ErrorIfExists create (range-clustered, indexCol bounds recorded),
    * an Append, then an atomic Overwrite with the doubled-price
    * projection — and read back at the tip. The oracle pins overwrite
    * semantics: only the final projection is visible (the earlier
    * create and append are replaced — and still time-travelable,
    * CommitLogRelationSpec asserts that side). */
  def occSqlWrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_sqlw").toString
    // persisted within this invocation only: three writes read the same
    // projection (see occConstraints)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    def writer(df: DataFrame) = df.write.format("graft-commitlog")
      .option("table", table).option("indexCol", "o_orderkey")
    writer(o.repartitionByRange(8, col("o_orderkey")))
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists).save()
    writer(o.where(col("o_orderkey") <= 100))
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    writer(o.withColumn("o_totalprice", col("o_totalprice") * 2)
        .repartitionByRange(8, col("o_orderkey")))
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    o.unpersist()
    read(spark, table).orderBy("o_orderkey")
  }

  val occSqlWriteSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** SQL-text DML end-to-end (the r17 verdict's #3 ask): the table is
    * catalog-registered (`CREATE TABLE … USING graft-commitlog`), then
    * mutated purely with SQL statements — `INSERT OVERWRITE` (the doubled-
    * price even keys replace the seed atomically) followed by
    * `INSERT INTO` (the odd keys append) — the reference's native write
    * idiom (INSERT INTO … SELECT / INSERT VALUES, process.py:79-84,
    * 301-303), routed through [[CommitLogRelation.insert]] into the same
    * OCC commit paths as every other face. The INSERT INTO resolves the
    * relation AFTER the overwrite's cache invalidation, so the statement
    * pair also pins tip-following across in-session SQL writes; the final
    * SELECT is SQL text over the catalog name. Constraint/txn semantics
    * through this face are CommitLogRelationSpec's side. */
  def occSqlInsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val table = Files.createTempDirectory("occ_sqli").toString
    // persisted within this invocation only: the create write and both
    // SQL INSERT...SELECTs over the temp view read the same projection
    // (see occConstraints)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .persist()
    o.write.format("graft-commitlog").option("table", table)
      .option("indexCol", "o_orderkey")
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists).save()
    o.createOrReplaceTempView("occ_sqli_src")
    spark.sql("DROP TABLE IF EXISTS occ_sqli")
    spark.sql(
      s"""CREATE TABLE occ_sqli USING `graft-commitlog`
         |OPTIONS (table '$table', indexCol 'o_orderkey')""".stripMargin)
    spark.sql(
      """INSERT OVERWRITE occ_sqli
        |SELECT o_orderkey, o_orderstatus, o_totalprice * 2
        |FROM occ_sqli_src WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO occ_sqli
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM occ_sqli_src WHERE o_orderkey % 2 = 1""".stripMargin)
    o.unpersist()
    spark.sql("SELECT o_orderkey, o_orderstatus, o_totalprice FROM occ_sqli ORDER BY o_orderkey")
  }

  val occSqlInsertSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  val occCdcFeedSql: String =
    """SELECT n_nationkey, n_name, n_regionkey,
      |       'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
      |FROM nation
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', 1
      |FROM nation WHERE n_nationkey < 5
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey + 100, 'update_postimage', 1
      |FROM nation WHERE n_nationkey < 5
      |UNION ALL
      |SELECT n_nationkey + 100, n_name, n_regionkey, 'insert', 1
      |FROM nation WHERE n_nationkey < 5
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey, 'delete', 2
      |FROM nation WHERE n_nationkey >= 20 AND n_nationkey < 100
      |ORDER BY _commit_version, _change_type, n_nationkey""".stripMargin
}
