package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** A second [[CommitLog.LogStore]] — the OBJECT-STORE commit protocol
  * (the r16 verdict's #3 ask: "the 100 TB north star runs on an object
  * store; until a second store exists, every multi-writer guarantee is
  * proven only on one filesystem's semantics").
  *
  * The client protocol assumes ONLY the primitives a pre-conditional-put
  * object store offers — the constraint set S3 defined for a decade:
  *
  *   - blind PUT: atomic per-object (a reader sees the whole object or
  *     none), but LAST-WRITER-WINS — no compare-and-swap, no
  *     put-if-absent, no atomic rename;
  *   - GET / LIST.
  *
  * Mutual exclusion therefore comes from an external ARBITER with one
  * conditional-write primitive (claim-if-absent) — the public
  * Delta-on-S3 multi-writer design (S3DynamoDBLogStore: commits are
  * CLAIMED in a DynamoDB table with `attribute_not_exists`, payloads
  * ride S3). The protocol, per `putIfAbsent(target, content)`:
  *
  *   1. blind-PUT the payload to a UNIQUE staged object (no race: the
  *      name is fresh);
  *   2. CLAIM `target` in the arbiter, recording the staged object's
  *      name. Exactly one concurrent claimant wins;
  *   3. the winner blind-PUTs the real `target` object (safe: the
  *      arbiter guarantees no other writer ever targets this name) —
  *      the claim plus the staged payload make the commit DURABLE
  *      before this publish, so a writer that crashes in the window
  *      between claim and publish loses nothing:
  *   4. ANY later reader/lister/loser that finds a claim without its
  *      object completes the publish from the staged payload (read
  *      repair) — recovery is idempotent (same bytes, atomic per-object
  *      PUT), so racing repairs are harmless.
  *
  * Losers return false after repairing the winner, exactly the
  * [[CommitLog.LocalStore]] contract — the OCC layer above runs
  * UNCHANGED (FencedStoreSpec re-runs the racing-writer suites through
  * this store).
  *
  * Emulation honesty: this container has no S3, so the two service-side
  * primitives are STOOD IN locally — blind PUT's per-object atomicity
  * by write-temp-then-rename (emulating the service's atomic object
  * publish, NOT used as client-visible rename semantics), and the
  * arbiter's claim-if-absent by a hard-link CAS under `_arbiter/`
  * (standing in for DynamoDB's conditional PutItem). The CLIENT logic —
  * staging, claiming, publish, read repair — contains no POSIX
  * assumption; swap the two emulated calls for real S3 PUT and real
  * DynamoDB conditional writes and the protocol is the production one.
  *
  * `crashBeforePublish` opens the step-3→4 crash window deliberately:
  * the claim lands, the object does not, and the spec proves a FRESH
  * store (another writer/reader on another node) repairs and continues.
  */
final class FencedStore(crashBeforePublish: Boolean = false)
  extends CommitLog.LogStore {

  private val ArbiterDir = "_arbiter"

  private def arbiterDir(dir: Path): Path = dir.resolve(ArbiterDir)
  private def claimFile(target: Path): Path =
    arbiterDir(target.getParent).resolve(s"${target.getFileName}.claim")

  /** Service-side stand-in: an object store's atomic whole-object PUT
    * (last writer wins; never a partial object). */
  private def blindPut(p: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".${p.getFileName}.${UUID.randomUUID()}.put")
    Files.write(tmp, bytes)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Arbiter stand-in: claim-if-absent (DynamoDB `attribute_not_exists`).
    * The claim body is the staged object's name — everything recovery
    * needs. */
  private def claim(target: Path, stagedName: String): Boolean = {
    val c = claimFile(target)
    Files.createDirectories(c.getParent)
    val tmp = c.resolveSibling(s".${c.getFileName}.${UUID.randomUUID()}.tmp")
    Files.write(tmp, stagedName.getBytes("UTF-8"))
    try { Files.createLink(c, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** Read repair: a claim whose object is not yet visible is completed
    * from its staged payload. Idempotent and safe under races — every
    * repairer writes the same bytes via an atomic per-object PUT. */
  private def repair(target: Path): Unit = {
    if (Files.exists(target)) return
    val c = claimFile(target)
    if (!Files.exists(c)) return
    val stagedName = new String(Files.readAllBytes(c), "UTF-8").trim
    val staged = target.resolveSibling(stagedName)
    if (Files.exists(staged)) {
      try blindPut(target, Files.readAllBytes(staged))
      catch {
        // the winner published and GC'd its staged payload between our
        // existence check and the read — the target is visible, done
        case _: java.nio.file.NoSuchFileException => ()
      }
    }
  }

  override def putIfAbsent(target: Path, content: String): Boolean = {
    // fast path: the object (or a repairable claim) already exists
    repair(target)
    if (Files.exists(target)) return false
    val stagedName = s".${target.getFileName}.${UUID.randomUUID()}.staged"
    val staged = target.resolveSibling(stagedName)
    blindPut(staged, content.getBytes("UTF-8"))
    if (claim(target, stagedName)) {
      // the commit is durable at claim time; publish is completion. The
      // staged payload is GC'd only AFTER the publish is visible (a
      // crashed winner's staged object is what read repair replays from).
      if (!crashBeforePublish) {
        blindPut(target, content.getBytes("UTF-8"))
        Files.deleteIfExists(staged)
      }
      true
    } else {
      repair(target)             // the loser completes a crashed winner
      Files.deleteIfExists(staged) // and GCs its own unclaimed payload
      false
    }
  }

  override def read(p: Path): String = {
    if (!Files.exists(p)) repair(p)
    new String(Files.readAllBytes(p), "UTF-8")
  }

  /** Arbiter GC: drop the claim (and any leftover staged payload) of
    * every PUBLISHED object — one tiny arbiter record per commit
    * otherwise accumulates forever (in production: a DynamoDB TTL or
    * sweep; here: an explicit maintenance call, the vacuum of the
    * coordination plane). Safe by the protocol's own fast path: once the
    * object is visible, `putIfAbsent` refuses on existence WITHOUT
    * consulting the claim, and read/list never need repair again. A
    * claim whose object is NOT yet published is a crashed winner's only
    * durability record — never collected. Returns the GC'd claim names. */
  def gcClaims(dir: Path): Seq[String] = {
    val arb = arbiterDir(dir)
    if (!Files.isDirectory(arb)) return Nil
    CommitLog.LocalStore.list(arb).flatMap { c =>
      val name = c.getFileName.toString
      if (!name.endsWith(".claim")) None
      else {
        val target = dir.resolve(name.stripSuffix(".claim"))
        if (!Files.exists(target)) None // crashed winner: keep for repair
        else {
          val stagedName = new String(Files.readAllBytes(c), "UTF-8").trim
          Files.deleteIfExists(target.resolveSibling(stagedName))
          Files.delete(c)
          Some(name)
        }
      }
    }
  }

  /** Listing repairs claimed-but-unpublished objects first, so the tip
    * is visible to the next writer/reader the moment its claim lands —
    * the property [[CommitLog.latestVersion]] rests on. Staged payloads
    * and the arbiter directory itself are hidden (dot-prefixed names
    * never match the log's version/checkpoint patterns anyway). */
  override def list(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val arb = arbiterDir(dir)
    if (Files.isDirectory(arb)) {
      CommitLog.LocalStore.list(arb).foreach { c =>
        val name = c.getFileName.toString
        if (name.endsWith(".claim"))
          repair(dir.resolve(name.stripSuffix(".claim")))
      }
    }
    CommitLog.LocalStore.list(dir)
      .filterNot(p => p.getFileName.toString == ArbiterDir)
  }
}
