package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Conditional-write primitive behind the writer lease — the seam that
  * closes the stale-takeover race where the backing store can (the
  * read-then-write windows a plain filesystem forces). Every
  * mutation is conditioned on the lease's CURRENT VALUE (value-CAS,
  * no etag bookkeeping): a holder's heartbeat can only refresh the
  * exact lease it last wrote, a waiter's stale break can only replace
  * the exact stale value it judged, and a release can only delete the
  * holder's own value — so with an atomic implementation, two writers
  * racing through takeover/beat/release can never clobber each other.
  *
  * Implementations:
  *  - [[HadoopLeaseStore]] — the local-FS / HDFS fallback. `tryCreate`
  *    is atomic where the filesystem's create-if-absent is;
  *    `takeOver` keeps the rename-to-tombstone election (of N waiters
  *    exactly one rename wins); `replaceIf`/`deleteIf` are
  *    read-compare-write, best-effort by nature — the documented
  *    residual window, unchanged from before this seam existed.
  *  - [[InMemoryCasStore]] — a genuinely atomic value-CAS
  *    (AtomicReference), the reference implementation an object-store
  *    adapter (S3 If-Match, GCS generation preconditions, etcd) should
  *    mirror; also what the contention spec drives to prove the fenced
  *    protocol. One instance per coordination scope, shared by all
  *    in-process writers.
  *
  * Lease values are small opaque byte strings; content equality is the
  * condition. The protocol ([[WriterLease]]) makes every value unique
  * per write (holder UUID + stamp), so value-CAS is as strong as
  * version-CAS here. */
trait LeaseStore {
  // Error contract, shared by every method: a boolean `false` (or a
  // `None`) means the CONDITION genuinely failed — the value exists /
  // mismatches / is absent — never that the store was unreachable. A
  // transient store failure must surface as `java.io.IOException`
  // instead, so the protocol can retry it: a heartbeat that read
  // "usurped" from a network blip would stop beating permanently, a
  // long commit would then look stale, and a waiter would break the
  // lease MID-WRITE — the exact double-writer interleaving the lease
  // exists to prevent.

  /** Create-if-absent. True iff this call created the value. */
  def tryCreate(content: Array[Byte]): Boolean
  /** Current value, if any. */
  def read(): Option[Array[Byte]]
  /** Holder's refresh: replace `expect` with `next` iff the current
    * value equals `expect`. */
  def replaceIf(expect: Array[Byte], next: Array[Byte]): Boolean
  /** Waiter's stale break: same condition as [[replaceIf]], but
    * implementations without a true CAS may use a stronger-than-
    * overwrite election primitive here (the FS tombstone rename). */
  def takeOver(expect: Array[Byte], next: Array[Byte]): Boolean
  /** Delete iff the current value equals `expect`. */
  def deleteIf(expect: Array[Byte]): Boolean
}

/** Filesystem lease slot (`_lease` under the table root) — the
  * best-effort fallback: create-if-absent is atomic on HDFS (and on
  * object stores that implement it conditionally); the conditional
  * replace/delete are read-compare-write with the residual window the
  * table doc names. Correctness never rests on it — the manifest
  * `basedOn` check fences the loser — the lease only converts retry
  * storms into waiting. */
final class HadoopLeaseStore(fs: FileSystem, path: Path) extends LeaseStore {

  // Publication is ATOMIC: a reader observes the slot absent, the old
  // value, or the new value — never empty or partial bytes. The old
  // create-then-write shape had an observable window (a concurrent
  // read between create and write saw zero bytes), and an empty slot
  // parses holderless → the next waiter breaks a LIVE holder's lease
  // mid-commit, the exact interleaving the heartbeat exists to
  // prevent. Full content goes to a hidden temp name first, then
  // lands in one filesystem-atomic step:
  //  - local FS: a hard link (create-if-absent WITH content; fails
  //    with FileAlreadyExistsException when the slot is held) or an
  //    atomic rename-over for the holder's refresh. Raw java.nio on
  //    the underlying file — Hadoop's local rename delegates to
  //    POSIX rename(2), which silently REPLACES an existing
  //    destination and would let two racing creates both "win".
  //  - HDFS-style FS: `rename(tmp, path)`, atomic and refusing an
  //    existing destination — exactly create-if-absent.

  /** The underlying java.io.File when `fs` is the local filesystem
    * (checksummed or raw); None → go through the Hadoop API. */
  private def localFile(p: Path): Option[java.io.File] = fs match {
    case l: org.apache.hadoop.fs.LocalFileSystem => Some(l.pathToFile(p))
    case r: org.apache.hadoop.fs.RawLocalFileSystem => Some(r.pathToFile(p))
    case _ => None
  }

  /** Drop a stale ChecksumFileSystem sidecar after a raw-nio publish:
    * the lease value never goes through `fs.create` on the local FS
    * anymore, so a leftover `.name.crc` from an older writer would
    * mismatch and fail reads forever. */
  private def dropCrcSidecar(dst: java.io.File): Unit = {
    val crc = new java.io.File(dst.getParentFile, s".${dst.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  private def tmpFor(dst: java.io.File): java.io.File =
    new java.io.File(dst.getParentFile,
      s".${dst.getName}.tmp.${java.util.UUID.randomUUID()}")

  override def tryCreate(content: Array[Byte]): Boolean =
    localFile(path) match {
      case Some(dst) =>
        java.nio.file.Files.createDirectories(dst.getParentFile.toPath)
        val tmp = tmpFor(dst)
        java.nio.file.Files.write(tmp.toPath, content)
        try {
          java.nio.file.Files.createLink(dst.toPath, tmp.toPath)
          dropCrcSidecar(dst)
          true
        } catch {
          // the existence signal — the slot is held
          case _: java.nio.file.FileAlreadyExistsException => false
          // anything else is a transient store failure: propagates
          // per the trait contract
        } finally java.nio.file.Files.deleteIfExists(tmp.toPath)
      case None =>
        val tmp = new Path(path.getParent,
          s".${path.getName}.tmp.${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, false)
        try out.write(content) finally out.close()
        try {
          if (fs.rename(tmp, path)) true
          else {
            // rename refuses an existing destination (the held slot);
            // any OTHER refusal is a store failure and must propagate,
            // not read as "held"
            val exists =
              try fs.exists(path)
              catch { case e: java.io.IOException => throw e }
            if (exists) false
            else throw new java.io.IOException(
              s"lease publish: rename($tmp -> $path) refused with no " +
                "existing destination")
          }
        } finally {
          try fs.delete(tmp, false)
          catch { case _: java.io.IOException => () } // residue harmless
        }
    }

  override def read(): Option[Array[Byte]] =
    try {
      val in = fs.open(path)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    } catch {
      // absent is the only IOException that MEANS "no value"; a
      // transient failure propagates so a heartbeat doesn't read it as
      // "usurped" and stop beating
      case _: java.io.FileNotFoundException => None
    }

  override def replaceIf(expect: Array[Byte], next: Array[Byte]): Boolean =
    read().exists(java.util.Arrays.equals(_, expect)) && {
      // the read-compare-write window is the documented best-effort
      // residual; the PUBLICATION itself is atomic — old value or new
      // value, never empty bytes
      localFile(path) match {
        case Some(dst) =>
          val tmp = tmpFor(dst)
          java.nio.file.Files.write(tmp.toPath, next)
          try {
            java.nio.file.Files.move(tmp.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            dropCrcSidecar(dst)
            true
          } finally java.nio.file.Files.deleteIfExists(tmp.toPath)
        case None =>
          // HDFS rename refuses an existing destination, so the
          // overwrite is delete-then-rename: the in-between window
          // reads ABSENT (holderless — a waiter may claim the free
          // slot, and this refresh then genuinely loses), never empty
          val tmp = new Path(path.getParent,
            s".${path.getName}.tmp.${java.util.UUID.randomUUID()}")
          val out = fs.create(tmp, false)
          try out.write(next) finally out.close()
          try {
            fs.delete(path, false)
            fs.rename(tmp, path) // false: a racer claimed the slot first
          } finally {
            try fs.delete(tmp, false)
            catch { case _: java.io.IOException => () }
          }
      }
    }

  override def takeOver(expect: Array[Byte], next: Array[Byte]): Boolean =
    read().exists(java.util.Arrays.equals(_, expect)) && {
      // rename to a unique tombstone: of N waiters that all judged the
      // same stale value, exactly one rename wins and frees the slot —
      // delete-then-create would let two waiters both delete (the
      // second deleting the NEW holder's fresh lease) and both acquire.
      // A FALSE rename is the lost election; an IOException is a store
      // failure and propagates.
      val tomb = new Path(path.getParent,
        s"${path.getName}.broken.${java.util.UUID.randomUUID()}")
      if (fs.rename(path, tomb)) {
        try fs.delete(tomb, false)
        catch { case _: java.io.IOException => () } // residue is harmless
        tryCreate(next)
      } else false
    }

  override def deleteIf(expect: Array[Byte]): Boolean =
    read().exists(java.util.Arrays.equals(_, expect)) &&
      fs.delete(path, false)
}

/** Atomic value-CAS lease slot — the semantics a conditional-put
  * object store gives. Linearized on the instance monitor with VALUE
  * comparison (an AtomicReference.compareAndSet would compare the
  * Option wrapper by reference and never match a value re-read through
  * [[read]]); in-process, so it also serves as real coordination for
  * multiple writer THREADS sharing a JVM, and as the contention spec's
  * probe that the [[WriterLease]] protocol is fully fenced when the
  * primitive is. */
final class InMemoryCasStore extends LeaseStore {
  private var cur: Option[Seq[Byte]] = None

  override def tryCreate(content: Array[Byte]): Boolean = synchronized {
    if (cur.isEmpty) { cur = Some(content.toSeq); true } else false
  }

  override def read(): Option[Array[Byte]] =
    synchronized { cur.map(_.toArray) }

  override def replaceIf(expect: Array[Byte], next: Array[Byte]): Boolean =
    synchronized {
      if (cur.contains(expect.toSeq)) { cur = Some(next.toSeq); true }
      else false
    }

  override def takeOver(expect: Array[Byte], next: Array[Byte]): Boolean =
    replaceIf(expect, next)

  override def deleteIf(expect: Array[Byte]): Boolean = synchronized {
    if (cur.contains(expect.toSeq)) { cur = None; true } else false
  }
}

/** The writer-lease protocol over a [[LeaseStore]]: acquire by
  * create-if-absent, keep alive by a heartbeat that refreshes only the
  * value it last wrote, break a stale holder by replacing exactly the
  * stale value observed, release by deleting only one's own value.
  * Staleness is judged from the STAMP inside the lease value (a live
  * holder's heartbeat refreshes it every `staleMillis/3`), against an
  * injectable `clock` — so a spec can force the takeover interleaving
  * without wall-clock sleeps.
  *
  * With an atomic store every transition is fenced: the usurped
  * holder's zombie beat fails its CAS and stops; its release fails its
  * CAS and leaves the usurper's lease intact. With the FS fallback the
  * same protocol runs with the documented best-effort windows. */
final class WriterLease(
    store: LeaseStore,
    what: String,
    staleMillis: Long,
    acquireTimeoutMillis: Long,
    pollMillis: Long = 50L,
    clock: () => Long = () => System.currentTimeMillis()) {

  /** One acquired lease: beat/release operate on the exact value this
    * holder last wrote. */
  final class Handle private[WriterLease] (val holder: String,
      @volatile private var current: Array[Byte]) {

    /** One heartbeat refresh. Returns false ONLY when the lease was
      * genuinely lost (usurped after a stale judgment) — the holder
      * must stop beating; its in-flight commit still ends at the
      * manifest conflict check. A transient store failure propagates
      * as IOException instead (the [[LeaseStore]] error contract), so
      * the heartbeat loop's existing catch retries on the next beat —
      * one network blip must not permanently silence a live holder's
      * heartbeat and invite a mid-write stale break. A missing value
      * (mid-break window) may be recreated at most once per
      * observation — the documented at-most-once recreate, aged out by
      * the next waiter. */
    def beat(): Boolean = {
      val next = content(holder)
      if (store.replaceIf(current, next)) { current = next; true }
      else store.read() match {
        case Some(cur) if holderOf(cur).contains(holder) =>
          // our own earlier write under a weak store — adopt and go on
          current = cur; true
        case Some(_) => false // genuinely usurped
        case None =>
          if (store.tryCreate(next)) { current = next; true }
          else store.read() match {
            case Some(cur) if holderOf(cur).contains(holder) =>
              current = cur; true
            case _ => false
          }
      }
    }

    /** Fenced release: deletes only this holder's own value; a
      * usurper's lease survives an old holder's release. */
    def release(): Unit = {
      if (!store.deleteIf(current))
        // weak-store fallback: the value may have been refreshed by a
        // racing beat of OUR OWN thread's last write; only ever delete
        // a value that still names this holder
        store.read() match {
          case Some(cur) if holderOf(cur).contains(holder) =>
            store.deleteIf(cur); ()
          case _ => ()
        }
      ()
    }
  }

  private def content(holder: String): Array[Byte] =
    s"$holder\n${clock()}\n".getBytes("UTF-8")

  private def holderOf(bytes: Array[Byte]): Option[String] =
    new String(bytes, "UTF-8").linesIterator.find(_.nonEmpty)

  private def stampOf(bytes: Array[Byte]): Option[Long] =
    new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty)
      .toSeq.lift(1).flatMap(_.toLongOption)

  /** Blocks until acquired (create-if-absent, or a CAS break of a
    * stale value), up to the configured timeout. */
  def acquire(holder: String): Handle = {
    val deadline = clock() + acquireTimeoutMillis
    while (true) {
      val mine = content(holder)
      try {
        if (store.tryCreate(mine)) return new Handle(holder, mine)
        store.read() match {
          case None =>
            // just freed — but sleep before the re-create all the same:
            // a store whose create persistently fails while reads see
            // nothing (permissions, a dead backend) must neither
            // busy-spin the CPU nor hammer the store, and must still
            // honor the deadline
            if (clock() > deadline)
              throw new IllegalStateException(
                s"writer lease for $what: create-if-absent kept failing " +
                  s"against an EMPTY slot past ${acquireTimeoutMillis}ms — " +
                  "check store permissions/health")
            else Thread.sleep(pollMillis)
          case Some(cur) =>
            val stale = stampOf(cur).forall(clock() - _ > staleMillis)
            if (stale) {
              // break by replacing EXACTLY the stale value observed: of
              // N waiters that judged the same value, one CAS wins; with
              // a fresh beat landing in between, everyone's CAS fails
              // and the holder is (correctly) treated as live again. A
              // failed break sleeps and still honors the deadline — a
              // pathological store that churns the value forever must
              // not hot-loop
              if (store.takeOver(cur, mine)) return new Handle(holder, mine)
              else if (clock() > deadline)
                throw new IllegalStateException(
                  s"writer lease for $what: stale-break lost its CAS " +
                    s"repeatedly past ${acquireTimeoutMillis}ms — a " +
                    "live writer churn or a store that never matches")
              else Thread.sleep(pollMillis)
            } else if (clock() > deadline) {
              throw new IllegalStateException(
                s"writer lease for $what held by a concurrent writer for " +
                  s"longer than ${acquireTimeoutMillis}ms — raise the " +
                  "timeout, or check for a wedged (not crashed) holder")
            } else Thread.sleep(pollMillis)
        }
      } catch {
        // transient store failure (the LeaseStore error contract):
        // retry after a poll — the slot's true state is unknown, so
        // neither arm above applies — but never past the deadline
        case e: java.io.IOException =>
          if (clock() > deadline)
            throw new IllegalStateException(
              s"writer lease for $what: the lease store kept failing " +
                s"past ${acquireTimeoutMillis}ms", e)
          else Thread.sleep(pollMillis)
      }
    }
    sys.error("unreachable: the acquire loop exits only by return or throw")
  }
}
