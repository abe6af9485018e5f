package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.pipeline.{BucketedStateTable, HadoopLeaseStore, InMemoryCasStore, WriterLease}

/** The writer-lease CAS seam: with an atomic conditional-write store,
  * the stale-takeover interleavings the table doc names as the FS
  * fallback's residual race are FULLY fenced — a usurped holder's
  * zombie beat fails its CAS and stops, its release cannot delete the
  * usurper's lease, N waiters judging the same stale value elect
  * exactly one winner, and a live holder's beat landing between a
  * waiter's judgment and its break defeats the break. All clock-driven
  * (injectable), no wall-clock sleeps. */
class WriterLeaseSpec extends SparkSpec {

  private def protoOver(store: InMemoryCasStore,
      clock: java.util.concurrent.atomic.AtomicLong) =
    new WriterLease(store, "spec", staleMillis = 1000L,
      acquireTimeoutMillis = 60_000L, pollMillis = 1L,
      clock = () => clock.get())

  test("forced stale takeover: the usurped holder's zombie beat and release cannot clobber the new lease") {
    val store = new InMemoryCasStore
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val lease = protoOver(store, clock)

    val hA = lease.acquire("writerA")
    assert(new String(store.read().get, "UTF-8").startsWith("writerA\n"))

    // A stalls (no beats); the clock advances past staleness and B
    // breaks the lease by CAS-replacing exactly the stale value
    clock.set(2000L)
    val hB = lease.acquire("writerB")
    assert(new String(store.read().get, "UTF-8").startsWith("writerB\n"),
      "B must hold after the stale break")

    // A's zombie heartbeat: its CAS names A's old value — it must fail
    // and tell A to stop, leaving B's lease byte-identical
    val bBytes = store.read().get
    assert(!hA.beat(), "a usurped holder's beat must report the loss")
    assert(java.util.Arrays.equals(store.read().get, bBytes),
      "a failed beat must not touch the usurper's lease")

    // A's release: CAS on A's old value — must NOT delete B's lease
    // (the third-writer window the FS fallback documents)
    hA.release()
    assert(store.read().isDefined &&
      new String(store.read().get, "UTF-8").startsWith("writerB\n"),
      "an old holder's release must leave the usurper's lease intact")

    // B is unharmed: its beat refreshes, its release frees the slot
    assert(hB.beat(), "the live holder's beat must keep working")
    hB.release()
    assert(store.read().isEmpty, "the rightful release frees the slot")
  }

  test("N waiters judging the same stale value elect exactly one winner") {
    val store = new InMemoryCasStore
    val stale = "crashed\n0\n".getBytes("UTF-8")
    assert(store.tryCreate(stale))
    val mine1 = "waiter1\n5000\n".getBytes("UTF-8")
    val mine2 = "waiter2\n5000\n".getBytes("UTF-8")
    val wins = Seq(store.takeOver(stale, mine1), store.takeOver(stale, mine2))
    assert(wins.count(identity) == 1,
      s"exactly one of two racing breaks may win, got $wins")
    assert(new String(store.read().get, "UTF-8").startsWith("waiter1\n"),
      "the first CAS wins; the second must observe the new value and lose")
  }

  test("a live holder's beat landing between a waiter's stale judgment and its break defeats the break") {
    val store = new InMemoryCasStore
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val lease = protoOver(store, clock)
    val hA = lease.acquire("writerA")
    // waiter B reads and judges the value stale...
    clock.set(2000L)
    val judged = store.read().get
    // ...but A's heartbeat lands first (A was slow, not dead)
    assert(hA.beat())
    // B's break conditions on the JUDGED value — it must lose
    assert(!store.takeOver(judged, "writerB\n2000\n".getBytes("UTF-8")),
      "a break conditioned on a refreshed-away value must fail")
    assert(new String(store.read().get, "UTF-8").startsWith("writerA\n"))
    hA.release()
    assert(store.read().isEmpty)
  }

  test("acquire honors its timeout against a LIVE (fresh-stamped) holder") {
    val store = new InMemoryCasStore
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val lease = new WriterLease(store, "spec", staleMillis = 1000L,
      acquireTimeoutMillis = 50L, pollMillis = 1L,
      clock = () => clock.getAndAdd(10L)) // each observation ticks time
    assert(store.tryCreate(s"other\n${clock.get()}\n".getBytes("UTF-8")))
    // keep the foreign stamp fresh relative to the ticking clock by
    // re-stamping it: the holder is alive, so acquire must time out
    val err = intercept[IllegalStateException] {
      val t = new Thread(() => while (true) {
        val cur = store.read().getOrElse(Array.emptyByteArray)
        store.replaceIf(cur, s"other\n${clock.get()}\n".getBytes("UTF-8"))
        Thread.sleep(1)
      })
      t.setDaemon(true); t.start()
      lease.acquire("me")
    }
    // either timeout arm is a correct outcome: the ticking clock and
    // the re-stamping thread race over whether the holder ever LOOKS
    // stale, but both paths must refuse within the deadline
    assert(err.getMessage.contains("held by a concurrent writer") ||
      err.getMessage.contains("stale-break lost its CAS"),
      err.getMessage)
  }

  test("a transient store failure propagates as IOException — beat() retries instead of reading it as usurpation") {
    // wraps the atomic store; every op throws ONCE per arm() call —
    // the network-blip shape the LeaseStore error contract names
    class FlakyStore(inner: InMemoryCasStore) extends graft.pipeline.LeaseStore {
      @volatile var failNext = false
      private def blip(): Unit =
        if (failNext) { failNext = false; throw new java.io.IOException("blip") }
      def tryCreate(c: Array[Byte]) = { blip(); inner.tryCreate(c) }
      def read() = { blip(); inner.read() }
      def replaceIf(e: Array[Byte], n: Array[Byte]) = { blip(); inner.replaceIf(e, n) }
      def takeOver(e: Array[Byte], n: Array[Byte]) = { blip(); inner.takeOver(e, n) }
      def deleteIf(e: Array[Byte]) = { blip(); inner.deleteIf(e) }
    }
    val store = new FlakyStore(new InMemoryCasStore)
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val lease = new WriterLease(store, "spec", staleMillis = 1000L,
      acquireTimeoutMillis = 60_000L, pollMillis = 1L,
      clock = () => clock.getAndAdd(1L))
    val h = lease.acquire("writerA")

    // one blip: beat() must PROPAGATE (the heartbeat loop's catch
    // retries next period) — never return false, which would stop the
    // heartbeat for good and invite a mid-write stale break
    store.failNext = true
    intercept[java.io.IOException] { h.beat() }
    assert(h.beat(), "the next beat after a blip must refresh normally")
    val held = new String(store.read().get, "UTF-8")
    assert(held.startsWith("writerA\n"), held)
    h.release()
    assert(store.read().isEmpty)

    // acquire() rides THROUGH a blip (retry after a poll) instead of
    // surfacing it or busy-spinning
    store.failNext = true
    val h2 = lease.acquire("writerB")
    assert(new String(store.read().get, "UTF-8").startsWith("writerB\n"))
    h2.release()
  }

  test("HadoopLeaseStore: a genuinely absent value still reads as None; create-if-absent still refuses on presence") {
    // the IO-contract change must not reclassify the NORMAL conditional
    // outcomes: missing file -> None (not an exception), present file
    // -> tryCreate false (FileAlreadyExists is the existence signal)
    val dir = Files.createTempDirectory("graft-lease-io").toString
    val p = new Path(s"$dir/_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new HadoopLeaseStore(fs, p)
    assert(store.read().isEmpty, "missing lease must read as None")
    assert(!store.deleteIf("x".getBytes("UTF-8")))
    assert(store.tryCreate("a\n1\n".getBytes("UTF-8")))
    assert(!store.tryCreate("b\n2\n".getBytes("UTF-8")),
      "existence must answer false, not throw")
  }

  test("HadoopLeaseStore: the FS fallback keeps the tombstone election and value-conditioned ops") {
    val dir = Files.createTempDirectory("graft-lease-store").toString
    val p = new Path(s"$dir/_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new HadoopLeaseStore(fs, p)

    val v0 = "a\n1\n".getBytes("UTF-8")
    assert(store.tryCreate(v0))
    assert(!store.tryCreate(v0), "create-if-absent must refuse a second create")
    assert(java.util.Arrays.equals(store.read().get, v0))

    // conditional ops condition on the VALUE, not on mtime (whose 1s
    // granularity could alias two same-length leases)
    val v1 = "b\n2\n".getBytes("UTF-8")
    assert(!store.replaceIf(v1, v1), "replace of a non-matching value must fail")
    assert(store.replaceIf(v0, v1))
    assert(!store.deleteIf(v0), "delete of a non-matching value must fail")
    assert(fs.exists(p))
    assert(!store.takeOver(v0, v1), "takeover of a non-matching value must fail")
    // a matching takeover renames through a unique tombstone and
    // leaves no residue
    val v2 = "c\n3\n".getBytes("UTF-8")
    assert(store.takeOver(v1, v2))
    assert(java.util.Arrays.equals(store.read().get, v2))
    assert(fs.listStatus(new Path(dir)).map(_.getPath.getName).toSet == Set("_lease"),
      "the tombstone must not linger")
    assert(store.deleteIf(v2))
    assert(store.read().isEmpty)
  }

  test("ObjectStoreLeaseStore: the contention matrix is fenced on the etag-CAS adapter (third store)") {
    val http = new graft.pipeline.InMemoryHttpObjectStore
    val store = new graft.pipeline.ObjectStoreLeaseStore(http, "tables/docs/_lease")
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val lease = new WriterLease(store, "spec", staleMillis = 1000L,
      acquireTimeoutMillis = 60_000L, pollMillis = 1L,
      clock = () => clock.get())

    // forced stale takeover: zombie beat and release cannot clobber
    val hA = lease.acquire("writerA")
    clock.set(2000L)
    val hB = lease.acquire("writerB")
    assert(new String(store.read().get, "UTF-8").startsWith("writerB\n"))
    val bBytes = store.read().get
    assert(!hA.beat(), "a usurped holder's beat must report the loss")
    assert(java.util.Arrays.equals(store.read().get, bBytes))
    hA.release()
    assert(store.read().isDefined &&
      new String(store.read().get, "UTF-8").startsWith("writerB\n"),
      "an old holder's release must leave the usurper's lease intact")
    assert(hB.beat())
    hB.release()
    assert(store.read().isEmpty)

    // N waiters judging the same stale value: the etag linearizes the
    // election — exactly one CAS wins, no tombstone rename needed
    assert(store.tryCreate("crashed\n0\n".getBytes("UTF-8")))
    val stale = store.read().get
    val wins = Seq(
      store.takeOver(stale, "w1\n5000\n".getBytes("UTF-8")),
      store.takeOver(stale, "w2\n5000\n".getBytes("UTF-8")))
    assert(wins == Seq(true, false),
      s"the first etag-CAS wins, the second must 412, got $wins")
    assert(store.deleteIf(store.read().get))

    // a live beat landing between judgment and break defeats the break
    val hC = lease.acquire("writerC")
    clock.set(4000L)
    val judged = store.read().get
    assert(hC.beat())
    assert(!store.takeOver(judged, "writerD\n4000\n".getBytes("UTF-8")),
      "a break conditioned on a refreshed-away value must 412")
    hC.release()
    assert(store.read().isEmpty)

    // transport failures ride the error contract: a 503 propagates as
    // IOException (the heartbeat retries next period), never as
    // usurpation
    val hE = lease.acquire("writerE")
    http.failNextOps(1)
    intercept[java.io.IOException] { hE.beat() }
    assert(hE.beat(), "the next beat after the blip must refresh")
    hE.release()
    assert(store.read().isEmpty)
  }

  test("end-to-end: a BucketedStateTable commits through the object-store adapter") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-oslease-e2e").toString
    val store = new graft.pipeline.ObjectStoreLeaseStore(
      new graft.pipeline.InMemoryHttpObjectStore, "state/_lease")
    val t = new BucketedStateTable(spark, s"$dir/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 0L,
      leaseStore = Some(store))
    t.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), keys = Seq("k"))
    assert(t.read().get.count() == 2L)
    assert(store.read().isEmpty, "the lease must release after the commit")
  }

  test("HadoopLeaseStore: publication is ATOMIC — hammering readers never observe empty or partial bytes") {
    // the r17 full-suite flake in one picture: create-then-write let a
    // concurrent read land between the two and observe ZERO bytes — an
    // empty slot parses holderless, so a waiter would break a LIVE
    // holder's lease mid-commit. With link/rename publication a reader
    // sees absent, the old value, or the new value — nothing else.
    val dir = Files.createTempDirectory("graft-lease-atomic").toString
    val p = new Path(s"$dir/_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new HadoopLeaseStore(fs, p)
    val vA = "holderA\n1111111\n".getBytes("UTF-8")
    val vB = "holderB\n2222222\n".getBytes("UTF-8")
    val ok = Set(vA.toSeq, vB.toSeq)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var go = true
    val readers = (1 to 4).map(_ => new Thread(() => {
      while (go) store.read().foreach { bytes =>
        if (!ok.contains(bytes.toSeq))
          bad.add(s"observed ${bytes.length} bytes: " +
            new String(bytes, "UTF-8"))
      }
    }))
    readers.foreach(_.start())
    val deadline = System.currentTimeMillis() + 3000
    while (System.currentTimeMillis() < deadline && bad.isEmpty) {
      assert(store.tryCreate(vA))
      store.replaceIf(vA, vB)
      store.deleteIf(vB)
    }
    go = false
    readers.foreach(_.join(10_000))
    assert(bad.isEmpty,
      s"readers observed non-published lease bytes: ${bad.peek()}")
  }

  test("end-to-end: a BucketedStateTable over the CAS store commits and releases cleanly") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-lease-e2e").toString
    val store = new InMemoryCasStore
    val t = new BucketedStateTable(spark, s"$dir/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 0L,
      leaseStore = Some(store))
    t.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), keys = Seq("k"))
    assert(t.read().get.count() == 2L)
    assert(store.read().isEmpty, "the CAS lease must release after the commit")
    // no _lease FILE exists — the injected store replaced the FS slot
    assert(!new java.io.File(s"$dir/state/_lease").exists())
  }
}
