package graft.pipeline

/** The conditional-object API every major object store / KV exposes in
  * some dialect — S3 `If-Match`/`If-None-Match` conditional writes, GCS
  * generation preconditions (`ifGenerationMatch`), Azure ETags, etcd
  * compare-and-swap txns. Four verbs, HTTP-shaped:
  *
  *  - `get` — 200 → (body, etag); 404 → None
  *  - `putIfAbsent` — `If-None-Match: *`: 201 → Some(new etag) when the
  *    key did not exist; 412 → None
  *  - `putIfMatch` — `If-Match: etag`: 200 → Some(new etag) when the
  *    stored etag still matched; 412 → None
  *  - `deleteIfMatch` — `If-Match: etag`: 204 → true; 412 → false
  *
  * Error contract mirrors [[LeaseStore]]'s: a None/false is a GENUINE
  * precondition failure (the 412); transport/5xx failures surface as
  * `java.io.IOException` so the lease protocol retries them instead of
  * misreading a blip as usurpation. */
trait ConditionalPutClient {
  def get(key: String): Option[(Array[Byte], String)]
  def putIfAbsent(key: String, body: Array[Byte]): Option[String]
  def putIfMatch(key: String, etag: String, body: Array[Byte]): Option[String]
  def deleteIfMatch(key: String, etag: String): Boolean
}

/** [[LeaseStore]] over a [[ConditionalPutClient]] — the object-store
  * adapter the CAS seam was cut for, written against the API STUB so
  * the contract is proven implementable without network egress (no
  * cloud SDKs on this classpath; a real deployment swaps in a thin
  * `ConditionalPutClient` over its store's SDK and changes nothing
  * here). Value-CAS is built from etag-CAS: every conditional read
  * re-fetches `(body, etag)`, compares the BODY to the expected value,
  * and conditions the write on the ETAG — the store linearizes the
  * etag check, so of N racers that read the same generation exactly
  * one write lands; a gap between our read and our write (someone
  * else's write) flips the etag and our precondition fails, which is
  * exactly the "treat the holder as live again" answer the protocol
  * wants. No tombstone election needed ([[HadoopLeaseStore]] only
  * keeps one because a plain filesystem lacks conditional writes):
  * `takeOver` IS `replaceIf` here, fully fenced. */
final class ObjectStoreLeaseStore(client: ConditionalPutClient, key: String)
    extends LeaseStore {

  override def tryCreate(content: Array[Byte]): Boolean =
    client.putIfAbsent(key, content).isDefined

  override def read(): Option[Array[Byte]] =
    client.get(key).map(_._1)

  override def replaceIf(expect: Array[Byte], next: Array[Byte]): Boolean =
    client.get(key) match {
      case Some((body, etag)) if java.util.Arrays.equals(body, expect) =>
        client.putIfMatch(key, etag, next).isDefined
      case _ => false
    }

  override def takeOver(expect: Array[Byte], next: Array[Byte]): Boolean =
    replaceIf(expect, next)

  override def deleteIf(expect: Array[Byte]): Boolean =
    client.get(key) match {
      case Some((body, etag)) if java.util.Arrays.equals(body, expect) =>
        client.deleteIfMatch(key, etag)
      case _ => false
    }
}

/** In-memory [[ConditionalPutClient]] with the exact linearization a
  * conditional-put object store gives (one monitor = the store's
  * per-key serialization point; etags are a monotone generation
  * counter, the GCS model). `failNextOps(n)` injects `n` transport
  * failures (IOException) across the NEXT n calls — the 5xx/blip shape
  * the error contract names — so specs can drive the retry arms. */
final class InMemoryHttpObjectStore extends ConditionalPutClient {
  private var objects = Map.empty[String, (Array[Byte], String)]
  private var gen = 0L
  private var failures = 0

  def failNextOps(n: Int): Unit = synchronized { failures = n }

  private def maybeFail(): Unit =
    if (failures > 0) {
      failures -= 1
      throw new java.io.IOException("injected transport failure (503)")
    }

  private def nextEtag(): String = { gen += 1; s"g$gen" }

  override def get(key: String): Option[(Array[Byte], String)] =
    synchronized { maybeFail(); objects.get(key).map { case (b, e) => (b.clone(), e) } }

  override def putIfAbsent(key: String, body: Array[Byte]): Option[String] =
    synchronized {
      maybeFail()
      if (objects.contains(key)) None
      else { val e = nextEtag(); objects += key -> (body.clone(), e); Some(e) }
    }

  override def putIfMatch(key: String, etag: String,
      body: Array[Byte]): Option[String] =
    synchronized {
      maybeFail()
      objects.get(key) match {
        case Some((_, cur)) if cur == etag =>
          val e = nextEtag(); objects += key -> (body.clone(), e); Some(e)
        case _ => None // 412: generation moved (or 404)
      }
    }

  override def deleteIfMatch(key: String, etag: String): Boolean =
    synchronized {
      maybeFail()
      objects.get(key) match {
        case Some((_, cur)) if cur == etag => objects -= key; true
        case _ => false
      }
    }
}
