package graft.core

/** Cuckoo filter — approximate membership with DELETION support (public
  * algorithm: Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter:
  * Practically Better Than Bloom", CoNEXT 2014). The north-star seen-set
  * structure; the engine falls back to a bloom filter per bucket when an
  * insert fails (table at capacity) — see graft.core.SeenFilter.
  *
  * Layout: 2^k buckets × 4 slots of 16-bit fingerprints (0 = empty slot;
  * fingerprints are never 0). Partial-key cuckoo hashing: a fingerprint
  * lives in bucket i1 = H(x) or i2 = i1 XOR H'(fp), so relocation needs
  * only the stored fingerprint. False-positive rate ≈ 2·4/2^16 ≈ 0.012%.
  *
  * Eviction victims follow a deterministic LCG — identical insert
  * sequences yield identical filters everywhere (lookup answers are
  * placement-independent anyway; determinism keeps serialized sidecars
  * reproducible).
  *
  * Deletion caveat (inherent to the algorithm): only delete keys that
  * were actually inserted, or a colliding key's fingerprint may be
  * removed. The engine only deletes url_hashes it previously inserted.
  */
final class CuckooFilter private (
    private val indexBits: Int,
    private val table: Array[Short],
    private var itemCount: Long,
    private var kickState: Long
) extends Serializable {
  import CuckooFilter._

  private def numBuckets: Int = 1 << indexBits
  private def mask: Int = numBuckets - 1

  def size: Long = itemCount

  /** Insert; false when the table cannot take the key. A failed put
    * ROLLS BACK the kick path, so the table is exactly as before the
    * call: the NEW key is the one left out, and every previously
    * inserted key still answers may-contain — the SeenFilter superset
    * contract survives a failed put.
    */
  def put(key: String): Boolean = {
    val h = hash64(key)
    val fp = fingerprintOf(h)
    val i1 = (h >>> 32).toInt & mask
    val i2 = altIndex(i1, fp)
    if (insertAt(i1, fp) || insertAt(i2, fp)) { itemCount += 1; return true }
    // kick loop, recording each displaced position for rollback
    val path = new Array[Int](MaxKicks)
    var i = if (nextKick() % 2 == 0) i1 else i2
    var cur = fp
    var n = 0
    while (n < MaxKicks) {
      val slot = (nextKick() % SlotsPerBucket).toInt
      val pos = i * SlotsPerBucket + slot
      val victim = table(pos)
      table(pos) = cur
      path(n) = pos
      cur = victim
      i = altIndex(i, cur)
      if (insertAt(i, cur)) { itemCount += 1; return true }
      n += 1
    }
    // rollback: walk the kick path backwards re-seating every displaced
    // fingerprint; `cur` ends as the new key's fp, left out of the table
    var j = MaxKicks - 1
    while (j >= 0) {
      val pos = path(j)
      val tmp = table(pos)
      table(pos) = cur
      cur = tmp
      j -= 1
    }
    false
  }

  def mightContain(key: String): Boolean = {
    val h = hash64(key)
    val fp = fingerprintOf(h)
    val i1 = (h >>> 32).toInt & mask
    containsAt(i1, fp) || containsAt(altIndex(i1, fp), fp)
  }

  /** Remove one copy of the key's fingerprint; false if absent. */
  def remove(key: String): Boolean = {
    val h = hash64(key)
    val fp = fingerprintOf(h)
    val i1 = (h >>> 32).toInt & mask
    if (removeAt(i1, fp) || removeAt(altIndex(i1, fp), fp)) {
      itemCount -= 1; true
    } else false
  }

  private def insertAt(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def containsAt(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    table(base) == fp || table(base + 1) == fp ||
    table(base + 2) == fp || table(base + 3) == fp
  }

  private def removeAt(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  private def altIndex(i: Int, fp: Short): Int =
    (i ^ (splitmix64(fp.toLong & 0xffffL) >>> 32).toInt) & mask

  private def nextKick(): Long = {
    kickState = kickState * 6364136223846793005L + 1442695040888963407L
    kickState >>> 11
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + table.length * 2)
    bb.putInt(indexBits).putLong(itemCount).putLong(kickState)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** Capacity for `expectedItems` at ≤95% load. */
  def create(expectedItems: Long): CuckooFilter = {
    val needed = math.max(expectedItems / 0.95 / SlotsPerBucket, 1.0)
    var bits = 1
    while ((1L << bits) < needed && bits < 30) bits += 1
    new CuckooFilter(bits, new Array[Short]((1 << bits) * SlotsPerBucket),
      0L, 0x9e3779b97f4a7c15L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bits = bb.getInt
    val count = bb.getLong
    val kick = bb.getLong
    val table = new Array[Short]((1 << bits) * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(bits, table, count, kick)
  }

  /** 64-bit key hash: the keys are url_hashes (sha-256 hex), whose first
    * 16 hex digits ARE 64 uniform bits — parse them directly; anything
    * else hashes through MD5 (deterministic everywhere).
    */
  private[core] def hash64(key: String): Long = {
    if (key.length == 64 && isHex16(key)) {
      java.lang.Long.parseUnsignedLong(key.substring(0, 16), 16)
    } else {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v
    }
  }

  private def isHex16(s: String): Boolean = {
    var i = 0
    while (i < 16) {
      val c = s.charAt(i)
      val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      if (!hex) return false
      i += 1
    }
    true
  }

  private def fingerprintOf(h: Long): Short = {
    val fp = (h & 0xffffL).toShort
    if (fp == 0) 1.toShort else fp
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
