package graft.frontier

import graft.urlkit.UrlKit

/** Compact cuckoo filter over 64-bit keys — the deletable-entry fallback
  * to the Bloom seen-set mandated by the north rule (Bloom filters cannot
  * delete; a frontier that *un-sees* URLs — e.g. recrawl-after-TTL —
  * needs deletion support).
  *
  * Standard design (Fan et al., "Cuckoo Filter: Practically Better Than
  * Bloom", CoNEXT 2014, public): 16-bit fingerprints, 4 slots per bucket,
  * partial-key cuckoo hashing — `i2 = i1 XOR hash(fp)` — bounded eviction
  * chains. No external dependencies; serializable to a flat Array.
  *
  * Like the Bloom path this is a prefilter only: exact dedup still goes
  * through the anti-join (SURVEY.md §7.4).
  */
final class CuckooFilter private (val numBuckets: Int, val table: Array[Short])
    extends Serializable {

  import CuckooFilter._

  private var count: Long = 0L
  def size: Long = count

  private def fingerprint(key: Long): Short = {
    val f = (UrlKit.xxhash64(s"cf:$key") & 0xFFFF).toInt
    (if (f == 0) 1 else f).toShort // 0 = empty slot marker
  }

  private def bucketOf(key: Long): Int =
    math.floorMod(UrlKit.xxhash64(s"cb:$key"), numBuckets.toLong).toInt

  private def altBucket(i: Int, fp: Short): Int =
    math.floorMod(i.toLong ^ UrlKit.xxhash64(s"ca:${fp & 0xFFFF}"), numBuckets.toLong).toInt

  private def slotBase(bucket: Int): Int = bucket * SlotsPerBucket

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert; false when the filter is full (eviction chain exhausted). */
  def insert(key: Long): Boolean = {
    var fp = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) { count += 1; return true }
    // evict: bounded random-walk (deterministic: seeded by key)
    var bucket = if ((UrlKit.xxhash64(s"ce:$key") & 1L) == 0L) i1 else i2
    var n = 0
    while (n < MaxKicks) {
      val base = slotBase(bucket)
      val victim = math.floorMod(UrlKit.xxhash64(s"cv:$key:$n"), SlotsPerBucket.toLong).toInt
      val tmp = table(base + victim)
      table(base + victim) = fp
      fp = tmp
      bucket = altBucket(bucket, fp)
      if (tryInsertAt(bucket, fp)) { count += 1; return true }
      n += 1
    }
    false
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, fp)
    containsAt(i1, fp) || containsAt(i2, fp)
  }

  private def containsAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one copy of the key's fingerprint; false when absent. */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketOf(key)
    if (deleteAt(i1, fp)) { count -= 1; return true }
    val i2 = altBucket(i1, fp)
    if (deleteAt(i2, fp)) { count -= 1; return true }
    false
  }

  private def deleteAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + table.length * 2)
    bb.putInt(numBuckets)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** Capacity with ~95% load headroom. */
  def create(expectedItems: Long): CuckooFilter = {
    val buckets = math.max(1, Integer.highestOneBit(
      math.ceil(expectedItems / (SlotsPerBucket * 0.84)).toInt.max(1)) * 2)
    new CuckooFilter(buckets, new Array[Short](buckets * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buckets = bb.getInt
    val table = new Array[Short](buckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(buckets, table)
  }
}
