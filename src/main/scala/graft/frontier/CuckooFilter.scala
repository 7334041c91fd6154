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

  // One-slot victim stash (Fan et al. §4): holds the fingerprint displaced
  // when an eviction chain exhausts MaxKicks, so an already-inserted key
  // never silently loses membership (no-false-negative contract). While
  // occupied, inserts that cannot place without eviction fail cleanly.
  private var stashFp: Short = 0
  private var stashBucket: Int = -1

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

  /** Insert; false when the filter is full (both buckets full and the
    * victim stash is already occupied). On eviction-chain exhaustion the
    * displaced fingerprint goes to the stash — the table is never left in
    * a state where a previously-inserted key is absent. */
  def insert(key: Long): Boolean = {
    var fp = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) { count += 1; return true }
    if (stashBucket >= 0) return false // stash occupied: refuse, table unchanged
    // evict: bounded random-walk (deterministic: seeded by key); every
    // exit from the loop is an insert — either a slot frees up or the
    // final displaced fingerprint parks in the stash
    var bucket = if ((UrlKit.xxhash64(s"ce:$key") & 1L) == 0L) i1 else i2
    var prevBucket = bucket
    var n = 0
    while (n < MaxKicks) {
      val base = slotBase(bucket)
      val victim = math.floorMod(UrlKit.xxhash64(s"cv:$key:$n"), SlotsPerBucket.toLong).toInt
      val tmp = table(base + victim)
      table(base + victim) = fp
      prevBucket = bucket
      fp = tmp
      bucket = altBucket(bucket, fp)
      if (tryInsertAt(bucket, fp)) { count += 1; return true }
      n += 1
    }
    // chain exhausted: park the last displaced fingerprint in the stash
    // (its home pair is {prevBucket, bucket}; record one of them)
    stashFp = fp
    stashBucket = prevBucket
    count += 1
    true
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, fp)
    containsAt(i1, fp) || containsAt(i2, fp) ||
      (stashBucket >= 0 && fp == stashFp && (i1 == stashBucket || i2 == stashBucket))
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
    if (stashBucket >= 0 && fp == stashFp && (i1 == stashBucket || i2 == stashBucket)) {
      stashFp = 0; stashBucket = -1; count -= 1; return true
    }
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
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 2 + 4 + table.length * 2)
    bb.putInt(Magic)
    bb.putInt(numBuckets)
    bb.putLong(count)
    bb.putShort(stashFp)
    bb.putInt(stashBucket)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  /** Layout version tag ("CKF2"): the v2 layout inserted count/stash fields
    * after numBuckets; an untagged (v1) or foreign blob would otherwise
    * deserialize without error into a shifted, silently-corrupt table. */
  val Magic = 0x434B4632

  /** Capacity with ~95% load headroom. */
  def create(expectedItems: Long): CuckooFilter = {
    val buckets = math.max(1, Integer.highestOneBit(
      math.ceil(expectedItems / (SlotsPerBucket * 0.84)).toInt.max(1)) * 2)
    new CuckooFilter(buckets, new Array[Short](buckets * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt
    require(magic == Magic,
      f"not a CKF2 cuckoo-filter blob (magic 0x$magic%08x) — stale or foreign bytes must fail loudly, not deserialize shifted")
    val buckets = bb.getInt
    require(bytes.length == 4 + 4 + 8 + 2 + 4 + buckets * SlotsPerBucket * 2,
      s"cuckoo blob length ${bytes.length} inconsistent with $buckets buckets")
    val n = bb.getLong
    val sFp = bb.getShort
    val sBucket = bb.getInt
    val table = new Array[Short](buckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    val cf = new CuckooFilter(buckets, table)
    cf.count = n
    cf.stashFp = sFp
    cf.stashBucket = sBucket
    cf
  }
}
