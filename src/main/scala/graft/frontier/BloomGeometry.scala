package graft.frontier

/** Geometry of a partitioned Bloom index: how many hash-range buckets and
  * how many expected keys per bucket (the spark-sketch builder parameter
  * that fixes each block's bit-array size up front).
  *
  * VERDICT r03 #1: the engine used to build every block at a FIXED
  * 65,536 expected keys/bucket, so past ~1-2M seen URLs the prefilter
  * saturated (fpp→1) and the broadcast→sliced auto-flip could never fire
  * from genuine growth (bit arrays never grow). Geometry is now DERIVED
  * from the seen-set estimate on a doubling schedule:
  *
  *  - capacity per bucket doubles while a block stays under
  *    `maxBlockBytes` (so fpp stays at the 1% target as the crawl grows);
  *  - past that, the BUCKET COUNT doubles instead (VERDICT r03 #2: a
  *    10^10-key index at 16 buckets is ~750 MB per block — nothing the
  *    sliced regime could subdivide; growing buckets keeps every block
  *    individually broadcastable and gives [[CrawlEngine]]'s slicesFor a
  *    fitting divisor at any scale).
  *
  * Doubling means O(log seen) rebuilds over a crawl's lifetime, each via
  * the same tested stale-index rebuild path. Index buckets are always a
  * power-of-two multiple of the STORAGE bucket count (the `bucket`
  * column materialized in fetchlog/images rows), so slice membership
  * `hash ≡ s (mod slices)` keeps mapping onto pushable storage-bucket IN
  * filters (see BloomDedup.dedupSliced).
  */
final case class BloomGeometry(indexBuckets: Int, capacityPerBucket: Long) {
  require(indexBuckets >= 1 && capacityPerBucket >= 1)
  def totalCapacity: Long = indexBuckets.toLong * capacityPerBucket
  /** Serialized size of one block (bit array + header), in bytes. */
  def blockBytes: Long = BloomGeometry.blockBytesFor(capacityPerBucket)
  /** Estimated full-index size — the broadcast/slice planning input. */
  def totalBytes: Long = indexBuckets.toLong * blockBytes
}

object BloomGeometry {
  /** Legacy floor — pre-geometry blocks were built exactly here, so a
    * resumed old root reads back with the matching default. */
  val MinCapacity: Long = 1L << 16
  val TargetFpp: Double = 0.01

  /** spark-sketch BloomFilter at fpp 0.01: optimal bits = -n·ln(p)/ln²2
    * ≈ 9.5851 n, rounded up to a whole word; +12 B stream header. The
    * constant rounds UP (9.586) so the estimate bounds the real size
    * from above — it drives broadcast/slice planning and must never
    * undercount. */
  def blockBytesFor(capacity: Long): Long =
    (capacity * 9.586).toLong / 8 + 24

  /** Smallest doubling-schedule geometry holding `rowsEst` keys at the
    * target fpp. `storageBuckets` is the floor (and factor) of the
    * bucket count; `maxBlockBytes` caps a single block so it always fits
    * a broadcast slice. `capacityFloor` exists so specs can exercise the
    * resize schedule at toy scale; production uses the legacy-compatible
    * [[MinCapacity]]. */
  def forEstimate(rowsEst: Long, storageBuckets: Int, maxBlockBytes: Long,
                  capacityFloor: Long = MinCapacity): BloomGeometry = {
    var buckets = storageBuckets.toLong
    var cap = capacityFloor
    while (buckets * cap < rowsEst) {
      if (blockBytesFor(cap * 2) <= maxBlockBytes) cap *= 2
      else buckets *= 2
    }
    require(buckets <= Int.MaxValue, s"bucket count $buckets overflows Int")
    BloomGeometry(buckets.toInt, cap)
  }

  /** Smallest divisor of the geometry's bucket count (≥2) whose
    * per-slice block share fits `maxBroadcastBytes`, bottoming out at
    * one bucket per slice — which always fits when the geometry was
    * built with `maxBlockBytes ≤ maxBroadcastBytes` (the engine uses
    * budget/4). */
  def slicesFitting(g: BloomGeometry, maxBroadcastBytes: Long): Int = {
    val needed = math.max(2L,
      (g.totalBytes + maxBroadcastBytes - 1) / maxBroadcastBytes)
    (needed.min(g.indexBuckets.toLong).toInt to g.indexBuckets)
      .find(g.indexBuckets % _ == 0).getOrElse(g.indexBuckets)
  }
}
