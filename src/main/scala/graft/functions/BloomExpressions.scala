package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

import java.io.ByteArrayInputStream

/** Executor-side runtime for [[BloomMightContain]]: an EXECUTOR-GLOBAL
  * cache of deserialized Bloom blocks, fed from a broadcast of the
  * serialized block map. In its own object so generated Java calls it
  * through the static forwarders.
  *
  * Why executor-global, not per-thread: a candidate partition carries
  * MIXED buckets, so every task thread eventually touches every bucket
  * of the active map/slice. A per-thread budget smaller than that
  * working set degenerates to a deserialization PER ROW once its
  * overflow wipe starts cycling — harmless at 10^6-key blocks (tens of
  * KB), a bench-stalling pathology at 10^9-key blocks (tens of MB each;
  * observed: every task thread pinned inside BloomFilter.readFrom). One
  * shared map caps memory at ONE working set total instead of one per
  * thread, and the working set always fits the budget by construction:
  * the engine sizes broadcast maps and slices against
  * `maxBroadcastBytes` (512 MB default) < this budget. */
object BloomRuntime {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()
  private val cachedBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  // executor-wide budget in BYTES (overridable for small-heap deploys);
  // overflow means the active epoch ROTATED (new index build / next
  // slice) and the cached entries are stale — wipe-and-reload happens
  // once per rotation, never per row
  val MaxCacheBytes: Long =
    sys.props.get("graft.bloom.cacheBytes").map(_.toLong)
      .getOrElse(1024L * 1024 * 1024)

  /** Membership test against a broadcast block map. A block is
    * deserialized once per (executor, epoch, bucket) — concurrent first
    * touches may race to deserialize, `putIfAbsent` keeps exactly one
    * (Bloom reads are side-effect-free, so losers cost wasted work, not
    * correctness). The serialized bytes live once per executor in the
    * broadcast — they never flow through a join (a joined binary column
    * is re-copied out of its UnsafeRow for EVERY candidate row, which
    * costs more than the exact anti-join Bloom is meant to save —
    * measured, not theory). */
  def test(epoch: Long, bucket: Int, hash: Long,
           bc: Broadcast[Map[Int, Array[Byte]]]): Boolean = {
    val key = epoch + bucket
    var bf = cache.get(key)
    if (bf == null) {
      bc.value.get(bucket) match {
        case None => return false // no block for this bucket → definitely unseen
        case Some(bytes) =>
          // the MISS path is serialized: misses happen once per (epoch,
          // bucket) by design, and an unsynchronized check-then-act here
          // both overshoots the budget by threads × blockSize (32 threads
          // racing distinct 32 MB blocks ≈ +1 GB before any accounting
          // lands) and lets a racing clear() corrupt the byte counter
          // into premature per-row wipes. The hot path above stays
          // lock-free; first-touch threads briefly queue behind one
          // deserialization instead of all paying their own.
          this.synchronized {
            bf = cache.get(key)
            if (bf == null) {
              if (cachedBytes.get() + bytes.length > MaxCacheBytes) {
                // stale-epoch overflow: rare by construction (class doc)
                cache.clear(); cachedBytes.set(0L)
              }
              bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
              cache.put(key, bf)
              cachedBytes.addAndGet(bytes.length.toLong)
            }
          }
      }
    }
    bf.mightContainLong(hash)
  }
}

/** `bloom_might_contain(bucket, hash)` over a broadcast Bloom-block map —
  * a native, whole-stage-codegen Catalyst expression. The candidate side
  * stays a single narrow codegen'd stage: no join with the index, no
  * per-row byte movement; the generated code calls [[BloomRuntime.test]].
  *
  * `epoch` uniquely identifies the built index: it keys the executor-side
  * cache (stale blocks across rebuilds would cause false negatives ⇒
  * duplicate fetches) and reaches the generated code via the references
  * array, NOT as a spliced literal — a changing literal would change the
  * generated source on every rebuild and pay a fresh janino compile.
  */
case class BloomMightContain(
    epoch: Long,
    blocks: Broadcast[Map[Int, Array[Byte]]],
    left: Expression,
    right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  // Null semantics: a null bucket/hash means "definitely unseen" (false) —
  // identically in the interpreted and generated paths (the expression
  // itself stays nullable=false so the surrounding filter never re-checks).
  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    val h = right.eval(input)
    if (b == null || h == null) false
    else BloomRuntime.test(epoch, b.asInstanceOf[Int], h.asInstanceOf[Long], blocks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bucketGen = left.genCode(ctx)
    val hashGen = right.genCode(ctx)
    val epochRef = ctx.addReferenceObj("bloomEpoch", java.lang.Long.valueOf(epoch),
      "java.lang.Long")
    val bcRef = ctx.addReferenceObj("bloomBlocks", blocks,
      "org.apache.spark.broadcast.Broadcast")
    ev.copy(
      code = code"""
        ${bucketGen.code}
        ${hashGen.code}
        final boolean ${ev.value} = !(${bucketGen.isNull} || ${hashGen.isNull}) &&
          graft.functions.BloomRuntime.test(
            $epochRef.longValue(), ${bucketGen.value}, ${hashGen.value}, $bcRef);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
}

object BloomMightContain {
  def apply(epoch: Long, blocks: Broadcast[Map[Int, Array[Byte]]],
            bucket: Column, hash: Column): Column =
    Bridge.column(BloomMightContain(epoch, blocks,
      Bridge.expression(bucket), Bridge.expression(hash)))
}
