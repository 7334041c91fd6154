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

/** Executor-side runtime for [[BloomMightContain]]: per-thread cache of
  * deserialized Bloom blocks, fed from a broadcast of the serialized
  * block map. In its own object so generated Java calls it through the
  * static forwarders. */
object BloomRuntime {
  private final class Cache {
    val m = scala.collection.mutable.HashMap.empty[Long, BloomFilter]
    var bytes: Long = 0L
  }
  private val local = new ThreadLocal[Cache] {
    override def initialValue() = new Cache
  }
  // per-thread cache budget in BYTES — 10^8-key indexes have multi-MB
  // blocks, so an entry-count bound silently multiplies to gigabytes
  // across task threads (measured OOM at 32 threads × 256 × 2.4 MB)
  private val MaxCacheBytes = 64L * 1024 * 1024

  /** Membership test against a broadcast block map. The per-thread cache
    * means a block is deserialized once per (thread, epoch, bucket); the
    * serialized bytes live once per executor in the broadcast — they
    * never flow through a join (a joined binary column is re-copied out
    * of its UnsafeRow for EVERY candidate row, which costs more than the
    * exact anti-join Bloom is meant to save — measured, not theory). */
  def test(epoch: Long, bucket: Int, hash: Long,
           bc: Broadcast[Map[Int, Array[Byte]]]): Boolean = {
    val key = epoch + bucket
    val c = local.get()
    var bf = c.m.getOrElse(key, null)
    if (bf == null) {
      bc.value.get(bucket) match {
        case None => return false // no block for this bucket → definitely unseen
        case Some(bytes) =>
          if (c.bytes + bytes.length > MaxCacheBytes) { c.m.clear(); c.bytes = 0L }
          bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
          c.m(key) = bf
          c.bytes += bytes.length
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
