package graft.frontier

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Partitioned-Bloom URL-seen dedup (north rule; SURVEY.md §7.1 step 4).
  *
  * The seen-set is hash-range partitioned into `numBuckets` Bloom blocks
  * (`bucket = pmod(url_hash, numBuckets)`), built distributively with an
  * [[Aggregator]] over `spark-sketch`'s BloomFilter. Dedup of a candidate
  * batch is then:
  *
  *   1. join candidates to their bucket's block (broadcast when small —
  *      AQE decides; `repartitionByBucket` forces co-location for huge
  *      indexes where each partition should touch one block),
  *   2. the block-merge `mapPartitions` (one of the two permitted
  *      non-Catalyst stages) tests `mightContain(url_hash)`, deserializing
  *      each distinct block once per partition,
  *   3. "might contain" survivors — fpp-small — go through the *exact*
  *      `left_anti` join against the seen table; definite-new rows skip it.
  *
  * The stored seen-set stays exact (Bloom is only a prefilter, SURVEY.md
  * §7.4), but at scale the expensive anti-join shuffle only carries
  * ~fpp·|candidates| + true duplicates instead of every candidate.
  */
object BloomDedup {

  /** Aggregator: Longs → serialized BloomFilter (java-serializable buffer). */
  class BloomAgg(expectedPerBucket: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedPerBucket, fpp)
    override def reduce(b: BloomFilter, h: Long): BloomFilter = { b.putLong(h); b }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      if (a.bitSize() == 0) b else if (b.bitSize() == 0) a else a.mergeInPlace(b)
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    override def bufferEncoder = Encoders.javaSerialization[BloomFilter]
    override def outputEncoder = Encoders.BINARY
  }

  /** Build the Bloom index `(bucket: int, bloom: binary)` from the seen
    * table's `url_hash` column. One block per hash-range bucket. */
  def buildIndex(seen: DataFrame, numBuckets: Int,
                 expectedPerBucket: Long = 1L << 16, fpp: Double = 0.01): DataFrame = {
    val spark = seen.sparkSession
    import spark.implicits._
    val agg = udaf(new BloomAgg(expectedPerBucket, fpp))
    seen.select(pmod(col("url_hash"), lit(numBuckets)).cast("int").as("bucket"),
                col("url_hash"))
      .groupBy("bucket")
      .agg(agg(col("url_hash")).as("bloom"))
  }

  /** Candidates NOT in the seen set. `candidates` must carry `url_hash`;
    * rows are returned with their original columns. */
  def dedup(candidates: DataFrame, seen: DataFrame, bloomIndex: Option[DataFrame],
            numBuckets: Int = 64, repartitionByBucket: Boolean = false): DataFrame = {
    val seenKeys = seen.select("url_hash").distinct()
    bloomIndex match {
      case None =>
        candidates.join(seenKeys, Seq("url_hash"), "left_anti")
      case Some(idx) =>
        val outCols = candidates.columns
        val withBucket = candidates
          .withColumn("__bucket", pmod(col("url_hash"), lit(numBuckets)).cast("int"))
        val located =
          if (repartitionByBucket) withBucket.repartition(col("__bucket"))
          else withBucket
        val joined = located.join(idx.withColumnRenamed("bucket", "__bucket"),
          Seq("__bucket"), "left_outer")

        // permitted mapPartitions #2: bloom-block membership test with a
        // per-partition block cache (each distinct block deserialized once)
        val schema = org.apache.spark.sql.types.StructType(
          joined.schema.filterNot(_.name == "bloom")
            .:+(org.apache.spark.sql.types.StructField("__maybe", org.apache.spark.sql.types.BooleanType)))
        val bloomIdx = joined.schema.fieldIndex("bloom")
        val keep = joined.schema.zipWithIndex.filterNot(_._1.name == "bloom").map(_._2)
        val hashIdx = joined.schema.fieldIndex("url_hash")
        val bucketIdx = joined.schema.fieldIndex("__bucket")
        val flagged = joined.mapPartitions { rows =>
          val cache = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
          rows.map { r =>
            val maybe =
              if (r.isNullAt(bloomIdx)) false // no block for bucket → nothing seen there
              else {
                val bucket = r.getInt(bucketIdx)
                val bf = cache.getOrElseUpdate(bucket,
                  BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]](bloomIdx))))
                bf.mightContainLong(r.getLong(hashIdx))
              }
            org.apache.spark.sql.Row.fromSeq(keep.map(r.get) :+ maybe)
          }
        }(Encoders.row(schema))

        val definiteNew = flagged.filter(!col("__maybe"))
          .select(outCols.map(col): _*)
        val maybeSeen = flagged.filter(col("__maybe"))
          .select(outCols.map(col): _*)
          .join(seenKeys, Seq("url_hash"), "left_anti")
        definiteNew.unionByName(maybeSeen)
    }
  }
}
