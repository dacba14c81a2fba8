package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension (SURVEY §7.2
  * step 7). Media payloads are opaque `binary` columns travelling next
  * to typed metadata; decode/feature-extraction runs batched per
  * partition (the Scala analog of arrow-batched UDFs). The actual
  * codec calls are STUBBED (no image/audio libraries in this
  * environment) behind [[MediaCodec]] — the Spark-side schema,
  * batching, and partition-parallel plumbing are real and tested.
  */
object Multimodal {

  /** Canonical media row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("content", BinaryType, nullable = true),     // opaque payload
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
                          head_byte: Int, byte_crc: Long, feat: Array[Float])

  /** The codec seam. Real deployments swap this for an actual decoder
    * (JNI image lib, ffmpeg, …); here it is a deterministic fake so
    * the pipeline is testable end-to-end: "decode" = byte stats, and
    * the "feature vector" is a seeded projection of the bytes. */
  trait MediaCodec extends Serializable {
    def decode(kind: String, content: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in decoder (STUB — not a real codec). */
  object FakeCodec extends MediaCodec {
    def decode(kind: String, content: Array[Byte]): Array[Float] = {
      val dim = 8
      val out = new Array[Float](dim)
      var i = 0
      while (i < content.length) {
        out(i % dim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Batched per-partition feature extraction: one codec instance per
    * partition (the `:initialize-fn` pattern, datasplash
    * core.clj:274-277), iterating a whole Arrow-sized batch without
    * per-row setup. Input must have media_id/kind/content columns. */
  def extractFeatures(df: DataFrame, codec: MediaCodec = FakeCodec)
                     (implicit enc: Encoder[MediaFeature]): Dataset[MediaFeature] = {
    import org.apache.spark.sql.Row
    df.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        // per-partition setup happens here (once), not per element
        rows.map { r: Row =>
          val id = r.getLong(0); val kind = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val crc = { val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue }
          MediaFeature(id, kind, bytes.length.toLong,
            if (bytes.isEmpty) -1 else bytes(0) & 0xff, crc,
            codec.decode(kind, bytes))
        }
      }(enc)
  }

  /** Vectorized codec seam: decode a whole batch in one call — the
    * slot for decoders that amortize per-call overhead (GPU image
    * decode, JNI ffmpeg, an Arrow-based library). Output must align
    * 1:1 with the input arrays. */
  trait BatchCodec extends Serializable {
    def decodeBatch(kinds: Array[String], contents: Array[Array[Byte]]): Array[Array[Float]]
    def batchSize: Int = 256
  }

  /** Per-row codec lifted to the batch contract (the identity
    * adapter; swap for a genuinely vectorized decoder in deployment). */
  def batching(codec: MediaCodec, size: Int = 256): BatchCodec = new BatchCodec {
    override def batchSize: Int = size
    def decodeBatch(kinds: Array[String], contents: Array[Array[Byte]]): Array[Array[Float]] = {
      val out = new Array[Array[Float]](kinds.length)
      var i = 0
      while (i < kinds.length) { out(i) = codec.decode(kinds(i), contents(i)); i += 1 }
      out
    }
  }

  /** Batched feature extraction: partitions are consumed in
    * `codec.batchSize` slices and decoded one batch per call — the
    * Arrow-batched UDF shape with the decode amortized across the
    * batch (how a GPU decoder wants to be fed). Row order and output
    * schema are identical to [[extractFeatures]] (spec-asserted). */
  def extractFeaturesBatched(df: DataFrame, codec: BatchCodec)
                            (implicit enc: Encoder[MediaFeature]): Dataset[MediaFeature] = {
    require(codec.batchSize > 0, "codec.batchSize must be positive")
    import org.apache.spark.sql.Row
    df.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(codec.batchSize).flatMap { batch =>
          val kinds = batch.map(_.getString(1)).toArray
          val bytes = batch.map(r =>
            Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)).toArray
          val feats = codec.decodeBatch(kinds, bytes)
          batch.iterator.zipWithIndex.map { case (r: Row, i) =>
            val crc = { val c = new java.util.zip.CRC32(); c.update(bytes(i)); c.getValue }
            MediaFeature(r.getLong(0), kinds(i), bytes(i).length.toLong,
              if (bytes(i).isEmpty) -1 else bytes(i)(0) & 0xff, crc, feats(i))
          }
        }
      }(enc)
  }

  /** Columnar byte-level features (no decode needed — stays in
    * codegen): payload size and cheap integrity hash. */
  def byteFeatures(df: DataFrame, content: String = "content"): DataFrame =
    df.withColumn("n_bytes", length(col(content)).cast("long"))
      .withColumn("byte_crc", crc32(col(content)))

  /** Resize stub: downsample the payload by keeping every `factor`-th
    * byte — the per-partition batch shape of an image resize with the
    * codec stubbed to byte striding (swap the loop body for a real
    * scaler via [[MediaCodec]]-style injection). */
  def resizeStub(df: DataFrame, factor: Int)(
      implicit enc: Encoder[(Long, Array[Byte])]): Dataset[(Long, Array[Byte])] =
    df.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val out = new Array[Byte]((bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
        (r.getLong(0), out)
      }
    }

  /** Frame-sample stub: pick every `stride`-th chunk of `chunk` bytes
    * from the payload — the partitioning/batching shape of video
    * frame-sampling with the codec stubbed to byte-slicing. */
  def frameSample(df: DataFrame, chunk: Int, stride: Int, content: String = "content"): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0), greatest((length(col(content)) / (chunk * stride)) - 1, lit(0)).cast("int")),
        i => call_function("substring", col(content), (i * chunk * stride + 1).cast("int"), lit(chunk))))

  /** Perceptual average-hash of a binary payload (see
    * [[graft.plans.AHash]]): `bits` near-equal byte cells, bit i = 1
    * iff cell i's mean byte exceeds the payload mean (exact integer
    * cross-multiplication — engine-portable). Locality-preserving:
    * a few flipped bytes move a few bits, so near-identical payloads
    * that `md5(content)` exact dedup can never see sit within a small
    * Hamming distance. Default 60 bits = the oracle-replayable width
    * (DuckDB BIGINT `<<` throws at 63); [[aHash64]] is the full-width
    * production variant. */
  def aHash(content: Column, bits: Int = 60): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.AHash(org.apache.spark.sql.graft.Bridge.expression(content), bits))

  /** Full-width 64-bit aHash (production tier — not SQL-replayable
    * because engines with signed-shift semantics can't assemble bit
    * 63; everything else identical to [[aHash]]). */
  def aHash64(content: Column): Column = aHash(content, 64)

  /** Near-duplicate media pairs — perceptual near-dup over opaque
    * binary payloads, the capability exact `md5(content)` dedup is
    * structurally blind to (a re-encoded or lightly-corrupted copy
    * shares zero md5 but ~all aHash bits). Fingerprints via [[aHash]]
    * (one zero-shuffle codegen pass over the payload bytes), pairing
    * via the EXISTING simhash multi-block pigeonhole machinery
    * ([[Dedup.simhashPairsFp]] — candidates shuffle on derived
    * block-combination keys, never all-pairs, exact-Hamming verified;
    * see its Scaladoc for the scale analysis). Output:
    * (id_a, id_b, hamming) with id_a < id_b, ids must be unique.
    *
    * 100 TB: the payload bytes never shuffle — only (id, 64-bit fp)
    * rows enter the pigeonhole join, so the shuffled volume is ~16
    * bytes/payload regardless of media size. */
  def mediaNearDupPairs(df: DataFrame, id: String, content: Column,
                        maxDist: Int = 8, bits: Int = 60,
                        agreeBlocks: Int = 0): DataFrame =
    Dedup.simhashPairsFp(
      df.select(col(id), aHash(content, bits).as("__ahash")),
      id, col("__ahash"), maxDist, agreeBlocks)

  /** Perceptual difference-hash (gradient fingerprint — see
    * [[graft.plans.DHash]]): `bits + 1` byte cells, bit i = 1 iff
    * cell i's mean exceeds cell i+1's (exact integer
    * cross-multiplication). The complement to [[aHash]]: a brightness
    * RAMP flips aHash's low/high cells wholesale but barely moves
    * adjacent-cell differences, so gradient-overlaid near-dups stay
    * within a small dHash Hamming distance where aHash reads ~bits/2.
    * Default 60 bits = the oracle-replayable width. */
  def dHash(content: Column, bits: Int = 60): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.DHash(org.apache.spark.sql.graft.Bridge.expression(content), bits))

  /** Full-width 64-bit dHash (production tier, not SQL-replayable —
    * same contract split as [[aHash64]]). */
  def dHash64(content: Column): Column = dHash(content, 64)

  /** End-to-end video-frame near-dup — the composed multimodal
    * pipeline ([[frameSample]] → per-frame [[dHash]] →
    * [[graft.functions.Dedup.simhashPairsFp]] pigeonhole →
    * media-level rollup): sample every `stride`-th `chunk`-byte frame
    * of each payload, fingerprint each frame (gradient tier — robust
    * to the brightness drift re-encodes introduce), pair frames
    * within `maxDist` Hamming via the derived-key pigeonhole (never
    * all-pairs), and aggregate to media pairs. Output:
    * (media_a, media_b, n_frame_pairs, min_hamming) with media_a <
    * media_b as strings, counting cross-media near-dup frame pairs
    * (same-media pairs — adjacent-frame similarity — are dropped).
    *
    * 100 TB: payload bytes never shuffle — frames are projected
    * map-side and only (frame-key, 64-bit fp) rows enter the
    * pigeonhole; the rollup groups the (already small) verified pair
    * set. Ids must be unique per media row. */
  def videoFrameNearDupPairs(df: DataFrame, id: String, content: Column,
                             chunk: Int = 64, stride: Int = 2,
                             maxDist: Int = 8, bits: Int = 60,
                             agreeBlocks: Int = 0): DataFrame = {
    val framed = frameSample(
      df.select(col(id).cast("string").as("__mid"), content.as("__content")),
      chunk, stride, "__content")
    val keyed = framed
      .select(col("__mid"), posexplode(col("frames")).as(Seq("__fidx", "__fb")))
      .select(concat(col("__mid"), lit("#"), col("__fidx")).as("__fid"),
        col("__mid"), dHash(col("__fb"), bits).as("__fp"))
    val pairs = graft.functions.Dedup.simhashPairsFp(
      keyed.select(col("__fid"), col("__fp")), "__fid", col("__fp"),
      maxDist, agreeBlocks)
    val sides = keyed.select(col("__fid"), col("__mid"))
    pairs
      .join(sides.select(col("__fid").as("__ka"), col("__mid").as("__ma")),
        col("id_a") === col("__ka"))
      .join(sides.select(col("__fid").as("__kb"), col("__mid").as("__mb")),
        col("id_b") === col("__kb"))
      .where(col("__ma") =!= col("__mb"))
      .select(least(col("__ma"), col("__mb")).as("media_a"),
        greatest(col("__ma"), col("__mb")).as("media_b"), col("hamming"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("n_frame_pairs"),
        min(col("hamming")).as("min_hamming"))
  }

  /** Scene-cut detection — the shot-boundary pass a video-curation
    * pipeline runs before per-scene sampling/dedup: consecutive
    * sampled frames whose gradient fingerprints sit farther than
    * `threshold` Hamming bits apart mark a boundary (within a shot,
    * consecutive frames are near-identical → distance ~0; across a
    * hard cut the fingerprint is uncorrelated → ~bits/2).
    * [[frameSample]] → per-frame [[dHash]] → one per-media lag.
    *
    * Exactness: fingerprints are the exact integer dHash kernel and
    * the distance is bit_count(xor) — all-integer, hash-exact against
    * the q_media_dhash replay recipe. Scale: payload bytes never
    * shuffle (frames project map-side); ONE per-media window ordered
    * by frame index — frames-per-media is bounded by payload size /
    * (chunk·stride) by construction. Output: (media_id, frame_idx,
    * hamming, is_cut) — one row per frame AFTER its media's first. */
  def sceneCutReport(df: DataFrame, id: String, content: Column,
                     chunk: Int = 64, stride: Int = 2,
                     threshold: Int = 8, bits: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val framed = frameSample(
      df.select(col(id).cast("string").as("__mid"), content.as("__content")),
      chunk, stride, "__content")
    val keyed = framed
      .select(col("__mid"), posexplode(col("frames")).as(Seq("__fidx", "__fb")))
      .select(col("__mid"), col("__fidx"), dHash(col("__fb"), bits).as("__fp"))
    val w = Window.partitionBy(col("__mid")).orderBy(col("__fidx"))
    keyed.withColumn("__pfp", lag(col("__fp"), 1).over(w))
      .where(col("__pfp").isNotNull)
      .select(col("__mid").as("media_id"),
        col("__fidx").cast("long").as("frame_idx"),
        bit_count(col("__fp").bitwiseXOR(col("__pfp"))).cast("long")
          .as("hamming"),
        (bit_count(col("__fp").bitwiseXOR(col("__pfp"))) > threshold)
          .cast("int").cast("long").as("is_cut"))
  }

  /** Build a media table from any binary-bearing source (here: text
    * bytes as stand-in payloads, for test determinism). */
  def fromBinary(spark: SparkSession, src: DataFrame, id: String, bin: Column, kind: String): DataFrame =
    src.select(col(id).cast("long").as("media_id"), lit(kind).as("kind"), bin.as("content"),
      struct(lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
}
