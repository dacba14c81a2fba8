package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned persistence for DRIVER-HELD fitted model artifacts — the
  * arrays the training seams produce and recompute per session without
  * it: IVF coarse centroids, PQ codebooks (raw or residual), SQ8
  * bounds, DSIR bucket counts / log-ratios, a logistic bias. Production
  * pipelines fit once and reuse across runs; these helpers make every
  * artifact a restart-loadable file.
  *
  * Format: one small binary blob through [[GraftIO.writeBytes]] /
  * [[GraftIO.readBytes]] (so it lands on any configured Hadoop
  * filesystem) with a self-describing header — magic, format version,
  * a caller-chosen `kind` tag, a shape tag — validated loudly on load:
  * loading a `pq-codebooks` file as `ivf-centroids` is an error with a
  * message, not a garbage model. TABLE-shaped artifacts (lang trigram
  * profiles, logistic weight tables, MinHash band tables, BPE merges —
  * see `TextFunctions.bpeMergesToTable`) stay parquet through the
  * DataFrame writers; this file is only for the array-shaped remainder.
  *
  * All payloads are driver-sized by the same contract that lets them
  * ride query plans as literals/reference objects (centroids: kLists ×
  * dim doubles; codebooks: m × ksub × dsub; DSIR: buckets longs) —
  * far under [[GraftIO.readBytes]]'s 2 GB bound.
  */
object ModelArtifacts {

  private val Magic = 0x47524d41 // "GRMA"
  private val Version = 1
  private val TagVector = 1: Byte   // Array[Double]
  private val TagLongVec = 2: Byte  // Array[Long]
  private val TagMatrix = 3: Byte   // Array[Array[Double]] (ragged ok)
  private val TagTensor3 = 4: Byte  // Array[Array[Array[Double]]]

  private def write(spark: SparkSession, path: String, kind: String,
                    tag: Byte)(body: java.io.DataOutputStream => Unit): Unit = {
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bytes)
    out.writeInt(Magic); out.writeInt(Version); out.writeUTF(kind)
    out.writeByte(tag.toInt)
    body(out)
    out.flush()
    GraftIO.writeBytes(spark, path, bytes.toByteArray)
  }

  private def read[A](spark: SparkSession, path: String, kind: String,
                      tag: Byte)(body: java.io.DataInputStream => A): A = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(GraftIO.readBytes(spark, path)))
    val magic = in.readInt()
    require(magic == Magic,
      s"$path is not a graft model artifact (magic ${magic.toHexString})")
    val ver = in.readInt()
    require(ver == Version, s"$path: unsupported artifact version $ver")
    val storedKind = in.readUTF()
    require(storedKind == kind,
      s"$path holds a '$storedKind' artifact, expected '$kind'")
    val storedTag = in.readByte()
    require(storedTag == tag,
      s"$path: shape tag $storedTag does not match expected $tag for '$kind'")
    body(in)
  }

  def saveVector(spark: SparkSession, path: String, kind: String,
                 a: Array[Double]): Unit =
    write(spark, path, kind, TagVector) { out =>
      out.writeInt(a.length); a.foreach(out.writeDouble)
    }

  def loadVector(spark: SparkSession, path: String,
                 kind: String): Array[Double] =
    read(spark, path, kind, TagVector) { in =>
      Array.fill(in.readInt())(in.readDouble())
    }

  def saveLongVector(spark: SparkSession, path: String, kind: String,
                     a: Array[Long]): Unit =
    write(spark, path, kind, TagLongVec) { out =>
      out.writeInt(a.length); a.foreach(out.writeLong)
    }

  def loadLongVector(spark: SparkSession, path: String,
                     kind: String): Array[Long] =
    read(spark, path, kind, TagLongVec) { in =>
      Array.fill(in.readInt())(in.readLong())
    }

  def saveMatrix(spark: SparkSession, path: String, kind: String,
                 m: Array[Array[Double]]): Unit =
    write(spark, path, kind, TagMatrix) { out =>
      out.writeInt(m.length)
      m.foreach { row => out.writeInt(row.length); row.foreach(out.writeDouble) }
    }

  def loadMatrix(spark: SparkSession, path: String,
                 kind: String): Array[Array[Double]] =
    read(spark, path, kind, TagMatrix) { in =>
      Array.fill(in.readInt())(Array.fill(in.readInt())(in.readDouble()))
    }

  def saveTensor3(spark: SparkSession, path: String, kind: String,
                  t: Array[Array[Array[Double]]]): Unit =
    write(spark, path, kind, TagTensor3) { out =>
      out.writeInt(t.length)
      t.foreach { m =>
        out.writeInt(m.length)
        m.foreach { row => out.writeInt(row.length); row.foreach(out.writeDouble) }
      }
    }

  def loadTensor3(spark: SparkSession, path: String,
                  kind: String): Array[Array[Array[Double]]] =
    read(spark, path, kind, TagTensor3) { in =>
      Array.fill(in.readInt())(
        Array.fill(in.readInt())(Array.fill(in.readInt())(in.readDouble())))
    }

  // ---- named wrappers for the engine's fitted artifacts -------------

  def saveIvfCentroids(spark: SparkSession, path: String,
                       cents: Array[Array[Double]]): Unit =
    saveMatrix(spark, path, "ivf-centroids", cents)
  def loadIvfCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    loadMatrix(spark, path, "ivf-centroids")

  def savePqCodebooks(spark: SparkSession, path: String,
                      cb: Array[Array[Array[Double]]]): Unit =
    saveTensor3(spark, path, "pq-codebooks", cb)
  def loadPqCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] =
    loadTensor3(spark, path, "pq-codebooks")

  def saveSq8Bounds(spark: SparkSession, path: String,
                    mins: Array[Double], maxs: Array[Double]): Unit =
    saveMatrix(spark, path, "sq8-bounds", Array(mins, maxs))
  def loadSq8Bounds(spark: SparkSession, path: String): (Array[Double], Array[Double]) = {
    val m = loadMatrix(spark, path, "sq8-bounds")
    require(m.length == 2, s"$path: sq8 bounds must hold (mins, maxs), got ${m.length} rows")
    (m(0), m(1))
  }

  def saveDsirLogRatios(spark: SparkSession, path: String,
                        lr: Array[Double]): Unit =
    saveVector(spark, path, "dsir-log-ratios", lr)
  def loadDsirLogRatios(spark: SparkSession, path: String): Array[Double] =
    loadVector(spark, path, "dsir-log-ratios")

  def saveDsirBucketCounts(spark: SparkSession, path: String,
                           counts: Array[Long]): Unit =
    saveLongVector(spark, path, "dsir-bucket-counts", counts)
  def loadDsirBucketCounts(spark: SparkSession, path: String): Array[Long] =
    loadLongVector(spark, path, "dsir-bucket-counts")
}
