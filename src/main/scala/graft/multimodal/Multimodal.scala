package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (extension): media as opaque `binary`
  * columns + typed metadata structs, with partition-wise decode/featurize.
  *
  * The actual image/audio decode is STUBBED (`decodeStub`) — codec
  * libraries are not in this container — but the Spark-side plumbing is
  * real: schema (binary + struct), partition-balanced `mapPartitions`
  * batch shape (the Scala analogue of `mapInPandas`), and a columnar
  * feature output that downstream operators consume. At 100 TB the
  * binary column rides Parquet with per-column compression; the decode
  * stage is embarrassingly parallel per partition.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** Build a media table from documents: payload = UTF-8 bytes standing in
    * for an encoded image; mime derived from the source. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      concat(lit("image/png;src="), col("source")).as("mime"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder: deterministic fake dimensions + byte checksum.
    * A real deployment swaps `decodeStub` for an actual codec call —
    * the signature (bytes → features) and the partition-wise batch
    * shape are what the pipeline depends on. */
  def decodeStub(docId: Long, payload: Array[Byte]): (Int, Int, Long) = {
    val checksum = payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
    ((docId % 640).toInt + 1, (docId % 480).toInt + 1, checksum)
  }

  /** Partition-wise featurization: one decoder instance per partition
    * (amortizes codec init), iterator-in/iterator-out — no per-row task
    * overhead, no driver collection. */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec handles etc.)
        rows.map { r =>
          val (w, h, sum) = decodeStub(r.doc_id, r.payload)
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, sum)
        }
      }
  }

  case class FrameRow(
      doc_id: Long, frame_idx: Int, offset: Long, n_bytes: Long,
      checksum: Long)

  /** Frame sampling — the video analogue of featurize: each media row
    * expands to its sampled frames (windows of `frameBytes` at `stride`
    * offsets; overlapping when stride < frameBytes, like a real
    * fixed-fps sampler over a GOP stream). The flatMap iterator is the
    * 1→N UDTF batch shape (`mapInPandas`-style): frames materialize
    * lazily per partition, never as a per-row driver array — a 2-hour
    * video row streams its frames through the same iterator the codec
    * would fill. The frame DECODE itself is the stub ([[decodeStub]]'s
    * checksum fold); the schema, offsets, and partition shape are what
    * a real sampler plugs into. */
  def frameSample(
      spark: SparkSession, media: DataFrame,
      frameBytes: Int, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = r.payload.length
          val frames =
            if (n < frameBytes) 0 else (n - frameBytes) / stride + 1
          Iterator.range(0, frames).map { k =>
            val off = k.toLong * stride
            var sum = 0L
            var i = off.toInt
            while (i < off + frameBytes) {
              sum = (sum * 31 + (r.payload(i) & 0xff)) % 1000003L
              i += 1
            }
            FrameRow(r.doc_id, k, off, frameBytes.toLong, sum)
          }
        }
      }
  }

  case class ResizedRow(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long)

  /** STUB resize — binary → binary with typed-metadata update. The
    * "quarter-resolution" spec both engines replay exactly: every 4th
    * byte of the payload survives (a real resampler's stride), both
    * dimensions halve (ceil), and the checksum folds over the SAMPLED
    * bytes only. A real deployment swaps the byte sampler for a codec
    * scale call; the partition-wise map shape, the metadata contract
    * (dims + n_bytes + checksum travel WITH the payload), and the
    * binary-in/binary-out signature are the real plumbing. */
  def resize(spark: SparkSession, media: DataFrame): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.payload.length
          val m = if (n == 0) 0 else (n - 1) / 4 + 1
          var sum = 0L
          var i = 0
          while (i < n) {
            sum = (sum * 31 + (r.payload(i) & 0xff)) % 1000003L
            i += 4
          }
          val (w0, h0) = ((r.doc_id % 640).toInt + 1, (r.doc_id % 480).toInt + 1)
          ResizedRow(r.doc_id, r.mime, (w0 + 1) / 2, (h0 + 1) / 2,
            m.toLong, sum)
        }
      }
  }

  /** STUB feature extractor — payload → fixed-width embedding, the
    * bridge from media into the ANN/dedup kernels. Each dimension j is
    * an exact integer rolling hash over the payload seeded by j+1,
    * normalized by one double division — engine-replayable bit for bit
    * (no float accumulation). A real extractor swaps the hash for a
    * model forward pass; the (binary → Array[Double]) signature,
    * per-partition batching, and downstream compatibility with the
    * q_ann_* kernels are the plumbing under test. */
  def embed(spark: SparkSession, media: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val e = Array.tabulate(dim) { j =>
            var sum = (j + 1).toLong
            var i = 0
            while (i < r.payload.length) {
              sum = (sum * 31 + (r.payload(i) & 0xff)) % 1000003L
              i += 1
            }
            sum.toDouble / 1000003.0
          }
          (r.doc_id, e)
        }
      }.toDF("doc_id", "embedding")
  }
}
