package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded via a per-partition typed map — the Scala
  * analog of a vectorized decode UDF.
  *
  * The actual image/audio codec is STUBBED (this container has no media
  * libraries): `decodeStub` deterministically "parses" a fake header from
  * the payload bytes. Everything around the stub — binary column schema,
  * the `Dataset[T]`/`mapPartitions` batch shape, partition-local decode
  * with no shuffle, frame sampling — is the real 100 TB plumbing: decode
  * is embarrassingly parallel, runs one iterator per partition, and never
  * materializes more than a partition of payloads.
  */
object Multimodal {

  /** Opaque media record: id + undecoded payload bytes. */
  final case class MediaRaw(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata + deterministically sampled frame indices. */
  final case class MediaMeta(
      doc_id: Long, width: Int, height: Int, n_frames: Int,
      sampled_frames: Seq[Int])

  /** Synthesize a deterministic binary payload per document (sha2 bytes of
    * a tagged id) — stands in for real image/audio bytes so the decode
    * path has stable, verifiable input in every environment. */
  def synthesize(docs: DataFrame): Dataset[MediaRaw] =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        unhex(sha2(concat(lit("media:"), col("doc_id")), 256)).as("payload"))
      .as[MediaRaw](Encoders.product[MediaRaw])

  /** Per-payload feature vector: id + normalized byte histogram. */
  final case class MediaFeatures(doc_id: Long, histogram: Seq[Double])

  /** STUB decode: reads width/height/frame-count from the first payload
    * bytes as if they were a container header, then samples frames at a
    * fixed stride. Replace the body with a real codec call per element;
    * the signature and batch shape stay. */
  def decodeStub(ds: Dataset[MediaRaw]): Dataset[MediaMeta] =
    ds.mapPartitions { it =>
      it.map { r =>
        val b      = r.payload
        val width  = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
        val height = ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
        val nf     = (b(4) & 0xFF) % 15 + 1
        val stride = math.max(1, nf / 4)
        MediaMeta(r.doc_id, width, height, nf, 0 until nf by stride)
      }
    }(Encoders.product[MediaMeta])

  /** Resize metadata to fit a bounding box, preserving aspect ratio —
    * the dimension arithmetic every thumbnailing pass needs; the pixel
    * work would live in the same per-partition map as the codec. */
  def resize(ds: Dataset[MediaMeta], maxDim: Int): Dataset[MediaMeta] =
    ds.mapPartitions { it =>
      it.map { m =>
        val long = math.max(m.width, m.height)
        if (long <= maxDim || long == 0) m
        else {
          val scale = maxDim.toDouble / long
          m.copy(
            width = math.max(1, math.round(m.width * scale).toInt),
            height = math.max(1, math.round(m.height * scale).toInt))
        }
      }
    }(Encoders.product[MediaMeta])

  /** Feature extraction over the raw bytes: a normalized `bins`-bucket
    * byte-value histogram per payload — real math standing where an
    * embedding model's forward pass would run, with the same
    * partition-local batch shape (no shuffle, bounded memory). */
  def extractFeatures(ds: Dataset[MediaRaw], bins: Int): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.map { r =>
        val counts = new Array[Double](bins)
        r.payload.foreach { b => counts(((b & 0xFF) * bins) / 256) += 1.0 }
        val n = math.max(1, r.payload.length)
        MediaFeatures(r.doc_id, counts.map(_ / n).toIndexedSeq)
      }
    }(Encoders.product[MediaFeatures])

  /** 64-bit perceptual signature per payload. */
  final case class MediaSig(doc_id: Long, sig: Long)

  /** Perceptual hash over the feature vector — bit i set when feature i
    * exceeds the vector's own mean, the exact thresholding rule of the
    * published pHash family (DCT coefficients vs their median/mean; here
    * the STUBBED feature stage is the byte histogram, so the signature
    * is real math over stand-in features — swap [[extractFeatures]] for
    * a DCT/embedding pass and this stage is unchanged). Row-local,
    * partition-local, no shuffle; a one-byte payload perturbation moves
    * ≤ 2 histogram bins and so flips only the few bits whose bins cross
    * the mean — which is what makes Hamming distance a near-dup metric
    * here, exactly as in the image case. */
  def perceptualHash(ds: Dataset[MediaFeatures]): Dataset[MediaSig] =
    ds.mapPartitions { it =>
      it.map { f =>
        val m = f.histogram.sum / math.max(1, f.histogram.size)
        var sig = 0L
        var i = 0
        val lim = math.min(64, f.histogram.size)
        while (i < lim) {
          if (f.histogram(i) > m) sig |= (1L << i)
          i += 1
        }
        MediaSig(f.doc_id, sig)
      }
    }(Encoders.product[MediaSig])
}
