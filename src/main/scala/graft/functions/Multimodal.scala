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

  /** The deterministic stand-in payload of a document id — sha2 bytes
    * of the tagged id. ONE expression for [[synthesize]] and every DQ/
    * spec that plants payloads, so fixtures can't drift. */
  def payloadCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(sha2(concat(lit("media:"), docId), 256))

  /** Synthesize a deterministic binary payload per document (sha2 bytes of
    * a tagged id) — stands in for real image/audio bytes so the decode
    * path has stable, verifiable input in every environment. */
  def synthesize(docs: DataFrame): Dataset[MediaRaw] =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        payloadCol(col("doc_id")).as("payload"))
      .as[MediaRaw](Encoders.product[MediaRaw])

  /** Per-payload feature vector: id + normalized byte histogram. */
  final case class MediaFeatures(doc_id: Long, histogram: Seq[Double])

  /** The stub header arithmetic — (width, height, n_frames) from the
    * first payload bytes as if they were a container header. ONE
    * definition for [[decodeStub]] and [[decodeStubTagged]]. */
  private def headerOf(b: Array[Byte]): (Int, Int, Int) = {
    val width  = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
    val height = ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
    val nf     = (b(4) & 0xFF) % 15 + 1
    (width, height, nf)
  }

  /** STUB decode: reads width/height/frame-count from the first payload
    * bytes as if they were a container header, then samples frames at a
    * fixed stride. Replace the body with a real codec call per element;
    * the signature and batch shape stay. */
  def decodeStub(ds: Dataset[MediaRaw]): Dataset[MediaMeta] =
    ds.mapPartitions { it =>
      it.map { r =>
        val (width, height, nf) = headerOf(r.payload)
        val stride = math.max(1, nf / 4)
        MediaMeta(r.doc_id, width, height, nf, 0 until nf by stride)
      }
    }(Encoders.product[MediaMeta])

  /** Media record with a provenance tag riding through the decode. */
  final case class MediaRawTagged(doc_id: Long, tag: String,
      payload: Array[Byte])

  /** Decoded metadata with the tag preserved. */
  final case class MediaMetaTagged(doc_id: Long, tag: String,
      width: Int, height: Int, n_frames: Int)

  /** [[decodeStub]] with a tag column riding through — for consumers
    * that roll up per source/provenance WITHOUT re-joining the corpus
    * for it (one scan instead of scan + equi-join; same header
    * arithmetic by construction). */
  def decodeStubTagged(ds: Dataset[MediaRawTagged]): Dataset[MediaMetaTagged] =
    ds.mapPartitions { it =>
      it.map { r =>
        val (width, height, nf) = headerOf(r.payload)
        MediaMetaTagged(r.doc_id, r.tag, width, height, nf)
      }
    }(Encoders.product[MediaMetaTagged])

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

  /** The feature math of [[extractFeatures]] as a plain function —
    * normalized `bins`-bucket byte histogram. One definition shared by
    * the typed batch path and [[signatureOf]] so they cannot drift. */
  private[graft] def histogramOf(payload: Array[Byte], bins: Int): Array[Double] = {
    val counts = new Array[Double](bins)
    payload.foreach { b => counts(((b & 0xFF) * bins) / 256) += 1.0 }
    val n = math.max(1, payload.length)
    counts.map(_ / n)
  }

  /** Feature extraction over the raw bytes: a normalized `bins`-bucket
    * byte-value histogram per payload — real math standing where an
    * embedding model's forward pass would run, with the same
    * partition-local batch shape (no shuffle, bounded memory). */
  def extractFeatures(ds: Dataset[MediaRaw], bins: Int): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, histogramOf(r.payload, bins).toIndexedSeq)
      }
    }(Encoders.product[MediaFeatures])

  /** 64-bit perceptual signature per payload. */
  final case class MediaSig(doc_id: Long, sig: Long)

  /** The thresholding rule of [[perceptualHash]] as a plain function —
    * bit i set when feature i exceeds the vector's own mean. */
  private[graft] def sigOfHist(hist: Seq[Double]): Long = {
    val m = hist.sum / math.max(1, hist.size)
    var sig = 0L
    var i = 0
    val lim = math.min(64, hist.size)
    while (i < lim) {
      if (hist(i) > m) sig |= (1L << i)
      i += 1
    }
    sig
  }

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
      it.map(f => MediaSig(f.doc_id, sigOfHist(f.histogram)))
    }(Encoders.product[MediaSig])

  /** payload → 64-bit perceptual signature, the full
    * [[histogramOf]]→[[sigOfHist]] composition in one call — by
    * construction identical to the typed
    * [[extractFeatures]]→[[perceptualHash]] pipeline at bins = 64. */
  def signatureOf(payload: Array[Byte]): Long =
    sigOfHist(histogramOf(payload, 64).toIndexedSeq)

  /** [[signatureOf]] as a column, for callers that must keep sibling
    * columns alive (the streaming gate rides event time through): the
    * same per-row JVM function as the typed map, packaged as a UDF —
    * cost-equivalent (neither codegens), and sharing [[sigOfHist]]/
    * [[histogramOf]] means batch l53, the spec recompute, and the
    * streaming gate can never disagree on a signature.
    *
    * NULL-safe: a null payload (a missing blob from an external
    * source) signs NULL rather than NPE-ing the task — the streaming
    * gate's band/verify equi-joins then drop the row, mirroring how
    * the text gate's `docSketch` sheds null-text rows instead of
    * crashing the microbatch. */
  def sigCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((p: Array[Byte]) =>
      if (p == null) None else Some(signatureOf(p))).apply(payload)

  /** The 4×16-bit band explosion of a (doc_id, sig, …) frame — the
    * candidate-generation keys of batch [[graft.operators.LlmQueries]]
    * l53 AND the streaming media gate (pigeonhole-complete for
    * Hamming ≤ 3 of 64 bits). `keep` columns ride through. */
  def sigBandFrame(sigs: DataFrame, keep: Seq[String] = Nil): DataFrame =
    sigs.select(Seq(col("doc_id"), expr(
      "explode(transform(sequence(0, 3), b -> " +
        "struct(b AS band_id, shiftright(sig, b * 16) & 65535 AS bkey)))")
      .as("b")) ++ keep.map(col): _*)
      .select(Seq(col("doc_id"), col("b.band_id"), col("b.bkey")) ++
        keep.map(col): _*)
}
