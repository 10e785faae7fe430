package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; the
  * decode / feature-extract steps run batched per partition so a real
  * decoder (libjpeg, ffmpeg, …) amortizes its setup per task, exactly
  * like a Pandas-UDF/`mapInPandas` stage would in PySpark.
  *
  * IMAGE decode is real ([[Multimodal.imageDecode]]: the JDK's
  * javax.imageio, PNG/BMP/GIF/JPEG). Audio/video decode is STUBBED
  * (this container ships no ffmpeg): `stubDecode` produces
  * deterministic pseudo-features from the bytes behind the same
  * signature. Everything around the seam — schema, batching, partition
  * mapping, output encoder — is the real Spark plumbing and is tested.
  */
object Multimodal {

  /** Canonical media-table schema: content is opaque bytes; metadata is
    * typed and queryable (partition/prune on kind + meta without ever
    * touching content — parquet column pruning keeps the 100 TB of bytes
    * unread for metadata-only queries).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("duration_ms", LongType))))))

  /** STUB decoder — stands in for image decode + feature extraction.
    * Deterministic in the content bytes: feature d = integer byte-fold
    * (Σ of bytes at positions ≡ d mod dim), reduced mod 2^24 so the
    * value is ALWAYS exactly representable in float32 regardless of
    * content size (unbounded lane sums would silently lose low bits
    * past 2^24) — engine-portable, so the driver's DuckDB oracle
    * reproduces it from the hex dump of the bytes. Replace with a real
    * decoder behind the same signature.
    */
  def stubDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        acc(i % dim) += content(i) & 0xff
        i += 1
      }
    }
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) { out(d) = (acc(d) % (1L << 24)).toFloat; d += 1 }
    out
  }

  /** REAL image decode for `kind='image'` rows: PNG/BMP/GIF/JPEG via the
    * JDK's own `javax.imageio` — no external codec dependency. Features
    * are a `dim`-bin luminance histogram normalized by pixel count
    * (ITU-R BT.601 integer luma: (299·R + 587·G + 114·B) / 1000), which
    * is size-invariant and deterministic across JVMs. Undecodable bytes
    * (unknown container, truncation, dirty data) fall back to
    * [[stubDecode]] instead of failing the task — a 100 TB media scan
    * must not die on one corrupt shard; audio/video stay on the stub
    * (this container ships no ffmpeg — the seam is the same signature).
    */
  def imageDecode(content: Array[Byte], dim: Int): Array[Float] = {
    if (content == null) return new Array[Float](dim)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) return stubDecode(content, dim)
      val counts = new Array[Long](dim)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          counts(lum * dim / 256) += 1
          x += 1
        }
        y += 1
      }
      val total = w.toLong * h
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) { out(d) = counts(d).toFloat / total; d += 1 }
      out
    } catch { case _: Exception => stubDecode(content, dim) }
  }

  /** Kind-routed batched feature extraction: image rows go through the
    * real [[imageDecode]], everything else through [[stubDecode]] —
    * same per-partition batching as [[extractFeatures]].
    */
  def extractImageFeatures(df: DataFrame, contentCol: String, kindCol: String,
                           dim: Int): DataFrame = {
    val kindIdx = df.schema.fieldIndex(kindCol)
    extractWith(df, contentCol) { (row, content) =>
      if (row.getString(kindIdx) == "image") imageDecode(content, dim)
      else stubDecode(content, dim)
    }
  }

  /** Batched per-partition feature extraction: binary content →
    * `features: array<float>`. One decoder instantiation per partition
    * (the `// decoder setup` line is where a real codec initializes),
    * rows streamed through it — the Scala shape of `mapInPandas`.
    */
  def extractFeatures(df: DataFrame, contentCol: String, dim: Int): DataFrame =
    extractWith(df, contentCol)((_, content) => stubDecode(content, dim))

  /** The shared per-partition plumbing of the extractors: schema+encoder
    * for the appended `features` column, row streaming, decode seam.
    */
  private def extractWith(df: DataFrame, contentCol: String)
                         (decode: (Row, Array[Byte]) => Array[Float]): DataFrame = {
    val outSchema  = df.schema.add("features", ArrayType(FloatType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // decoder setup happens here, once per partition/task (ImageIO's
      // plugin registry scan, an ffmpeg handle, a JNI context)
      rows.map { r =>
        val content = r.get(contentIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decode(r, content).toSeq)
      }
    }
  }

  /** Deterministic frame sampling for video-kind rows: pick every k-th
    * "frame" offset from the byte stream (stub: offsets only; a real
    * implementation hands offsets to the demuxer). Pure column ops.
    */
  def sampleFrameOffsets(df: DataFrame, contentCol: String, everyN: Int): DataFrame =
    df.withColumn("frame_offsets",
      when(col(contentCol).isNotNull,
        transform(
          sequence(lit(0), greatest((length(col(contentCol)) / everyN).cast("int") - 1, lit(0))),
          i => i * everyN))
        .otherwise(array().cast(ArrayType(IntegerType))))

  /** Perceptual-hash table over an extracted feature vector: bit b is
    * set iff lane b exceeds the MEAN lane (the classic aHash/pHash
    * thresholding, here over whatever [[extractFeatures]] produced —
    * stub byte-folds in this container, luminance histograms or DCT
    * coefficients behind the same seam in production). All integer:
    * lane·bits > Σ lanes avoids the mean division entirely, so the
    * fingerprint is engine-exact and the near-dup join
    * ([[Dedup.hammingPairs]]) is oracle-reproducible.
    *
    * Pure scan-stage projection: one interpreted fold for the lane
    * total (bits adds/row), then `bits` codegen'd comparisons.
    *
    * @return (idCol, fp) — fp over the low `bits` bits
    */
  def phashTable(df: DataFrame, idCol: String, featuresCol: String,
                 bits: Int): DataFrame = {
    require(bits >= 4 && bits <= 62, s"bits ($bits) must be in [4, 62]")
    val tot = aggregate(
      transform(col(featuresCol), x => x.cast("long")),
      lit(0L), (a, x) => a + x)
    val withTot = df.select(col(idCol),
      col(featuresCol).as("__f"), tot.as("__tot"))
    val fp = (0 until bits)
      .map(b => when(
        element_at(col("__f"), b + 1).cast("long") * bits > col("__tot"),
        lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    withTot.select(col(idCol), fp.as("fp"))
  }

  /** Build a media table from any binary-ish source column (used by
    * tests; production ingests parquet/tar shards directly).
    */
  def fromBytes(spark: SparkSession, rows: Seq[(Long, String, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("media_id", "kind", "content")
      .withColumn("meta", struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit("raw").as("format"),
        lit(null).cast(LongType).as("duration_ms")))
  }
}
