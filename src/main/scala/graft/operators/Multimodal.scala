package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything around
  * it — schema, batching, partition-parallel execution, feature-vector
  * shape — is real. In production the stub body is replaced by the codec
  * call; the Spark plan is unchanged.
  *
  * We synthesize the payload from `documents.text` (utf-8 bytes) so the
  * pipeline runs on the driver-provided tables only.
  */
object Multimodal {
  /** STUB — stands in for image/audio decode + feature extraction.
    * Deterministic: 8 "features" = byte sums over 8 equal stripes of the
    * payload. Replace with a real codec at deployment; signature
    * (bytes → fixed-size Array[Double]) is the contract.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val n = 8
    val out = new Array[Double](n)
    if (payload.nonEmpty) {
      val stripe = math.max(1, payload.length / n)
      var i = 0
      while (i < payload.length) {
        out(math.min(i / stripe, n - 1)) += (payload(i) & 0xff)
        i += 1
      }
    }
    out
  }

  /** Binary payload + metadata columns (oracle-checked byte lengths/digest). */
  def mmMeta(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"))

  /** Full plumbing: binary column → per-partition batched "decode" →
    * fixed-shape feature vector, via mapPartitions (the Scala analogue of
    * mapInPandas batching: one stub call per row, one iterator per
    * partition, no driver collect).
    *
    * The fixed-width feature vector is emitted as scalar columns
    * `f0..f7` (BIGINT byte-stripe sums — the stub is integer-exact), so
    * the result is hashable by the driver's canonicalizer and has a
    * DuckDB oracle; a production decode emitting floats would quantize
    * the same way the embeddings table does.
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val nFeat = 8
    val src = Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +:
      StructField("n_bytes", IntegerType, nullable = false) +:
      (0 until nFeat).map(i => StructField(s"f$i", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val feats = stubDecode(payload)
        Row.fromSeq(id +: payload.length +: feats.map(_.toLong).toSeq)
      }
    }(enc)
  }
}
