package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass MinHash signature aggregate: given the stream of a
  * document's shingle hashes, produce the nPerm-slot signature
  * sig[p] = min over shingles of mix(h, p).
  *
  * Why a custom Aggregator (SURVEY.md §7.2 "custom Catalyst" bucket):
  * the DataFrame formulation needs nPerm separate `min()` aggregate
  * expressions over nPerm projected hash columns — nPerm× the
  * aggregation state traffic and a wide row per shingle. This
  * Aggregator keeps one long[] per group, updated in place, and
  * merges map-side partials elementwise — the shuffle carries one
  * 256-byte buffer per document instead of nPerm columns.
  *
  * The per-permutation mix is a Murmur3-style finalizer over
  * (h XOR seed(p)) — independent enough permutations for banding.
  */
object MinHashAgg {
  final val DefaultPerms = 32

  def mix(h: Long, p: Int): Long = {
    var x = h ^ (0x9e3779b97f4a7c15L * (p + 1))
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  final class SigAggregator(nPerm: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(nPerm)(Long.MaxValue)
    def reduce(sig: Array[Long], h: Long): Array[Long] = {
      var p = 0
      while (p < nPerm) {
        val m = mix(h, p)
        if (m < sig(p)) sig(p) = m
        p += 1
      }
      sig
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var p = 0
      while (p < nPerm) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
      a
    }
    def finish(sig: Array[Long]): Seq[Long] = sig.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: minhash_sig(hashCol) → array<long> of length nPerm. */
  def minhashSig(hashCol: Column, nPerm: Int = DefaultPerms): Column =
    udaf(new SigAggregator(nPerm), Encoders.scalaLong).apply(hashCol)
}
