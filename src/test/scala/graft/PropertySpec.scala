package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAgg, RollingMinHash}
import graft.operators.GraphOps

/** Generative properties for the custom Catalyst pieces and the
  * iterative graph operator — randomized (seeded, deterministic)
  * inputs where the fixed oracles can't reach: adversarial shapes,
  * boundary lengths, duplicate-heavy multisets.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  var spark: SparkSession = _
  override def beforeAll(): Unit = { spark = GraftSession.local(4) }

  test("RollingMinHash.compute == naive per-window recompute (200 cases)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(64) // includes 0 (empty) and sub-window lengths
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val k = 1 + rnd.nextInt(24)
      def naiveWindow(off: Int, w: Int): Long = {
        var h = 0L
        (off until off + w).foreach(i => h = h * RollingMinHash.Base + (bytes(i) & 0xff))
        h
      }
      val expect =
        if (n == 0) 0L
        else {
          val w = math.min(k, n)
          (0 to n - w).map(naiveWindow(_, w)).min
        }
      assert(RollingMinHash.compute(bytes, k) == expect,
        s"n=$n k=$k bytes=${bytes.take(8).mkString(",")}…")
    }
  }

  test("CdcChunks: lossless + boundary-deterministic + naive-boundary agreement (300 cases)") {
    import graft.functions.CdcChunks
    val rnd = new scala.util.Random(20260815L)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(400) // includes 0 and sub-window lengths
      // ASCII-range bytes (the expression's documented domain)
      val bytes = Array.fill(n)((32 + rnd.nextInt(95)).toByte)
      val w = 2 + rnd.nextInt(24)
      val mb = 1 + rnd.nextInt(8)
      val a = CdcChunks.compute(bytes, w, mb)
      val chunks = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      val s = new String(bytes, "UTF-8")
      // lossless reconstruction, no empty chunks
      assert(chunks.mkString == s, s"n=$n w=$w mb=$mb")
      assert(chunks.forall(_.nonEmpty))
      // boundaries agree with a naive per-window hash scan
      if (n >= w) {
        val mask = (1L << mb) - 1L
        def windowHash(end: Int): Long = { // end inclusive, 0-based
          var h = 0L
          (end - w + 1 to end).foreach(i => h = h * RollingMinHash.Base + (bytes(i) & 0xff))
          h
        }
        val cuts = (w - 1 until n).filter(p => (windowHash(p) & mask) == 0L).map(_ + 1)
        val expectLens = (Seq(0) ++ cuts ++ (if (cuts.lastOption.contains(n)) Nil else Seq(n)))
          .sliding(2).map { case Seq(x, y) => y - x }.toSeq
        assert(chunks.map(_.length) == expectLens, s"n=$n w=$w mb=$mb")
      } else if (n > 0) assert(chunks == Seq(s))
    }
  }

  test("DP geometric thresholds: every 31-bit draw maps to exactly one noise value") {
    val thr = graft.operators.CurateOps.DpGeomThresholds
    val rnd = new scala.util.Random(7L)
    // random draws + the exact boundary values of every bucket
    val probes = Seq.fill(2000)(rnd.nextLong().abs % (1L << 31)) ++
      thr.flatMap { case (_, lo, hi) => Seq(lo / 3, (hi - 1) / 3, hi / 3) }
        .filter(u => u >= 0 && u < (1L << 31))
    probes.foreach { u =>
      val t = u * 3
      val hits = thr.filter { case (_, lo, hi) => t >= lo && t < hi }
      assert(hits.size == 1, s"u=$u t=$t hits=${hits.map(_._1)}")
      assert(math.abs(hits.head._1) <= 16)
    }
  }

  test("RAKE == driver brute force on 200 randomized stopword-laced docs") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    val stop = graft.operators.TextOps.RakeStopwords
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val rnd = new scala.util.Random(20260815L)
    // random mixes: stopwords anywhere incl. start/end, adjacent
    // stopwords, runs longer than the 4-word cap, repeated phrases
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      val toks = Seq.fill(n)(
        if (rnd.nextBoolean()) stop(rnd.nextInt(stop.size))
        else words(rnd.nextInt(words.size)))
      (i.toLong, toks.mkString(" "))
    }
    val got = graft.operators.TextOps.rakeOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val stopSet = stop.toSet
    val want = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty)
      val phrases = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var run = List.empty[String]
      for (w <- ws) {
        if (stopSet(w)) { if (run.nonEmpty) phrases += run.reverse; run = Nil }
        else run = w :: run
      }
      if (run.nonEmpty) phrases += run.reverse
      val kept = phrases.filter(_.size <= 4).toSeq
      if (kept.isEmpty) Nil
      else {
        val freq = kept.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val deg = kept.flatMap(p => p.map(_ -> p.size.toLong))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        kept.map(p => (p.mkString(" "), p.map(w => 1000L * deg(w) / freq(w)).sum))
          .distinct.sortBy { case (ph, sc) => (-sc, ph) }.take(3)
          .zipWithIndex.map { case ((ph, sc), j) => (id, j + 1L) -> (ph, sc) }
      }
    }.toMap
    assert(got == want,
      s"extra: ${(got.toSet diff want.toSet).take(3)}, missing: ${(want.toSet diff got.toSet).take(3)}")
    assert(want.size > 100, "fixture must produce plenty of keyword rows")
  }

  test("minhash signature is multiset-invariant (order + duplication, 100 cases)") {
    // the affine-permutation signature formula (the one the DuckDB
    // oracle replays): sig[p] = min over h of (h * A(p) + B(p))
    def sig(hs: Seq[Long], nPerm: Int): Seq[Long] =
      (0 until nPerm).map(p => hs.map(h => h * MinHashAgg.A(p) + MinHashAgg.B(p)).min)
    val rnd = new scala.util.Random(4712L)
    (1 to 100).foreach { _ =>
      val hs = Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong())
      val shuffledWithDups = rnd.shuffle(hs ++ Seq.fill(rnd.nextInt(10))(hs(rnd.nextInt(hs.size))))
      assert(sig(shuffledWithDups, 16) == sig(hs, 16))
    }
  }

  test("freq_sketch bounds hold for random streams and random merge splits") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(20260813L)
    (1 to 50).foreach { _ =>
      val k = 4 + rnd.nextInt(28)
      val agg = graft.functions.FreqSketchAgg(BoundReference(0, LongType, nullable = false), k)
      // zipf-ish stream: a few hot items + a long uniform tail
      val stream = Seq.fill(rnd.nextInt(300))(rnd.nextInt(3).toLong) ++
        Seq.fill(rnd.nextInt(300))(rnd.nextInt(100).toLong)
      if (stream.nonEmpty) {
        // split into random chunks, update each into its own buffer, merge
        val chunks = stream.grouped(1 + rnd.nextInt(stream.size)).toSeq
        val merged = chunks.map { chunk =>
          val b = agg.createAggregationBuffer()
          chunk.foreach(v => agg.update(b, InternalRow(v)))
          b
        }.reduce(agg.merge)
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = stream.size
        assert(merged.size <= k)
        merged.foreach { case (item, est) =>
          val f = exact(item)
          assert(est <= f && est >= f - n / (k + 1), s"k=$k item $item est $est f $f n $n")
        }
        exact.filter(_._2 > n / (k + 1)).keys
          .foreach(hh => assert(merged.contains(hh), s"k=$k heavy hitter $hh missing"))
      }
    }
  }

  test("connected components == driver union-find on random graphs") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(991L)
    (1 to 6).foreach { _ =>
      val n = 2 + rnd.nextInt(60)
      val edges = Seq.fill(1 + rnd.nextInt(80))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find ground truth
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expect = nodes.groupBy(find).flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        val got = GraphOps.connectedComponents(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"n=$n edges=$edges")
      }
    }
  }

  test("long chains converge within the doubling bound") {
    val ss = spark
    import ss.implicits._
    // a 400-hop path: diameter 400 — propagation alone would need 400
    // rounds; pointer doubling closes it within the default maxIter
    val chain = (0L until 400L).map(i => (i, i + 1)).toDF("src", "dst")
    val labs = GraphOps.connectedComponents(chain)
      .collect().map(r => r.getLong(1)).distinct
    assert(labs.toSeq == Seq(0L))
  }

  test("mayMatch conservativeness: skipped ⇒ truly empty, under fuzzed files + predicates") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.exec.{ColumnStats, FileStats}
    val rnd = new scala.util.Random(20260816L)
    val xA = AttributeReference("x", LongType)()
    val dA = AttributeReference("d", DecimalType(12, 2))()
    val sA = AttributeReference("s", StringType)()
    val attrs = Seq(xA, dA, sA)
    def randDec(): Decimal = Decimal(BigDecimal(rnd.nextInt(20000) - 10000, 2), 12, 2)
    def randStr(): UTF8String = UTF8String.fromString(
      // lengths past the 96-char bound exercise truncated-min /
      // dropped-max stats; varied alphabet exercises prefix windows
      (0 until rnd.nextInt(120)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    def randVal(dt: DataType): Any = dt match {
      case LongType => rnd.nextInt(200).toLong - 100L
      case _: DecimalType => randDec()
      case StringType => randStr()
    }
    // exact per-column stats from the rows, with the collector's string
    // bound policy applied (truncated min stays a prefix lower bound;
    // an over-long max is dropped)
    def statsOf(rows: Seq[InternalRow]): FileStats = {
      val cols = attrs.zipWithIndex.map { case (a, i) =>
        val vs = rows.map(_.get(i, a.dataType))
        val nulls = vs.count(_ == null).toLong
        val present = vs.filter(_ != null)
        val cs =
          if (present.isEmpty) ColumnStats(None, None, nulls)
          else {
            val ord = org.apache.spark.sql.catalyst.util.TypeUtils
              .getInterpretedOrdering(a.dataType)
            val (mn0, mx0) = (present.min(ord), present.max(ord))
            if (a.dataType == StringType) {
              val mnS = mn0.asInstanceOf[UTF8String]
              val mn = if (mnS.numChars() > 96) mnS.substring(0, 96) else mnS
              val mx = if (mx0.asInstanceOf[UTF8String].numChars() > 96) None else Some(mx0)
              ColumnStats(Some(mn), mx, nulls)
            } else ColumnStats(Some(mn0), Some(mx0), nulls)
          }
        a.name -> cs
      }
      FileStats(rows.size.toLong, cols.toMap)
    }
    def randPredicate(depth: Int): Expression = {
      val a = attrs(rnd.nextInt(attrs.length))
      def lit(): Literal = {
        // mostly in-range values, sometimes out-of-range, sometimes null
        if (rnd.nextInt(10) == 0) Literal(null, a.dataType)
        else Literal(randVal(a.dataType), a.dataType)
      }
      if (depth > 0 && rnd.nextInt(3) == 0) {
        if (rnd.nextBoolean()) And(randPredicate(depth - 1), randPredicate(depth - 1))
        else Or(randPredicate(depth - 1), randPredicate(depth - 1))
      } else rnd.nextInt(11) match {
        case 0 => EqualTo(a, lit())
        case 1 => EqualTo(lit(), a)
        case 2 => LessThan(a, lit())
        case 3 => LessThanOrEqual(a, lit())
        case 4 => GreaterThan(a, lit())
        case 5 => GreaterThanOrEqual(lit(), a)
        case 6 => EqualNullSafe(a, lit())
        case 7 =>
          val in = In(a, Seq.fill(1 + rnd.nextInt(3))(lit()))
          // NOT IN only over non-null lists (with a null the predicate
          // is never true and Catalyst folds it before pushdown)
          if (rnd.nextBoolean() && in.list.forall(_.asInstanceOf[Literal].value != null))
            Not(in)
          else in
        case 8 => if (rnd.nextBoolean()) IsNull(a) else IsNotNull(a)
        case 9 => Not(EqualTo(a, lit()))
        case _ => StartsWith(sA,
          Literal(UTF8String.fromString(
            (0 until rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString),
            StringType))
      }
    }
    var skipped = 0
    (1 to 150).foreach { _ =>
      // with some probability a column is ALL-null in this file —
      // exercising the null-count completeness path (an all-null
      // column satisfies no value predicate)
      val allNull = attrs.map(_ => rnd.nextInt(8) == 0)
      val rows = (0 until 1 + rnd.nextInt(30)).map { _ =>
        InternalRow.fromSeq(attrs.zipWithIndex.map { case (a, i) =>
          if (allNull(i) || rnd.nextInt(8) == 0) null else randVal(a.dataType)
        })
      }
      val fstats = statsOf(rows)
      (1 to 40).foreach { _ =>
        val p = randPredicate(2)
        val may = FileStats.mayMatch(p, fstats, fstats.cols.get)
        if (!may) {
          skipped += 1
          // a skipped file must contain NO row satisfying the predicate
          val bound = p.transform {
            case a: AttributeReference =>
              BoundReference(attrs.indexWhere(_.name == a.name), a.dataType, nullable = true)
          }
          val pred = Predicate.createInterpreted(bound)
          rows.foreach { r =>
            assert(!pred.eval(r),
              s"UNSOUND SKIP: predicate $p eliminated a file holding a matching row $r " +
                s"(stats: ${fstats.cols})")
          }
        }
      }
    }
    // the fuzz must actually exercise the skip path, not vacuously pass
    assert(skipped > 200, s"only $skipped skips — generator too conservative to test anything")
  }

  test("delta landing torture: random op interleavings match a driver-side model") {
    // the durability layer's contract under ANY interleaving of
    // landings, replays, folds, full overwrites, compactions and
    // vacuums: read() always equals the model a correct single-node
    // implementation would hold, and replayed epochs never double-land
    val sess = spark
    import sess.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("prop_delta").resolve("wh").toString,
      deltaFoldEvery = 4)
    val rnd = new scala.util.Random(20260815L)
    def rows(epoch: Long): Seq[(Long, Long)] =
      (0 until 1 + rnd.nextInt(5)).map(i => (epoch * 100 + i, epoch))
    var model = Map.empty[Long, Seq[(Long, Long)]] // epoch -> rows (None after overwrite)
    var overwritten: Seq[(Long, Long)] = Nil
    var landedEpochs = Set.empty[Long]
    var nextEpoch = 0L
    (1 to 60).foreach { _ =>
      rnd.nextInt(10) match {
        case k if k <= 4 => // land the next epoch
          val r = rows(nextEpoch)
          val did = store.appendDelta(r.toDF("id", "epoch"), "t", nextEpoch)
          assert(did, s"fresh epoch $nextEpoch must land")
          model += nextEpoch -> r; landedEpochs += nextEpoch; nextEpoch += 1
        case 5 | 6 if landedEpochs.nonEmpty => // at-least-once replay
          val e = landedEpochs.toSeq(rnd.nextInt(landedEpochs.size))
          assert(!store.appendDelta(rows(999).toDF("id", "epoch"), "t", e),
            s"replayed epoch $e must skip")
        case 7 => // maintenance fold
          store.foldDeltas("t")
        case 8 if rnd.nextInt(4) == 0 => // rare full overwrite
          val keep = Seq((-1L, -1L))
          store.write(keep.toDF("id", "epoch"), "t")
          model = Map.empty; overwritten = keep
          // superseded epochs must stay skipped
          if (landedEpochs.nonEmpty) {
            val e = landedEpochs.toSeq(rnd.nextInt(landedEpochs.size))
            assert(!store.appendDelta(rows(998).toDF("id", "epoch"), "t", e),
              s"superseded epoch $e must not resurrect")
          }
        case 9 =>
          if (rnd.nextBoolean()) store.compact("t") else store.vacuum("t")
        case _ => ()
      }
      if (store.exists("t")) {
        val expect = (overwritten ++ model.values.flatten).toSet
        val got = store.read("t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expect,
          s"read diverged from model: extra=${got -- expect} missing=${expect -- got}")
      }
    }
    assert(nextEpoch > 10, "the walk must actually land epochs")
  }
}
