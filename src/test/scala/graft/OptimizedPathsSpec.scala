package graft

import graft.ctas.SiteScoring
import graft.dedup.{ConnectedComponents, Dedup}
import graft.kernels.MatrixKernels
import org.apache.spark.sql.functions._

/** Round-6 optimization equivalence pins: every optimized internal path
  * must produce the identical result as the shape it replaced.
  */
class OptimizedPathsSpec extends GraftSuite {
  import spark.implicits._

  // ---------------------------------------------------------- auroc

  /** the pre-optimization boxed reference implementation, verbatim */
  private def aurocBoxed(score: Array[Double], bool: Array[Boolean]): Double = {
    val n = score.length
    val n1 = bool.count(!_)
    val n2 = n - n1
    if (n1 == 0 || n2 == 0) return Double.NaN
    val order = score.indices.sortBy { i =>
      val v = -score(i)
      (v.isNaN, v)
    }
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && !score(order(j + 1)).isNaN && !score(order(i)).isNaN &&
        score(order(j + 1)) == score(order(i))) j += 1
      val avg = (i + j + 2) / 2.0
      var t = i
      while (t <= j) { ranks(order(t)) = avg; t += 1 }
      i = j + 1
    }
    var u = 0.0
    i = 0
    while (i < n) {
      if (!bool(i)) u += ranks(i)
      i += 1
    }
    u -= n1.toDouble * (n1 + 1) / 2.0
    1.0 - u / n1.toDouble / n2.toDouble
  }

  test("auroc primitive sort is bit-identical to the boxed reference " +
    "(ties, NaNs, signs, zeros)") {
    val rng = new java.util.SplittableRandom(42)
    for (trial <- 1 to 50) {
      val n = 2 + rng.nextInt(60)
      val score = Array.fill(n) {
        rng.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => 0.0
          case 2 => -0.0
          case 3 => rng.nextInt(4).toDouble // force ties
          case _ => rng.nextGaussian()
        }
      }
      val bool = Array.fill(n)(rng.nextBoolean())
      val got = MatrixKernels.auroc(score, bool)
      val want = aurocBoxed(score, bool)
      assert(
        (got.isNaN && want.isNaN) ||
          java.lang.Double.doubleToRawLongBits(got) ==
          java.lang.Double.doubleToRawLongBits(want),
        s"trial $trial: got $got want $want for ${score.mkString(",")}")
    }
  }

  // ------------------------------------------ ranked p.adjust dispatch

  test("ranked p.adjust: driver kernel equals the distributed recipe " +
    "value-for-value on tied, untied and extreme inputs") {
    val rng = new java.util.SplittableRandom(7)
    val ps = (1 to 777).map { i =>
      rng.nextInt(5) match {
        case 0 => 0.05           // heavy tie group
        case 1 => 1.0
        case 2 => 1e-12
        case _ => rng.nextDouble()
      }
    }
    val df = ps.zipWithIndex.map { case (p, i) => (s"row_$i", p) }.toDF("k", "p")
    for (method <- Seq("fdr", "holm", "hochberg", "BY")) {
      // default padjust takes the gated driver path at this size
      val fast = SiteScoring.padjust(df, "p", "p_adj", method)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val dist = SiteScoring.rankedAdjust(df, "p", "p_adj", method)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(fast.keySet === dist.keySet, method)
      fast.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToRawLongBits(v) ==
          java.lang.Double.doubleToRawLongBits(dist(k)),
          s"$method $k: fast $v dist ${dist(k)}")
      }
      spark.catalog.clearCache()
    }
  }

  // ------------------------------------- connected components dispatch

  test("connected components: driver union-find fast path equals the " +
    "forced star rounds on random graphs") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 200
      val pairs = Seq.fill(260)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2).toDF("id1", "id2")
      val fast = ConnectedComponents.connectedComponents(pairs, "id1", "id2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val stars = ConnectedComponents.connectedComponents(pairs, "id1", "id2",
        driverEdgeCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === stars, s"trial $trial")
    }
  }

  test("connected components: fast path equals star rounds on string ids " +
    "(binary collation order)") {
    val pairs = Seq(("b", "a"), ("c", "b"), ("Z", "aa"), ("z", "Z"))
      .toDF("id1", "id2")
    val fast = ConnectedComponents.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val stars = ConnectedComponents.connectedComponents(pairs, "id1", "id2",
      driverEdgeCap = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fast === stars)
    // "Z" (0x5a) sorts before "a" (0x61) byte-wise: the Z~aa~z component
    // must canonicalize to "Z" under Spark's binary string ordering
    assert(fast("z") === "Z" && fast("aa") === "Z")
  }

  // ------------------------------------ inverted-index all-pairs Jaccard

  test("jaccardAllPairsByIndex equals the all-pairs array_intersect form " +
    "for every pair with a shared shingle") {
    val rng = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0L until 40L).map { id =>
      val words = Seq.fill(6 + rng.nextInt(20))(vocab(rng.nextInt(vocab.length)))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
      .select(col("doc_id"), Dedup.shinglesFromWords(col("__w"), 2).as("sh"))
    val viaIndex = Dedup.jaccardAllPairsByIndex(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val l = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val r2 = sh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    val viaPairs = l.join(r2, col("id1") < col("id2"))
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") > 0)
      .select(col("id1"), col("id2"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaIndex.keySet === viaPairs.keySet)
    viaIndex.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(viaPairs(k)), s"$k")
    }
  }

  // ------------------------------------- MatVec broadcast matrix transport

  test("MatVec matrices travel as ONE shared broadcast handle, values unchanged") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = 768
    val planes = 32
    val mat = graft.ann.Ann.planeMatrix(planes, dim)
    val c1 = graft.functions.MatVec.hyperplaneSig(col("vec"), mat, dim)
    val c2 = graft.functions.MatVec.hyperplaneSig(col("vec"), mat, dim)
    val e1 = ColumnBridge.expression(c1).asInstanceOf[graft.functions.HyperplaneSig]
    val e2 = ColumnBridge.expression(c2).asInstanceOf[graft.functions.HyperplaneSig]
    // identical matrix content -> one memoized broadcast per context (the
    // q- and c-sides of an LSH/IVF join must not ship two copies)
    assert(e1.matBc eq e2.matBc)
    // the serialized plan carries a broadcast HANDLE, not the matrix: the
    // 32x768 matrix is ~196 KB of raw doubles (and the old boxed
    // IndexedSeq field serialized several times larger); the handle must
    // stay orders of magnitude below that, or task binaries re-ship the
    // matrix with every stage
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(e1.matBc); oos.close()
    assert(bos.size() < 32 * 1024, s"broadcast handle serialized to ${bos.size()} bytes")
    // value equivalence against plain driver-side loops on the same matrix
    val rng = new java.util.SplittableRandom(7)
    val rows = (0L until 64L).map(i => (i, Array.fill(dim)(rng.nextGaussian())))
    val df = rows.toDF("id", "vec")
    val got = df.select(col("id"), c1.as("sig"),
        graft.functions.MatVec.topCells(
          col("vec").cast("array<double>"), mat, dim, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2)))).toMap
    val matArr = mat.toArray
    def dot(v: Array[Double], row: Int): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * matArr(row * dim + i); i += 1 }
      s
    }
    rows.foreach { case (id, v) =>
      var sig = 0L
      (0 until planes).foreach(p => if (dot(v, p) >= 0) sig |= (1L << p))
      assert(got(id)._1 === sig, s"sig id=$id")
      val expectedCells = (0 until planes).sortBy(r => (-dot(v, r), r)).take(3)
      assert(got(id)._2 === expectedCells, s"cells id=$id")
    }
  }
}
