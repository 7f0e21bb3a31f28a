package graft

import graft.dedup.ConnectedComponents
import graft.sampling.Sampling
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends GraftSuite {
  import spark.implicits._

  /** brute-force union-find ground truth (path-halving) */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        parent(r) = parent.getOrElse(parent(r), parent(r))
        r = parent(r)
      }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min id in component; union-by-min keeps roots
    // minimal already, but normalize via a second pass to be safe
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.connectedComponents(
      pairs.toDF("id1", "id2"), "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, star, cliques, singleton-free: matches union-find") {
    val chain = (0L until 50L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (1L to 20L).map(i => (100L + i, 100L))
    val clique = for (a <- 200L to 205L; b <- 200L to 205L if a < b) yield (a, b)
    val pairs = chain ++ star ++ clique :+ (999L, 999L) // self-loop ignored
    val got = ccMap(pairs)
    val want = ufComponents(pairs.filter(p => p._1 != p._2)) + (999L -> 999L)
    assert(got === want)
    assert(got(49L) === 0L)    // far end of the chain reaches the min
    assert(got(120L) === 100L) // star collapses to hub (the min)
    assert(got(205L) === 200L)
  }

  test("random graphs match union-find across seeds") {
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val n = 300
      val pairs = Seq.fill(400)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(ccMap(pairs) === ufComponents(pairs), s"seed $seed")
    }
  }

  test("reversed and duplicated edges do not change the labeling") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val noisy = pairs ++ pairs.map(_.swap) ++ pairs
    assert(ccMap(noisy) === ccMap(pairs))
  }

  test("empty pair table yields empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(ConnectedComponents.connectedComponents(empty, "id1", "id2").isEmpty)
  }

  test("string ids work (url-keyed dedup)") {
    val pairs = Seq(("b.com", "a.com"), ("c.com", "b.com"), ("z.com", "y.com"))
      .toDF("id1", "id2")
    val got = ConnectedComponents.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a.com" -> "a.com", "b.com" -> "a.com",
      "c.com" -> "a.com", "y.com" -> "y.com", "z.com" -> "y.com"))
  }

  test("clusters() returns canonical id + sorted members per multi-member group") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("id1", "id2")
    val rows = ConnectedComponents.clusters(pairs, "id1", "id2")
      .orderBy("component").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 3L)
    assert(rows(0).getLong(1) === 3L)
    assert(rows(0).getSeq[Long](2) === Seq(3L, 5L, 9L))
    assert(rows(1).getLong(0) === 20L)
    assert(rows(1).getSeq[Long](2) === Seq(20L, 21L))
  }

  test("a long path converges (worst case for propagation, log rounds for stars)") {
    // 2^k-style adversarial shape for naive label propagation: a path of
    // 2000 nodes. Star alternation must finish well inside maxRounds.
    val path = (0L until 2000L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = ccMap(path)
    assert(got.size === 2000)
    assert(got.values.forall(_ == 0L))
  }

  // ------------------------------------------------------- Sampling

  test("deterministic sampling: rate monotone, partition-invariant, exact md5 rule") {
    val df = spark.range(0, 2000).select($"id")
    val kept20 = df.filter(Sampling.keep($"id", 0.2)).collect().map(_.getLong(0)).toSet
    val kept50 = df.filter(Sampling.keep($"id", 0.5)).collect().map(_.getLong(0)).toSet
    // nested: raising the rate only ADDS rows (threshold grows)
    assert(kept20.subsetOf(kept50))
    // close to the nominal rates
    assert(math.abs(kept20.size / 2000.0 - 0.2) < 0.05)
    assert(math.abs(kept50.size / 2000.0 - 0.5) < 0.05)
    // partitioning-invariant: same selection after repartition
    val kept20b = df.repartition(13).filter(Sampling.keep($"id", 0.2))
      .collect().map(_.getLong(0)).toSet
    assert(kept20b === kept20)
    // the rule is the documented md5-prefix comparison, verifiable by hand
    val md5_0 = java.security.MessageDigest.getInstance("MD5")
      .digest("0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(kept50.contains(0L) === (md5_0.substring(0, 8) < "80000000"))
    // boundary rates
    assert(df.filter(Sampling.keep($"id", 0.0)).isEmpty)
    assert(df.filter(Sampling.keep($"id", 1.0)).count() === 2000)
  }

  test("stratified sampling applies per-stratum rates and the default") {
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.8, "de" -> 0.1), defaultRate = 0.3)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en") / 1000.0 - 0.8) < 0.1)
    assert(math.abs(out("de") / 1000.0 - 0.1) < 0.1)
    assert(math.abs(out("fr") / 1000.0 - 0.3) < 0.1)
    // per-row agreement with the plain keep() predicate per stratum
    val enIds = df.filter($"lang" === "en")
      .filter(Sampling.keep($"id", 0.8)).collect().map(_.getLong(0)).toSet
    val outEn = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.8, "de" -> 0.1), defaultRate = 0.3)
      .filter($"lang" === "en").collect().map(_.getLong(0)).toSet
    assert(outEn === enIds)
  }
}
