package graft

import org.apache.spark.sql.functions._

import graft.ops.Quality

/** Constraint-audit suite (ops.Quality). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("constraint suite: consistent counts, live violation path") {
    val rows = Quality.constraintChecks(spark, sf0001).cache()
    // pass flag is derived from the violation count, never independent
    val inconsistent = rows.where(
      (col("passed") === 1 && col("n_violations") =!= 0) ||
      (col("passed") === 0 && col("n_violations") === 0) ||
      col("n_violations") < 0 ||
      col("n_violations") > col("n_checked")).count()
    assert(inconsistent == 0)
    // the referential/range/nonnull rules hold on the clean fixtures
    val coreFailed = rows
      .where(col("rule") =!= "unique_document_bow" && col("passed") === 0)
      .count()
    assert(coreFailed == 0)
    // ... and the deliberately strict uniqueness rule actually fires,
    // proving the suite can report violations, not only green checks
    val bow = rows.where(col("rule") === "unique_document_bow").head()
    assert(bow.getAs[Int]("passed") == 0 && bow.getAs[Long]("n_violations") > 0,
      bow.toString)
    rows.unpersist()
  }

  test("q03: MAD outliers match an exact in-memory recompute") {
    val rep = Quality.madOutliers(spark, sf0001).collect()
    assert(rep.nonEmpty)
    // exact reference: lower-median rank selection, same tie-breaks
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def lowerMedian(xs: Array[(Double, Long)]): Double = {
      val sorted = xs.sortBy(identity)
      sorted(((sorted.length + 1) / 2) - 1)._1
    }
    rep.foreach { r =>
      val t = r.getAs[String]("event_type")
      val g = ev(t)
      assert(r.getAs[Long]("n") == g.size, t)
      val med = lowerMedian(g.map(x => (x._3, x._2)).toArray)
      assert(math.abs(r.getAs[Double]("median_v") - med) < 1e-6, t)
      val devs = g.map(x => (math.abs(x._3 - med), x._2)).toArray
      val mad = lowerMedian(devs)
      assert(math.abs(r.getAs[Double]("mad_v") - mad) < 1e-6, t)
      val nOut = devs.count(_._1 > Quality.MadFence * mad)
      assert(r.getAs[Long]("n_outliers") == nOut, t)
      // robustness sanity: the fence keeps the overwhelming majority
      assert(nOut < g.size / 10, s"$t flagged $nOut of ${g.size}")
    }
  }

  test("q02: top-20 outliers, monotone |z|, flag consistent with z") {
    val rows = ops.Quality.lengthOutliers(spark, sf0001).collect()
    assert(rows.length == 20)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z")))
    // the report is ordered most-anomalous-first
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, zs.mkString(","))
    // flag agrees with the reported z everywhere except the 6-dp
    // rounding boundary around |z| = 3
    rows.foreach { r =>
      val z = math.abs(r.getAs[Double]("z"))
      val flag = r.getAs[Boolean]("is_outlier")
      if (math.abs(z - 3.0) > 1e-6)
        assert(flag == (z > 3.0), s"z=$z flag=$flag")
    }
  }

  test("q07: seasonal z-scores match an exact in-memory recompute") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = ops.Quality.seasonalOutliers(spark, sf0001)
      .select("hour_start", "n", "m", "z")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 20)
    // |z| is monotone non-increasing down the ranking
    got.map(r => math.abs(r._4)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9)
      case _ =>
    }
    // recompute the profile independently and check each reported row
    val hours = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h")).agg(count(lit(1)).as("n"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
        dayofweek(col("h")).as("dow"), hour(col("h")).as("hod"), col("n"))
      .as[(String, Int, Int, Long)].collect()
    val prof = hours.groupBy(r => (r._2, r._3)).view.mapValues { rs =>
      val m = rs.length.toLong
      val s1 = rs.map(_._4).sum
      val s2 = rs.map(r => r._4 * r._4).sum
      (m, s1, s2)
    }.toMap
    val byHour = hours.map(r => r._1 -> r).toMap
    got.foreach { case (hs, n, m, z) =>
      val r = byHour(hs)
      val (pm, s1, s2) = prof((r._2, r._3))
      assert(pm == m && r._4 == n, hs)
      val expect = (n * pm - s1).toDouble / math.sqrt((pm * s2 - s1 * s1).toDouble)
      assert(math.abs(z - BigDecimal(expect).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, hs)
    }
  }

  test("q04: chi2 matches an exact in-memory recompute; dof consistent") {
    val rep = ops.Quality.chiSquareDrift(spark, sf0001).head()
    import org.apache.spark.sql.functions.col
    val cells = Tables.documents(spark, sf0001)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"), r.getAs[Long]("count")))
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cells.map(_._3).sum
    val sumContrib = cells.map { case (l, src, o) =>
      o * o * 1000000L / (rt(l) * ct(src))
    }.sum
    val expect = (n * (sumContrib - 1000000L)).toDouble / 1000000.0
    val got = rep.getAs[Double]("chi2")
    assert(math.abs(got - expect) < 1e-6, s"$got vs $expect")
    assert(rep.getAs[Long]("dof") ==
      (rt.size - 1L) * (ct.size - 1L))
    // independence statistic is non-negative up to per-cell truncation
    // (each cell truncates at most 1 micro-unit: 100 cells -> >= -1e-4·N)
    assert(got >= -0.5, got.toString)
  }

  test("q08: digit coverage, share conservation, and the constant table") {
    val rows = ops.Quality.benfordAudit(spark, sf0001).collect()
    // every first digit of a positive price is 1..9 and all prices count
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    assert(nTotal == Tables.lineitem(spark, sf0001).count())
    // floor-division shares: sum <= 1e6, off by at most 1 ppm per digit
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum <= 1000000L && obsSum >= 1000000L - 9)
    // the baked-in expectation table is a probability vector in ppm
    assert(ops.Quality.BenfordPpm.map(_._2).sum == 1000000L)
    // dev is exactly obs - exp per row
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))
    }
  }

  test("q09: KS statistic matches an exact in-memory recompute") {
    import spark.implicits._
    val rows = Tables.events(spark, sf0001)
      .select($"event_type",
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(String, Long)].collect()
    val n = rows.length.toLong
    val domain = rows.map(_._2).distinct.sorted
    val cntAll = rows.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val nt = rs.length.toLong
      val cnt = rs.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
      var ct = 0L; var call = 0L; var best = 0L
      domain.foreach { x =>
        ct += cnt.getOrElse(x, 0L)
        call += cntAll.getOrElse(x, 0L)
        val v = math.abs(ct * n - call * nt)
        if (v > best) best = v
      }
      (t, nt, n, best * 1000000L / (nt * n))
    }
    val got = ops.Quality.ksDrift(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // a KS statistic is a probability distance: 0 <= D <= 1
    got.foreach { case (_, _, _, ppm) => assert(ppm >= 0 && ppm <= 1000000L) }
  }

  test("q11: Simpson identities hold — probabilities complement, " +
    "effective categories bounded by actual") {
    val rows = ops.Quality.simpsonDiversity(spark, sf0001).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_categories")
      val sp = r.getAs[Long]("simpson_ppm")
      val gs = r.getAs[Long]("gini_simpson_ppm")
      val eff = r.getAs[Long]("eff_categories_ppm")
      // λ and 1−λ are integer complements by construction
      assert(sp + gs === 1000000L)
      assert(sp >= 0 && sp <= 1000000L)
      // without-replacement inverse Simpson is bounded by k(N−1)/(N−k),
      // which EXCEEDS k slightly (balanced k=5 over N=1000 gives 5.02,
      // not 5.00) — so the honest upper bound uses that expression
      val n = r.getAs[Long]("n_rows")
      val bound = k * (n - 1) * 1000000L / (n - k)
      assert(eff <= bound + 1, s"${r.getString(0)}: eff $eff > bound $bound")
      assert(eff >= 1000000L - 1, s"${r.getString(0)}: eff $eff < 1")
    }
  }

  test("q10: CUSUM peak matches an exact in-memory recompute") {
    import spark.implicits._
    val daily = Tables.events(spark, sf0001)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.date_trunc("day", $"ts"),
          "yyyy-MM-dd").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .as[(String, String, Long)].collect()
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val nd = sorted.length.toLong
      var ck = 0L
      val devs = sorted.zipWithIndex.map { case ((_, day, x), i) =>
        ck += x
        (day, math.abs(nd * ck - (i + 1) * total))
      }
      // earliest-day tie-break: explicit first-match scan
      val best = devs.map(_._2).max
      val firstPeak = devs.find(_._2 == best).get
      (t, nd, total, firstPeak._1, best, best * 1000000L / (nd * total))
    }
    val got = ops.Quality.cusumChangepoint(spark, sf0001)
      .as[(String, Long, Long, String, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("q13 spearman: matches a brute-force tie-averaged-rank recompute " +
    "and is exactly 1 on a self-join") {
    import graft.ops.TextOps
    val lm = TextOps.lmScore(spark, sf0001)
      .select(col("doc_id"), col("score_nano")).as[(Long, Long)]
      .collect().toMap
    val ds = TextOps.dsirWeights(spark, sf0001)
      .select(col("doc_id"), col("score_ppm")).as[(Long, Long)]
      .collect().toMap
    val common = (lm.keySet & ds.keySet).toSeq.sorted
    def ranks2(xs: Seq[Long]): Map[Long, Long] = {
      // doubled tie-averaged ranks: 2*cb + c + 1 per distinct value
      val grouped = xs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cb = 0L
      grouped.map { case (v, c) =>
        val r = 2 * cb + c + 1; cb += c; v -> r
      }.toMap
    }
    val rx = ranks2(common.map(lm))
    val ry = ranks2(common.map(ds))
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(a => BigInt(a) * a).sum
      (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    }
    val expected = BigDecimal(pearson(common.map(d => rx(lm(d))),
        common.map(d => ry(ds(d)))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = ops.Quality.spearmanAudit(spark, sf0001).head()
    assert(row.getAs[Long]("n_docs") == common.length.toLong)
    assert(math.abs(row.getAs[Double]("spearman_rho") - expected) <= 1e-6,
      s"got ${row.getAs[Double]("spearman_rho")}, expected $expected")
    // sanity on the estimator itself: a signal against its own ranks is 1
    val self = pearson(common.map(d => rx(lm(d))), common.map(d => rx(lm(d))))
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("q12 gini: matches the brute-force sorted-rank formula and stays " +
    "in [0, 1e6)") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("n_chars")).as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, xs0) =>
      val xs = xs0.map(_._2).sorted // ranks ascending by length
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) =>
        BigInt(x) * (i + 1) }.sum
      val g = ((BigInt(2) * six - BigInt(n + 1) * sx) * 1000000 /
        (BigInt(n) * sx)).toLong
      lang -> (n, sx, g)
    }
    val got = ops.Quality.giniAudit(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_chars"),
          r.getAs[Long]("gini_ppm"))).toMap
    assert(got === expected)
    got.values.foreach { case (_, _, g) =>
      assert(g >= 0L && g < 1000000L, s"gini out of range: $g")
    }
  }
}
