package graft

import org.apache.spark.sql.functions._
import graft.ops.Pipeline

/** Invariant checks for the corpus-assembly operators (goldens cover the
  * exact values; these assert the semantic contracts that must hold at
  * any scale factor). */
class PipelineSpec extends SparkSpec {

  test("seq_pack: budget respected except for single oversized docs") {
    val out = Pipeline.seqPack(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, fill) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_fill"))
      assert(fill <= Pipeline.PackBudget || fill == n,
        s"over-budget fill $fill for multi-doc sequence (n=$n)")
    }
  }

  test("seq_pack: sequence ids are contiguous from 0 per source and fill " +
    "equals the running token sum of its sequence") {
    val bySrc = Pipeline.seqPack(spark, sf0001).collect()
      .groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      val seqIds = sorted.map(_.getAs[Long]("seq_id"))
      assert(seqIds.head == 0L, s"$src first seq_id ${seqIds.head}")
      seqIds.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1, s"$src seq ids jump $a -> $b")
      case _ => ()
      }
      // within each sequence, fill is the prefix sum of token counts
      sorted.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, seq) =>
        val docs = seq.sortBy(_.getAs[Long]("doc_id"))
        var acc = 0L
        docs.foreach { r =>
          acc += r.getAs[Long]("n_tokens")
          assert(r.getAs[Long]("seq_fill") == acc)
        }
      }
      // greedy minimality: a new sequence only opens on genuine overflow
      sorted.sliding(2).foreach { case Array(prev, next) =>
        if (next.getAs[Long]("seq_id") == prev.getAs[Long]("seq_id") + 1)
          assert(prev.getAs[Long]("seq_fill") + next.getAs[Long]("n_tokens")
            > Pipeline.PackBudget,
            s"$src opened a sequence without overflow at doc " +
              next.getAs[Long]("doc_id"))
      case _ => ()
      }
    }
  }

  test("curate funnel counts are monotone and match the curated set") {
    val f = Pipeline.curateFunnel(spark, sf0001).collect()(0)
    val counts = Seq("n_raw", "n_canonical", "n_len_ok", "n_lang_ok",
      "n_curated").map(f.getAs[Long])
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b, s"funnel not monotone: $counts")
    case _ => ()
    }
    assert(counts.last == Pipeline.curate(spark, sf0001).count())
  }

  test("packStream invariants hold on adversarial synthetic input " +
    "(giant stream, oversized docs, exact-budget fits, singletons)") {
    import spark.implicits._
    val rows =
      (1L to 200L).map(i => (i, "big", if (i % 17 == 0) 1000L else i % 97 + 1)) ++
        Seq((1000L, "single", 50L)) ++
        Seq((2000L, "exact", Pipeline.PackBudget),
          (2001L, "exact", Pipeline.PackBudget))
    val out = Pipeline.packStream(rows.toDF("doc_id", "skey", "n_tokens"))
      .collect()
    assert(out.length == rows.length)
    out.groupBy(_.getAs[String]("skey")).foreach { case (k, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.head.getAs[Long]("seq_id") == 0L)
      var fill = 0L; var seq = 0L
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        if (r eq sorted.head) fill = n
        else if (fill + n <= Pipeline.PackBudget) fill += n
        else { seq += 1L; fill = n }
        assert(r.getAs[Long]("seq_id") == seq, s"$k seq drift at $r")
        assert(r.getAs[Long]("seq_fill") == fill, s"$k fill drift at $r")
      }
    }
    // the exact-budget stream must produce two full, separate sequences
    val exact = out.filter(_.getAs[String]("skey") == "exact")
      .sortBy(_.getAs[Long]("doc_id"))
    assert(exact.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 1L))
    assert(exact.forall(_.getAs[Long]("seq_fill") == Pipeline.PackBudget))
  }

  test("salted pack: sequences never cross a chunk boundary and chunks " +
    "restart their numbering") {
    val out = Pipeline.seqPackSalted(spark, sf0001).collect()
    out.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("chunk")))
      .foreach { case ((src, ch), rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
        assert(sorted.head.getAs[Long]("seq_id") == 0L, s"($src,$ch)")
        assert(sorted.head.getAs[Long]("seq_fill")
          == sorted.head.getAs[Long]("n_tokens"), s"($src,$ch)")
      }
  }

  test("seq_pack plan: exactly one pre-pack shuffle (on the stream key) " +
    "and a map-side linear scan") {
    val plan = Pipeline.seqPack(spark, sf0001)
      .queryExecution.executedPlan.toString
    // data path: repartition-by-source exchange, then MapPartitions; the
    // only other exchange is the final presentation orderBy
    assert(plan.contains("MapPartitions"))
    assert("REPARTITION_BY_COL".r.findAllIn(plan).size == 1, plan)
  }

  test("tfidf plan: single corpus scan feeds tf (df is a window, not a " +
    "second scan+explode)") {
    val plan = Pipeline.tfidfTop(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one explode generator total: the tf branch; the n_docs branch is a
    // count-star-only scan and df comes from a window over tf
    assert("Generate explode".r.findAllIn(plan).size == 1, plan)
  }

  test("incremental dedup: both drop paths fire (corpus hit and in-batch dup)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val batchN = docs.where(col("doc_id") > maxId * 4 / 5).count()
    val kept = Pipeline.dedupIncremental(spark, sf0001)
    assert(kept.count() < batchN, "no batch doc was dropped — key too strict")
    // every kept doc is from the batch
    assert(kept.agg(min("doc_id")).collect()(0).getLong(0) > maxId * 4 / 5)
  }

  test("tfidf: at most 3 terms per doc, scores non-increasing, df sane") {
    val rows = Pipeline.tfidfTop(spark, sf0001).collect()
    val nDocs = rows.map(_.getAs[Long]("doc_id")).distinct.length
    assert(rows.nonEmpty && rows.length <= 3 * nDocs)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rk"))
      assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to byRank.length))
      val scores = byRank.map(_.getAs[Long]("score_scaled"))
      scores.sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"doc $id scores increase: ${scores.toSeq}")
      case _ => ()
      }
      rs.foreach(r => assert(r.getAs[Long]("df") >= 1L))
    }
  }

  test("c42 bm25: ranked top-20, query doc excluded, scores sane") {
    val rows = Pipeline.bm25MoreLikeThis(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // ranks are 1..k and scores non-increasing under them
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to rows.length))
    val scores = rows.map(_.getAs[Long]("score"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"scores increase: ${scores.toSeq}")
      case _ => ()
    }
    // the query document (min doc_id) can never retrieve itself
    val qid = Tables.documents(spark, sf0001)
      .agg(min(col("doc_id"))).head().getLong(0)
    assert(!rows.exists(_.getAs[Long]("doc_id") == qid))
    // every hit count is within the query-term budget and positive
    rows.foreach { r =>
      val h = r.getAs[Long]("n_terms_hit")
      assert(h >= 1L && h <= Pipeline.Bm25QTerms)
      assert(r.getAs[Long]("score") > 0L)
    }
  }

  test("c43 mmr: picks come from the BM25 pool without repeats, round 1 " +
    "is pure relevance, and the greedy objective never increases") {
    val pool = Pipeline.bm25MoreLikeThis(spark, sf0001).collect()
    val sel = Pipeline.mmrRerank(spark, sf0001).collect()
    assert(sel.length == math.min(Pipeline.MmrK, pool.length))
    assert(sel.map(_.getAs[Long]("sel_rank")).toSeq ==
      (1L to sel.length))
    val poolIds = pool.map(_.getAs[Long]("doc_id")).toSet
    val ids = sel.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "repeated pick")
    assert(ids.forall(poolIds), "pick outside the candidate pool")
    // with nothing selected yet, round 1 maximizes relevance alone:
    // the BM25 rank-1 doc at zero similarity penalty
    assert(sel.head.getAs[Long]("doc_id") == pool.head.getAs[Long]("doc_id"))
    assert(sel.head.getAs[Long]("max_sim_pm") == 0L)
    // each round's winning objective bounds the next round's: a later
    // candidate's max-sim only grows as the selected set grows, so the
    // greedy argmax sequence is non-increasing
    val sc = sel.map(_.getAs[Long]("mmr_score"))
    sc.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"objective rose: ${sc.toSeq}")
      case _ => ()
    }
    sel.foreach { r =>
      val s = r.getAs[Long]("max_sim_pm")
      assert(s >= 0L && s <= 1000L, s"sim out of per-mille range: $s")
      assert(r.getAs[Long]("rel_pm") >= 0L &&
        r.getAs[Long]("rel_pm") <= 1000L)
    }
  }

  test("c45 rrf: fused scores are exactly the per-arm contributions, " +
    "ranks stay in pool range, and the order is a strict descent") {
    val rows = Pipeline.rrfFusion(spark, sf0001).collect()
    assert(rows.length == Pipeline.MmrK)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to rows.length))
    def contrib(rnk: java.lang.Long): Long =
      if (rnk == null) 0L else 1000000L / (Pipeline.RrfK + rnk)
    rows.foreach { r =>
      val b = r.getAs[java.lang.Long]("bm25_rnk")
      val v = r.getAs[java.lang.Long]("vec_rnk")
      // provenance: a fused doc must come from at least one arm, with
      // its rank inside that arm's declared pool depth
      assert(b != null || v != null, s"orphan doc ${r.getAs[Long]("doc_id")}")
      Seq(b, v).filter(_ != null).foreach(x =>
        assert(x >= 1L && x <= Pipeline.RrfPool, s"rank $x out of pool"))
      // the fused score is nothing but the sum of the two reciprocal
      // contributions — recomputed here from the rank columns
      assert(r.getAs[Long]("rrf_pm") == contrib(b) + contrib(v),
        s"rrf_pm mismatch on doc ${r.getAs[Long]("doc_id")}")
    }
    val sc = rows.map(_.getAs[Long]("rrf_pm"))
    sc.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"fused order rose: ${sc.toSeq}")
      case _ => ()
    }
  }
}
