package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorExpressions

/** Graph-based approximate nearest neighbors (SURVEY.md §2.C4, the
  * recall/latency frontier above IVFPQ — VERDICT r9 "missing" #2): a
  * navigable-small-world search rendered DETERMINISTIC and therefore
  * oracle-able.
  *
  * True HNSW is construction-order dependent (greedy inserts mutate the
  * graph that routes later inserts), which no cross-engine oracle can
  * pin. This variant removes the order dependence while keeping the
  * search structure the production index exists for:
  *
  *  1. BUILD (sub-quadratic as of round 11): the graph is each vector's
  *     approximate [[M]] nearest neighbors from a deterministic
  *     NN-descent — seed candidates from the IVF cell assignment (each
  *     vector meets the members of its [[PAdj]] nearest seed cells — the
  *     c38 SemDeDup pair-space trick applied to graph construction) plus
  *     a [[RingD]]-wide id-ring (connectivity floor; ids are random wrt
  *     geometry), then [[DescentRounds]] fixed rounds of
  *     neighbors-of-neighbors refinement (Dong et al.'s NN-descent with
  *     the sampling removed: symmetrize, 2-hop expand, keep best M).
  *     Every step is a pure function of the corpus (fixed seed rule,
  *     fixed rounds, total-order tie-breaks), so the built graph — and
  *     therefore the whole search — still carries a DuckDB oracle. The
  *     round-10 exact build (O(n²) distance evaluations, 85.7 s at 20 k
  *     vectors) survives as [[exactAdjacency]] for the
  *     approximation-quality law only; nothing on a query path is
  *     all-pairs anymore.
  *  2. SEARCH: beam search from [[E]] fixed entry points, [[H]] hops
  *     statically unrolled into one declarative plan (the Lloyd's/
  *     pagerank discipline — no driver-side loop). Each hop grows the
  *     beam by its out-neighbors, re-scores, and keeps the best [[B]]
  *     per query under the (dist, cand) total order. Because the old
  *     beam is included in the union before pruning, the beam is
  *     monotone best-so-far — the final beam holds the best B vertices
  *     VISITED anywhere, so hop count only ever improves recall
  *     (law-tested in NswSpec).
  *
  * Scale shape: per hop, one shuffle-hash join of the (qid, cand) beam
  * against the (M+F)-out-degree adjacency list plus one per-query
  * window — n_q·B·(M+F) rows in flight, never n². The search touches at
  * most E + H·B·(M+F) ≈ 4.6k candidate slots per query
  * (8 + 4·48·24 = 4616; distinct vertices visited are well below —
  * beams overlap) regardless of corpus size —
  * the sublinear-probe property that makes graph ANN the serving tier;
  * at 100 TB the adjacency is bucketed by u exactly like the IVF lists
  * by cent_id. Every query here is leave-one-out like the rest of the
  * ANN family and carries a full DuckDB oracle (the same unrolled CTE
  * chain, MATERIALIZED per hop).
  */
object Nsw {
  /** Graph degree. 16 at the fixtures' near-isotropic 64-d embeddings —
    * the hardest graph-search case (no cluster structure to ride);
    * real corpora cluster and reach the same recall at lower degree. */
  val M = 16
  /** Beam width per query (≥ K so the final beam answers top-K). THE
    * recall knob on isotropic data: hops saturate fast (the beam
    * converges to a local optimum and extra hops stop adding vertices —
    * measured 0.687/0.718/0.727/0.729 at H=4/5/6/8 with B=16 at sf0.1),
    * while width buys diversity that escapes those optima
    * (0.687/0.871/0.939 at B=16/32/48, H=4). 48 clears the production
    * bar at every fixture tier; clustered real corpora need less.
    *
    * PER-CORPUS RETUNE DOCTRINE (r11, measured — SCALE_r11.md; the
    * (B, H, F) twin of IVF's C ≈ 4√n rule, ScaleCheck-asserted):
    *  - F = 8 far links ([[farLinks]]) is the NAVIGABILITY FLOOR at
    *    scale. On a clustered 20k corpus the plain M-NN graph
    *    degenerates to per-cluster cliques the beam cannot leave —
    *    recall 0.12 at the declared constants — and F=8 restores 0.939,
    *    clearing the production bar at the UNCHANGED beam budget.
    *  - B scales as B₀·(n/n₀)^0.6 on structure-free corpora (the
    *    diversity knob; exponent fitted to the measured tiers — 0.939
    *    at (2k, 48), 0.905 at (20k, 192); √n undershoots: 0.864 at
    *    B=152). Isotropic 20k decay curve: 0.52 fixed → 0.59 (F=8) →
    *    0.86 (B=152) → 0.905 (B=192) — recall tracks the touch
    *    fraction there by design (the no-free-lunch bounding case the
    *    default fixtures deliberately are). ScaleCheck asserts the
    *    ≥0.9 bar BOTH ways: on the retuned beam over the isotropic
    *    corpus and at the unretuned beam over the clustered one —
    *    structure is worth 4× beam width. */
  val B = 48
  /** Statically unrolled hops. */
  val H = 4
  /** Far (long-range) links per vertex in the DECLARED graph — the
    * Watts–Strogatz rewiring that makes the M-NN neighborhood graph
    * navigable. Declared default as of round 12 (the r11 verdict's one
    * `weak`): on a clustered corpus the plain M-NN graph degenerates to
    * per-cluster cliques the beam cannot leave (recall 0.116 at sf1c)
    * while F=8 restores 0.939 at the UNCHANGED beam budget, and it also
    * helps the isotropic case (0.497 → 0.59 before beam retune). Cost is
    * O(n·F) integer-arithmetic edges — strictly better on both measured
    * corpus shapes, so it ships as part of the declared graph. */
  val F = 8
  /** Fitted beam-growth exponent for the per-corpus retune rule
    * B = B₀·(n/n₀)^BExp on structure-free corpora (SCALE_r11 §3; the
    * doctrine prose rounds it to 0.6 — this fitted value is the ONE
    * constant both the scaladoc rule and the ScaleCheck gate use, so the
    * check and the documented rule cannot drift apart). */
  val BExp = 0.602
  /** Anchor corpus size of the beam-growth rule (the measured 0.939 @
    * B=48 tier the exponent was fitted from). */
  val BAnchorN = 2000L
  /** Doubling depth of the generated step table — the declared MAX
    * SCALE of the beam rule. k=25 puts the last threshold at
    * ⌊2000·2^(25/BExp)⌋ ≈ 6.3·10^15 vectors (≈ 1.6 exabytes of 64-d
    * float embeddings — four orders of magnitude past the 100 TB design
    * point), with beam 48·2^25 ≈ 1.6·10^9 still inside Int range. */
  val BMaxK = 25
  /** The DECLARED beam self-tunes by corpus size (r12): a STEP TABLE of
    * (max n → beam) doubling points that upper-bounds the fitted curve
    * B·(n/[[BAnchorN]])^[[BExp]] within each range. As of r14 the table
    * is GENERATED from the closed form — thresholds ⌊2000·2^(k/BExp)⌋,
    * beams B·2^k for k = 0..[[BMaxK]] (VERDICT r13 item 3: the fitted
    * 7-row table had a loud-fail cliff at 2·10^6 that a 100× scale-up
    * hit deterministically; the generated table pushes the edge past
    * any corpus the 100 TB design point can produce). The float pow
    * runs ONCE at class init through StrictMath (exactly-specified
    * fdlibm, bit-stable across JVMs/platforms) and the resulting
    * INTEGER literals are what both engines evaluate — the generated
    * SQL CASE is built from this same Seq, so a pow at query time can
    * never flip a boundary and fork the hash; NswSpec pins the 7
    * originally-fitted rows as frozen anchors so a generator change
    * cannot silently move the measured tiers. At every graded fixture
    * (n ≤ 2000) the step is the anchor B=48; at the sf1 rehearsal
    * (n=20 000 → 192) the DECLARED config holds the ≥0.9 bar on the
    * isotropic corpus — the production property: search cost grows
    * sublinearly (n^0.6) while recall holds, with no per-corpus hand
    * retune. The step is the STRUCTURE-FREE upper bound; as of r13 the
    * declared beam also reads the corpus SHAPE (see [[tunedB]]:
    * clustered corpora, detected by the IVF top-cell occupancy signal,
    * take step/[[ClusterBeamDiv]] — structure is worth 4× beam width,
    * SCALE_r11 §3). Beyond the last row the rule still fails loudly in
    * BOTH engines — but that edge is now the declared max scale, not a
    * re-fit chore a growing corpus trips over. */
  val BSteps: Seq[(Long, Int)] = (0 to BMaxK).map { k =>
    math.floor(BAnchorN * StrictMath.pow(2.0, k / BExp)).toLong -> (B << k)
  }

  /** Shape-aware beam (r13, VERDICT r12 item 6): the size-keyed step is
    * fitted on STRUCTURE-FREE corpora — the worst case — and measured to
    * over-provision ~4× on clustered ones (sf1c clears the ≥0.9 bar at
    * B=48 where the step says 192; structure is worth 4× beam width,
    * SCALE_r11 §3). The IVF seed assignment the NSW build already owns
    * carries the shape signal: a clustered corpus concentrates cells, so
    * its TOP CELL holds far more than its uniform share. Declared rule,
    * pure integer cross-multiply both engines reproduce exactly:
    *
    *   clustered  ⇔  top_cell_size · C ≥ [[ClusterShareMul]] · n
    *   beam       =   if clustered  max(B, step / [[ClusterBeamDiv]])
    *                  else          step
    *
    * Measured separations (ProbeOcc, this round): isotropic top-share
    * stays near the 1/C uniform share as n grows (sf1: 120·256 = 30 720
    * vs 3n = 60 000 — isotropic) while a clustered corpus holds a
    * constant fraction (sf1c: 329·256 = 84 224 ≥ 60 000 — clustered).
    * At every graded tier BOTH branches yield the anchor B=48 (the step
    * is already 48 and max(48, 48/4) = 48), so declared hashes are
    * unchanged; the rule only bites where the step exceeds the anchor. */
  val ClusterShareMul = 3L
  val ClusterBeamDiv = 4

  /** Top inverted-list size of the seed-cell assignment — the one shape
    * statistic the IVF index already maintains (ann_ivf_stats is its
    * full census). Scalar aggregate; the assignment table is the
    * session-cached index the NSW build consumes anyway. */
  private[graft] def topCellSize(s: SparkSession, d: String): Long =
    Ann.assignments(s, d).groupBy(col("cent_id"))
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).head().getLong(0)

  /** The shape signal censused over the BASE slice only — the beam
    * decision of the base-only graph behind `ann_nsw_topk_upserted`. */
  private[graft] def topCellSizeBase(s: SparkSession, d: String,
      cut: Long): Long =
    Ann.assignmentsBaseAt(s, d, Ann.C, cut).groupBy(col("cent_id"))
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).head().getLong(0)

  /** The size-keyed step alone (no shape signal) — the upper bound the
    * shape rule discounts from. */
  private[graft] def stepB(n: Long): Int =
    BSteps.collectFirst { case (hi, bb) if n <= hi => bb }.getOrElse(
      throw new IllegalArgumentException(
        s"corpus of $n vectors is beyond the beam rule's declared max " +
          s"scale (last threshold ${BSteps.last._1}) — raise BMaxK"))

  /** The beam rule as a pure function of the two integer signals —
    * the ONE definition [[tunedB]] and the build-time meta write share
    * (r13 review: the build was running the occupancy aggregate twice).
    * `topCell` is by-name: at anchor sizes (step == B) both branches
    * give B, so the occupancy scan is never forced there and graded-tier
    * `tunedB` stays metadata-only. */
  private[graft] def beamFrom(n: Long, topCell: => Long): Int = {
    val step = stepB(n)
    if (step > B && topCell * Ann.C >= ClusterShareMul * n)
      math.max(B, step / ClusterBeamDiv)
    else step
  }

  /** The declared beam for this corpus: the [[BSteps]] row for its
    * parquet-footer row count, discounted by [[ClusterBeamDiv]] when the
    * occupancy signal says the corpus is clustered. */
  def tunedB(s: SparkSession, d: String): Int =
    beamFrom(Tables.footerRowCount(s, s"$d/embeddings.parquet"),
      topCellSize(s, d))
  /** Fixed entry points: the E lowest vector ids (the IVF seed rule). */
  val E = 8
  val K = 10
  /** Probed seed cells per vector in the approximate build: candidates
    * from a vector's PAdj nearest IVF cells ≈ PAdj·n/C per vector — the
    * n²·PAdj/C seeding term that replaces the n² exact build, and the
    * term the C ≈ 4√n retune turns into O(n^1.5) at 100 TB. */
  val PAdj = 8
  /** The documented build-time seed retune, as an exact integer rule:
    * C_build = the largest power of two ≤ 4·⌊√n⌋, floored at the
    * declared [[Ann.C]]. At every graded tier (n ≤ 2000: 4·44 = 176 <
    * 256) this IS Ann.C, so declared queries are untouched; at corpus
    * sizes where the fixed-C seeding term n²·PAdj/C outgrows a single
    * machine (measured: 1.25·10⁹ candidate pairs at n = 200k spilled
    * past the rehearsal box's disk), the retune restores O(n^1.5)
    * seed volume — the 100 TB path the PAdj scaladoc has always
    * claimed, now executable. Seeding is construction-time only: the
    * searched artifact stays n·(M+F) edges and the beam rule (which
    * reads the DECLARED Ann.C occupancy census) is unchanged, so a
    * retuned build changes recall only through graph quality —
    * ScaleCheck measures that bar where it applies. */
  def retunedSeedC(n: Long): Int = {
    val r = 4 * math.sqrt(n.toDouble).toLong
    math.max(Ann.C, java.lang.Long.highestOneBit(math.max(1L, r)).toInt)
  }

  /** Hierarchical seed-routing activation rule (VERDICT r16 item 7;
    * SCALE_r16 §3's declared fix for the ~8M tier). Flat routing's
    * n·seedC volume grows as n^1.5 under the 4√n retune: measured fine
    * at the 2M tier (n·4096 ≈ 8·10⁹ scored rows inside the committed
    * sc4096 build) but ~1.3·10¹¹ rows took >2¼ h per pass in the r16
    * capacity autopsy. The threshold is the first retune step PAST the
    * last certified tier: seedC ≥ 8192 ⇔ n ≳ 4.2·10⁶ — every certified
    * tier (≤ 2M, seedC ≤ 4096) stays flat and byte-stable, and the 8M
    * tier (seedC 8192) routes hierarchically via
    * [[graft.ops.Ann.hierProbesOf]] with NO new constants: pCoarse and
    * the final probe count are both the declared [[PAdj]], and
    * [[coarseCFor]] is the same 4√· shape as the seed retune itself.
    * The decision is a pure function of seedC, versioned through the
    * index path's `h<coarseC>` segment, and gated by its own tier
    * recall row before any build relies on it (the ladder doctrine). */
  val HierRoutingMinSeedC = 8192
  def seedRoutingIsHier(seedC: Int): Boolean = seedC >= HierRoutingMinSeedC

  /** Coarse-level size for hierarchical routing: pow2-floored 4√seedC —
    * balances the two per-vector scoring terms (coarseC vs
    * PAdj·seedC/coarseC, e.g. 256 + 256 at seedC=8192 vs 8192 flat). */
  def coarseCFor(seedC: Int): Int = {
    require(seedRoutingIsHier(seedC) && Integer.bitCount(seedC) == 1,
      s"coarseCFor is only defined on the hier rule's range " +
        s"(pow2 seedC ≥ $HierRoutingMinSeedC), got $seedC")
    Integer.highestOneBit((4 * math.sqrt(seedC.toDouble)).toInt)
  }
  /** The retune rule under a CAPACITY CEILING (r15) — **RETIRED as the
    * tier decision in r16**, kept as the pinned pure function its specs
    * anchor. History: r15 introduced it because the 4√n rule's seed
    * pairs (1.56·10⁹ at 632k) exhausted the rehearsal disk — but what
    * hit disk was the pair EXCHANGES (the expansion `distinct()`s and
    * the SortAggregate argmin), all removed in r16: the heap build
    * streams pairs through broadcast joins into map-side bounded heaps
    * and exchanges only ≤ M rows per u. With the disk term gone, the
    * capacity C's own ROUTING term (n·seedC, growing as n³/budget) is
    * what binds, and it was measured wall-clock-infeasible at the 2M
    * tier (seedC=65536: 2¼ h inside the first 1.3·10¹¹-row routing
    * pass, disk flat). The declared tier rule is [[retunedSeedC]]'s
    * 4√n again — it balances the two CPU terms (routing n·C, pairs
    * PAdj·n²/C, both O(n^1.5)). Exact integer arithmetic; pure
    * function of (n, budget). */
  def capacitySeedC(n: Long, budgetPairs: Long): Int = {
    require(n > 0 && budgetPairs > 0, s"bad capacitySeedC($n, $budgetPairs)")
    val retuned = retunedSeedC(n)
    // smallest pow2 C with PAdj·n²/C ≤ budget — CEILING division, so a
    // quotient that floors onto a power of two while the true ratio is
    // fractionally above it still rounds C up and the postcondition
    // PAdj·n²/C ≤ budget holds exactly (BigInt guards Long overflow)
    val needC = {
      val nn = (BigInt(n) * BigInt(n) * PAdj + budgetPairs - 1) / budgetPairs
      require(nn.isValidLong,
        s"capacitySeedC($n, $budgetPairs): required C $nn exceeds Long range")
      if (nn <= 1) 1L else nn.toLong
    }
    val capacity = java.lang.Long.highestOneBit(math.max(1L, needC)) match {
      case p if p >= needC => p
      case p => p << 1
    }
    val c = math.max(retuned.toLong, capacity)
    require(c <= (1L << 30), s"capacity seedC $c exceeds Int range at n=$n")
    c.toInt
  }

  /** Descent rounds for a retuned seeding — DEMOTED to the fixed
    * [[DescentRounds]] (r15, closing VERDICT r14 "what's wrong" item
    * 6). The r14 rule added one NN-descent round per seedC doubling on
    * the theory that thinner per-vector seed coverage (PAdj cells of
    * seedC) starts the graph further from the true M-NN graph. Measured
    * TWICE, it never bound:
    *
    *  - 200k, seedC ratio 4× (r14 grid): 2-round vs 4-round build
    *    searched 0.8550 vs 0.8548 — zero effect;
    *  - 632k, seedC ratio 16× / HALF the 4√n rule's coverage (r15,
    *    `NswBuild 4096:2` + `NswTune 4096:2`): the D=2 build searches
    *    0.9396 at (H=6, B=384) vs the D=6 build's 0.9398 — zero effect
    *    again, at the tier where the compensation carried the most
    *    theoretical load.
    *
    * Two fixed rounds of symmetrize/2-hop/keep-best-M already converge
    * the graph from the cell+ring seeds at every measured thinning, so
    * the extra O(n·(2M)²) rounds (which DOMINATE the capacity-ruled
    * build: the 632k D=6 build paid 6 descent expansions of ~1.5·10⁹
    * candidate rows each) are pure cost. Watch condition: if a future
    * tier misses its recall bar with thin seeding, the `dRounds`
    * diagnostic override re-tests compensation in one cheap A/B before
    * any rule revival. The domain guard stays — the version-path D
    * segment is derived here, and an out-of-domain seedC must fail
    * loudly, not build at a bogus path. */
  def descentRoundsFor(seedC: Int): Int = {
    require(seedC >= Ann.C && Integer.bitCount(seedC) == 1,
      s"seedC=$seedC is not a power-of-two ≥ Ann.C=${Ann.C} — " +
        "descentRoundsFor is only defined on the retune rule's range " +
        "(retunedSeedC emits pow2-floored 4*sqrt(n), clamped to Ann.C)")
    DescentRounds
  }

  /** BSteps row index of the LAST tier certified at the base hop count
    * [[H]]=4 (the 63k row, measured 0.9143). The 200k tier (k=4) is the
    * measured anchor of the hop GROWTH rule below. */
  val HAnchorK = 3
  /** Highest BSteps row the ORACLE's hop chain is unrolled to (~2·10⁶
    * vectors): the all-pairs `npairs` CTE the NSW oracle is built on is
    * O(n²) and declared infeasible long before that, so the unroll
    * bound can never bind a real oracle run — and past it the oracle
    * fails LOUDLY (the beam-table `error()` doctrine), never silently
    * under-hops relative to the engine. */
  val HUnrollK = 6

  /** Size-keyed hop rule (r14): the navigable graph's diameter grows
    * with log n, so a FIXED hop count cannot hold recall at every tier.
    * Measured at the 200k clustered tier (the diagnostic that
    * motivated the rule): H=4 searches at 0.8548 and beam growth alone
    * cannot recover it (0.8970 even at 4× beam), while one extra hop
    * lands 0.9429 at the UNCHANGED declared beam. The declared rule is
    * one extra hop per BSteps row above [[HAnchorK]]:
    *
    *   hops(n) = H + max(0, k(n) − HAnchorK),   k(n) = BSteps row of n
    *
    * Every graded fixture and the 20k/63k rehearsal tiers keep H=4 —
    * declared hashes and certified rows are untouched. Exact integers
    * from the same generated table both engines share; the oracle
    * mirrors the rule by unrolling to [[HUnrollK]] with each extra hop
    * GUARDED by its activation threshold (an inactive hop is an exact
    * identity: it re-ranks an unchanged beam). */
  def stepHops(n: Long): Int = {
    val k = BSteps.indexWhere { case (hi, _) => n <= hi }
    require(k >= 0,
      s"corpus of $n vectors is beyond the beam rule's declared max " +
        s"scale (last threshold ${BSteps.last._1}) — raise BMaxK")
    H + math.max(0, k - HAnchorK)
  }

  /** The declared hop count for this corpus — a pure function of its
    * parquet-footer row count (no corpus scan, unlike the beam's
    * occupancy signal, so it is computed live even on the indexed
    * path). */
  def tunedH(s: SparkSession, d: String): Int =
    stepHops(Tables.footerRowCount(s, s"$d/embeddings.parquet"))
  /** Id-ring half-width: u ↔ (u±δ) mod n, δ ≤ RingD, as extra seed
    * candidates — a connectivity floor (2·RingD geometry-random links)
    * so no vector can start with fewer candidates than M even in a
    * near-empty cell neighborhood. O(n·RingD).
    * PRECONDITION: contiguous vec_ids 0..n−1 (the fixture contract). */
  val RingD = 8
  /** Fixed NN-descent refinement rounds — fixed (not convergence-tested)
    * so the build is a pure function of the data on both engines (the
    * Lloyd's-iteration discipline). Each round is O(n·(2M)²). */
  val DescentRounds = 2

  private val cache = new graft.PersistedCache
  def clearCache(): Unit = cache.clear()

  /** When "false", [[bestM]]'s embedding lookups join by key-partitioned
    * shuffle-hash instead of broadcast — the at-scale branch for
    * corpora past the broadcast ceiling (force-broadcast of the full
    * vector table is ~160 MB at 632k·64-d, ~0.5 GB at 2M, and hits the
    * 1 GB ceiling near 4M vectors — VERDICT r15 item 4, the predicted
    * scale defect #5). Default broadcast: right at every rehearsal
    * tier, and the broadcast is ONE shared relation reused for both
    * endpoint lookups. Same edge set on both branches (same join,
    * different exchange) — spec-asserted like [[Ann.LutBroadcastConf]]. */
  val EmbBroadcastConf = "spark.graft.nsw.embBroadcast"

  /** Session confs REQUIRED wherever a big graph/index build can start
    * — i.e. any session whose [[ensureNswIndex]]/[[adjacency]] call may
    * see a rehearsal-tier (or larger) corpus, not just the dedicated
    * build tools (VERDICT r15 "what's wrong" 5: a long-lived serving
    * session that lazily triggers a build re-hits the defects these
    * confs fix). ONE definition here; `tools.NswBuild` and
    * `tools.ScaleCheck` apply it verbatim, and a deployment must do the
    * same for the construction-time entries —
    * `spark.cleaner.periodicGC.interval` and
    * `spark.driver.maxResultSize` are SparkContext-construction-time
    * settings that cannot be applied after the session exists. The SQL
    * conf (`objectHashAggregate…fallbackThreshold`) is ADDITIONALLY
    * scoped around every build by [[withBuildSqlConfs]] (ADVICE r16),
    * so a lazily-triggered build in a session that never applied this
    * map still gets it; it stays in this map so dedicated build
    * sessions carry it from the start:
    *
    *  - `spark.cleaner.periodicGC.interval=2min`: big-heap builds
    *    almost never trigger driver GC, so the ContextCleaner never
    *    reaps shuffle files of already-dropped stages (each
    *    localCheckpoint barrier strands its upstream) and the disk
    *    fills with dead spill — measured r15 at 632k: 45 GB of stranded
    *    spill vs a ~9 GB live set once the 2min reap was in place.
    *  - `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    *    (default 128): the bounded-heap aggregates ([[bestM]], probe
    *    routing) run under ObjectHashAggregate, which falls back to
    *    SORT-based aggregation once the in-memory map passes this many
    *    GROUPS — at default, any build-tier partial aggregation
    *    degenerates into exactly the big sort the heap form exists to
    *    avoid (measured r16, 2M tier attempt 1: bestM's partial phase
    *    sees ~n·PAdj/partitions ≈ 500k distinct u per partition, blew a
    *    262144 threshold, and local-sorted the whole expansion into
    *    74 GB of spill). 2097152 covers the worst case (every u in one
    *    partition) up to n = 2·10⁶ at ~400 B per primitive-array
    *    [[graft.functions.TopKBuffer]] (M = 16) ≈ 0.8 GB per task —
    *    which is why build sessions must also run with a real driver
    *    heap (`SPARK_DRIVER_MEM=48g`; build.sbt's default 8g fits the
    *    graded tiers, not a rehearsal build). */
  val BuildSessionConfs: Map[String, String] = Map(
    "spark.cleaner.periodicGC.interval" -> "2min",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2097152",
    // r17, measured at the 6.32M tier's first build attempt: bestM's
    // embedding broadcast is ~300 B/vector ≈ 1.9 GB at 6.32M, and in
    // local mode the broadcast build COLLECTS the relation through task
    // results — the default spark.driver.maxResultSize=1g killed stage
    // 23 ("Tasks result size has exceeded maxResultSize") ~9 min in.
    // This is the documented ~4M broadcast ceiling arriving exactly
    // where predicted; on one box the right lever is the result-size
    // cap (one shared in-heap copy, 48 GB build heap carries it), NOT
    // the shuffle branch, whose expansion-with-payload exchange is
    // TB-class at this tier (SCALE_r16 §2's analysis — that branch is
    // for clusters with bucketed/co-partitioned lists). 8g bounds the
    // one-box broadcast path to ~25M vectors, past which a single
    // machine is the wrong deployment anyway. Construction-time conf
    // (scheduler reads it at context creation), like the cleaner
    // interval.
    "spark.driver.maxResultSize" -> "8g")

  /** Seed candidate edges (u, v), u ≠ v, deduped: IVF-cell-local pairs
    * (u meets every member of its PAdj nearest seed cells — one keyed
    * join against the assignment table the IVF tier already maintains)
    * ∪ the id-ring. `seedC` defaults to the declared [[Ann.C]] (every
    * declared query); [[retunedSeedC]] is the at-scale alternative. */
  private[graft] def seedCandidates(s: SparkSession, d: String,
      seedC: Int = Ann.C, baseN: Option[Long] = None): DataFrame = {
    // baseN (r15, VERDICT r14 item 6): restrict the WHOLE build to the
    // first baseN vectors — the base slice the upsert family's frozen
    // serving artifacts are built over. Ids are contiguous 0..n−1
    // (fixture contract), so the slice keeps the ring/far arithmetic
    // exact with nn = baseN. None = the declared full-corpus build.
    // routing plan is a pure function of seedC: flat below the hier
    // threshold (every certified tier — byte-stable), two-stage above
    // it (the ~8M path; same PAdj at both stages, no new constants).
    // The hier branch pays ONE routing pass for BOTH sides of the cell
    // pair join: flat needs separate n·seedC scans for the probe set
    // (probesOf) and the cell membership (assignmentsAt — the argmin
    // assignment), and at a hier tier each scan is the volume the plan
    // exists to avoid. hierProbesOf's pos-0 row IS the hier assignment
    // (argmin within the probed coarse cells; ≡ the flat global argmin
    // when every coarse cell is probed — spec law), so membership
    // derives from the same checkpointed pass that yields the probes.
    val qW = baseN.map(c => col("vec_id") < c)
    val (probes, inv) =
      if (seedRoutingIsHier(seedC)) {
        val hp = Ann.hierProbesOf(s, d, seedC, coarseCFor(seedC), PAdj,
            PAdj, qWhere = qW)
          .select(col("qid"), col("pos"), col("cent_id"))
          .localCheckpoint(true)
        (hp.select(col("qid").as("u"), col("cent_id")),
          hp.where(col("pos") === 0)
            .select(col("cent_id"), col("qid").as("v")))
      } else (
        Ann.probesOf(s, d, Ann.centroidsAt(s, d, seedC), PAdj,
            qWhere = qW)
          .select(col("qid").as("u"), col("cent_id")),
        (baseN match {
          case Some(cut) => Ann.assignmentsBaseAt(s, d, seedC, cut)
          case None => Ann.assignmentsAt(s, d, seedC)
        }).select(col("cent_id"), col("vec_id").as("v")))
    val cell = probes.join(inv.hint("shuffle_hash"), Seq("cent_id"))
      .select(col("u"), col("v"))
    val nDf = Tables.embeddings(s, d)
      .where(baseN.map(c => col("vec_id") < c).getOrElse(lit(true)))
      .agg(count(lit(1)).as("nn"))
    val ring = Tables.embeddings(s, d).select(col("vec_id").as("u"))
      .where(baseN.map(c => col("u") < c).getOrElse(lit(true)))
      .crossJoin(broadcast(nDf))
      .select(col("u"),
        explode(sequence(lit(-RingD), lit(RingD))).as("dlt"), col("nn"))
      .where(col("dlt") =!= 0)
      .select(col("u"), pmod(col("u") + col("dlt"), col("nn")).as("v"))
    // NO distinct(): the multiset is nearly duplicate-free anyway (each
    // v lives in exactly one cell, so a cell pair appears once; only
    // ring ∩ cell overlaps repeat), and the old distinct() was a full
    // hash exchange of the PAdj·n²/C seed volume. bestM's distinct-ids
    // heap absorbs the few duplicates map-side (r16, VERDICT r15 item 5).
    cell.unionByName(ring).where(col("u") =!= col("v"))
  }

  /** Score candidate edges and keep each u's best M under the (dist, v)
    * total order — the one definition of "keep best M" shared by the
    * seed cut and every descent round. Callers may feed a raw candidate
    * MULTISET: the cut is the distinct-ids bounded heap
    * ([[graft.functions.TopKAgg.top_k_distinct_by]]), which keeps at
    * most one entry per (u, v) — and dist is a pure function of the
    * pair, so every duplicate carries the identical (dist, v) and
    * "dedup inside the heap" ≡ "distinct() then top-M" EXACTLY. That
    * equivalence is what let r16 delete the upstream `distinct()`s
    * that hash-exchanged the full n·(2M)²-row expansion every descent
    * round (VERDICT r15 item 5, measured ≈1.5·10⁹ rows/round at 632k);
    * duplicates now die in the map-side partial heaps and the one
    * exchange carries ≤ M rows per u per partition.
    *
    * Execution shape (r15, scale defect #4 of the tier ladder): the
    * candidate multiset is the big side, so it must never be SORTED:
    * the original window form spilled the full volume through
    * UnsafeExternalSorter and ran the rehearsal box out of disk. The
    * embedding lookup is conf-gated ([[EmbBroadcastConf]], r16 —
    * VERDICT r15 item 4): default BROADCAST of the (vec_id, embedding)
    * relation for each endpoint — right while the corpus vectors fit
    * the broadcast ceiling
    * (~632k·64-d ≈ 160 MB; binds near 4M vectors). Past that, set the
    * conf "false" and both lookups become key-partitioned shuffle-hash
    * joins: the expansion exchanges by u then v, the embeddings table
    * builds the hash side, nothing is replicated per executor — the
    * [[Ann.LutBroadcastConf]] precedent. Same join, different
    * exchange; edge set identical either way (spec-asserted). The
    * top-M cut is the bounded-heap aggregate with map-side partial
    * aggregation; same (dist, v) comparator as the window (knn_topk ≡
    * knn_topk_agg precedent), so the selected edge SET — and every
    * declared hash — is unchanged. */
  /** Score candidate (u, v) pairs against the corpus embeddings — the
    * conf-gated lookup half of [[bestM]], reusable on its own so the
    * descent can score each unordered 2-hop pair ONCE (r18). */
  private def scoredPairs(s: SparkSession, d: String,
      cands: DataFrame): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // strict parse, loud failure (ADVICE r16): "FALSE"/"0"/"off" silently
    // taking the broadcast branch is exactly the at-scale failure the
    // conf exists to avoid, so anything but a literal boolean is an error
    val embBroadcast = graft.Tables.strictBoolConf(s, EmbBroadcastConf)
    val side = if (embBroadcast) broadcast(e) else e.hint("shuffle_hash")
    val eu = side.select(col("vec_id").as("u"), col("embedding").as("uv"))
    val ev = side.select(col("vec_id").as("v"), col("embedding").as("vv"))
    cands.join(eu, Seq("u")).join(ev, Seq("v"))
      .select(col("u"), col("v"),
        VectorExpressions.cosine_distance(s, col("uv"), col("vv"))
          .as("dist"))
  }

  /** The best-M cut over a pre-scored (u, v, dist) stream — the heap
    * half of [[bestM]]. */
  private def heapBestM(s: SparkSession, scored: DataFrame): DataFrame =
    scored
      .groupBy(col("u"))
      .agg(graft.functions.TopKAgg.top_k_distinct_by(s,
        col("dist"), col("v"), lit(0), M).as("top"))
      .select(col("u"), explode(col("top")).as("t"))
      .select(col("u"), col("t.id").as("v"))

  private[graft] def bestM(s: SparkSession, d: String, cands: DataFrame): DataFrame =
    heapBestM(s, scoredPairs(s, d, cands))

  /** One NN-descent round: symmetrize, expand to 2-hop neighbors (a
    * neighbor of my neighbor is my candidate), keep each u's best M of
    * old ∪ expanded. Candidate volume ≤ n·(2M)² — linear in n at fixed
    * degree, the property that makes the build sub-quadratic.
    *
    * `sym` keeps its distinct() — it is only 2·n·M rows and deduping it
    * BEFORE the self-join stops mutual edges from multiplying the 2-hop
    * expansion 4×. The expansion itself is NOT distinct()'d anymore
    * (r16, VERDICT r15 item 5): that was a full hash exchange of the
    * ~n·(2M)²-row multiset each round (≈1.5·10⁹ rows at 632k) whose
    * only job was dedup — which bestM's distinct-ids bounded heap now
    * does map-side for free. Identical edge set, one exchange of ≤ M
    * rows per u instead of the expansion. */
  private def descend(s: SparkSession, d: String, g: DataFrame): DataFrame = {
    val sym = g.unionByName(
      g.select(col("v").as("u"), col("u").as("v"))).distinct()
    // Symmetry halving (r18, guide §2.3 "shuffle/score fewer bytes"):
    // the 2-hop expansion is a SYMMETRIC multiset — sym is a symmetric
    // edge set, so for every path x→m→y there is y→m→x, and
    // cosine_distance is bit-exactly symmetric in its arguments (the
    // dot products commute term by term, the two norm factors swap).
    // Scoring only the canonical a.u < b.v half and re-emitting each
    // scored row in both directions through one inline explode (ONE
    // subtree — no recompute) halves the expansion's embedding-lookup
    // joins and cosine kernels, the dominant per-round work. The heap
    // cut is multiplicity- and order-insensitive (distinct-ids mode), so
    // the selected edge set is unchanged. g's own M·n edges are scored
    // separately (they are not symmetric and are 1/(2M) of the volume).
    val hop2Half = sym.as("a").join(sym.as("b"),
        col("a.v") === col("b.u") && col("a.u") < col("b.v"))
      .select(col("a.u").as("u"), col("b.v").as("v"))
    val mirrored = scoredPairs(s, d, hop2Half)
      .select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"),
        col("dist"))
      .select(col("p.u").as("u"), col("p.v").as("v"), col("dist"))
    val scored = mirrored.unionByName(
      scoredPairs(s, d, g.where(col("u") =!= col("v"))))
    heapBestM(s, scored)
  }

  /** (u, v): each vector's approximate M nearest neighbors — the
    * navigable graph, built sub-quadratically (see object scaladoc §1).
    * Session-cached like the IVF assignment table (same artifact class;
    * a deployment would persist it beside the IVF index). Per-round
    * localCheckpoint = the iterative-plan barrier (the Lloyd's/
    * star-contraction discipline). */
  private[graft] def adjacency(s: SparkSession, d: String,
      seedC: Int = Ann.C, baseN: Option[Long] = None,
      dRounds: Option[Int] = None): DataFrame = {
    // dRounds: DIAGNOSTIC override of the descent-round compensation
    // rule (the r14/r15 "measure the rule's effect" ladder rows); the
    // declared rule is always descentRoundsFor(seedC). An overridden
    // build is version-isolated through the path's D segment.
    val rounds = dRounds.getOrElse(descentRoundsFor(seedC))
    cache.getOrBuild(s,
      s"$d#nswAdj@$seedC#D$rounds" + baseN.map(c => s"#b$c").getOrElse("")) {
      withBuildSqlConfs(s) {
        val g0 = bestM(s, d, seedCandidates(s, d, seedC, baseN))
          .localCheckpoint(true)
        (1 to rounds).foldLeft(g0)((g, _) =>
          descend(s, d, g).localCheckpoint(true))
      }
    }
  }

  /** Runtime SQL confs scoped around every eager build, save/restored
    * under [[buildLock]] (reentrant from [[ensureNswIndex]]'s hold).
    *
    * 1. Constraint propagation OFF — two reasons, both r16: (a) with
    * the expansion `distinct()`s gone (VERDICT r15 item 5) the bestM
    * join sits directly on the candidate Union, and Spark 4.1's
    * `UnionBase.rewriteConstraints` crashes (`key not found` in the
    * attribute map) when `InferFiltersFromConstraints` forces
    * constraints on a union whose children share an underlying relation
    * — the Aggregate the old distinct() inserted was masking it; (b)
    * constraints infer nothing useful in these plans (the only
    * predicate is u ≠ v) while the constraint sets themselves grow
    * combinatorially on deep unioned self-joins.
    *
    * 2. `objectHashAggregate.sortBased.fallbackThreshold` raised to the
    * [[BuildSessionConfs]] value — it is a RUNTIME SQL conf (unlike the
    * construction-time cleaner conf), so scoping it here means a
    * long-lived serving session that lazily triggers a rehearsal-tier
    * build gets the raised threshold even though its builder never
    * applied BuildSessionConfs (ADVICE r16: relying on
    * session-construction discipline alone recreated the documented
    * 74 GB sort-fallback spill in exactly that scenario).
    *
    * Both are optimizer/execution-level only — the edge set is
    * untouched; every build call is eager (localCheckpoint(true)), so
    * nothing leaks past the restore. The [[buildLock]] guard
    * serializes the save/mutate/restore against a concurrent build on
    * the same session (ADVICE r16). A concurrent SERVING query planned
    * during the window merely compiles without constraint propagation
    * (and with a bigger hash-fallback budget) — an optimization
    * delta, never a correctness one. */
  private def withBuildSqlConfs[T](s: SparkSession)(f: => T): T =
    buildLock.synchronized {
      val keys = Seq(
        "spark.sql.constraintPropagation.enabled" -> "false",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
          BuildSessionConfs("spark.sql.objectHashAggregate.sortBased.fallbackThreshold"))
      val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
      keys.foreach { case (k, v) => s.conf.set(k, v) }
      try f finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }

  /** The round-10 exact M-NN graph (O(n²) broadcast cross join) — kept
    * ONLY as the reference for the approximation-quality law (NswSpec:
    * the approximate graph must recover ≥90% of the exact edges) and
    * for tuning sweeps. Not reachable from any declared query. */
  private[graft] def exactAdjacency(s: SparkSession, d: String): DataFrame =
    cache.getOrBuild(s, s"$d#nswAdjExact") {
      val e = Tables.repartitioned(Tables.embeddings(s, d), s)
        .select(col("vec_id"), col("embedding"))
      val c = Tables.embeddings(s, d)
        .select(col("vec_id").as("v"), col("embedding").as("vv"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("dist").asc, col("v").asc)
      e.select(col("vec_id").as("u"), col("embedding").as("uv"))
        .join(broadcast(c), col("u") =!= col("v"))
        .select(col("u"), col("v"),
          VectorExpressions.cosine_distance(s, col("uv"), col("vv"))
            .as("dist"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= M)
        .select(col("u"), col("v"))
    }

  /** Deterministic LONG-RANGE links (the Watts–Strogatz small-world
    * augmentation): `far` ring edges per vertex, u → (u + k·n/(far+1))
    * mod n. Vector ids are random with respect to geometry, so ring
    * links are effectively uniform random long links — the rewiring
    * that makes a neighborhood graph navigable. Pure integer arithmetic
    * of (u, k, n) on both engines.
    *
    * PRECONDITION: vec_ids are contiguous 0..n−1 (the fixture contract,
    * FIXTURES.md). With gapped ids the ring formula would emit edges to
    * nonexistent vertices, silently dropped by the downstream inner
    * joins — a gapped corpus must dense-rank its ids first. As of round
    * 12 this IS part of the declared graph: nswTopk searches over
    * adjacency ∪ farLinks(F=8) (see [[F]]). */
  private[graft] def farLinks(s: SparkSession, d: String,
      far: Int, baseN: Option[Long] = None): DataFrame = {
    val nDf = Tables.embeddings(s, d)
      .where(baseN.map(c => col("vec_id") < c).getOrElse(lit(true)))
      .agg(count(lit(1)).as("nn"))
    Tables.embeddings(s, d).select(col("vec_id").as("u"))
      .where(baseN.map(c => col("u") < c).getOrElse(lit(true)))
      .crossJoin(broadcast(nDf))
      .select(col("u"), explode(sequence(lit(1), lit(far))).as("k"),
        col("nn"))
      .select(col("u"),
        pmod(col("u") + expr(s"k * nn DIV ${far + 1}"), col("nn")).as("v"))
      .where(col("v") =!= col("u"))
  }

  /** The searched graph: base adjacency ∪ far links, deduped. The
    * declared (no-override) far-augmented graph is session-cached like
    * the base adjacency — it is rebuilt once, not once per hop. */
  private[graft] def adjacencyWithFar(s: SparkSession, d: String,
      far: Int, adjOverride: Option[DataFrame] = None,
      seedC: Int = Ann.C, baseN: Option[Long] = None,
      dRounds: Option[Int] = None): DataFrame =
    adjOverride match {
      case Some(base) =>
        if (far == 0) base
        else base.unionByName(farLinks(s, d, far, baseN)).distinct()
      case None =>
        if (far == 0) adjacency(s, d, seedC, baseN, dRounds)
        else cache.getOrBuild(s, s"$d#nswAdjFar$far@$seedC" +
            dRounds.map(r => s"#D$r").getOrElse("") +
            baseN.map(c => s"#b$c").getOrElse("")) {
          adjacency(s, d, seedC, baseN, dRounds)
            .unionByName(farLinks(s, d, far, baseN)).distinct()
        }
    }

  /** One beam-search step: grow by out-neighbors (the self-loop row per
    * vertex re-emits the old beam — monotone best-so-far), re-score,
    * keep the best b DISTINCT candidates per query in ONE bounded-heap
    * aggregation.
    *
    * r17 (optimization round, guide §2.3/§2.4): this was
    * `.distinct()` then [[rank]] then `rn <= b` — a full hash exchange
    * of the grown multiset (n_q·B·(M+F) rows) for the dedup plus a
    * second full exchange + two per-partition sorts for the ranking
    * window, EVERY hop. `top_k_distinct_by` (the same heap that already
    * replaced the build path's expansion distinct in r16) does dedup
    * and top-b in the aggregate buffer: dist is a pure function of
    * (qid, cand), so min-per-id ≡ distinct, and the heap's NaN-total
    * (dist, id) comparator is exactly the window's (dist, cand) total
    * order — identical beam, law-held monotonicity, hash-identical
    * results.
    *
    * r18 (guide §2.4): the old-beam union is folded into the grow join
    * as a (u, u) self-loop per vertex — the identical candidate multiset
    * (each beam row re-emitted exactly once, as the union did), but the
    * output is ONE stream that provably keeps the beam's qid hash
    * partitioning through the broadcast joins, so the heap plans as a
    * single COMPLETE aggregation: zero per-hop exchanges (the partial/
    * final split it replaces reduced nothing at beam widths where
    * rows-per-qid-per-partition < b — it double-inserted and
    * round-tripped every candidate through buffer serde). The scoring
    * joins stay broadcast-hash at fixture scale and cent-bucketed at
    * 100 TB; past the adjacency broadcast ceiling the shuffle-hash grow
    * join re-keys the stream and the heap takes its one exchange as
    * before. */
  private def hop(s: SparkSession, d: String, beam: DataFrame,
      b: Int = B, far: Int = 0,
      adjOverride: Option[DataFrame] = None): DataFrame = {
    val adj = adjacencyWithFar(s, d, far, adjOverride)
    // Join-strategy by measured size (r17, guide §3.1): the adjacency is
    // plan-time sized from Catalyst stats (cached relation / parquet
    // footer — no job). Under the session's autoBroadcastJoinThreshold
    // it is broadcast — the beam then crosses ZERO exchanges in the grow
    // join; past the threshold (the 100 TB tier: n·(M+F) edges, e.g.
    // ~768 MB at 2M vectors) the previous shuffle-hash layout is kept
    // verbatim (sort-merge would add two sorts for nothing). The
    // unconditional shuffle_hash hint was paying two per-hop exchanges
    // (beam by cand + adjacency by u, every hop a fresh job) at every
    // tier where the graph fits the broadcast budget.
    val bcThreshold = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      .map(v => scala.util.Try(v.trim.toLong) // bare long, incl. -1 = off
        .getOrElse(org.apache.spark.network.util.JavaUtils
          .byteStringAsBytes(v)))
      .getOrElse(10L << 20) // Spark's own default
    // Catalyst stats are useless here — the cached graph sits behind a
    // localCheckpoint (LogicalRDD: unknown size). But the edge count is
    // known BY CONSTRUCTION: ≤ n·(M+F+2) rows of two longs (+1 absorbs
    // rounding in the ring/far arithmetic, +1 is the self-loop row per
    // vertex added below); 48 B/row prices the built HashedRelation, not
    // the raw payload, so the estimate errs toward shuffle-hash. n comes
    // from the parquet footer — a driver metadata read, no job (the
    // Knn.candidateBlocks precedent).
    // Self-loop fold (r18, guide §2.4): the monotone "old beam ∪ grown"
    // union used to be a physical Union of the qid-partitioned beam with
    // the qid-partitioned grow output — which DESTROYS the recognized
    // partitioning, so the per-hop heap planned a partial/final split
    // with an Exchange between. At beam widths where rows-per-qid-per-
    // partition < b (every fixture tier) the partial heap reduces
    // NOTHING: it double-inserts every candidate, serializes whole
    // buffers, and merges them again post-exchange. Adding one (u, u)
    // self-loop per vertex to the JOIN side makes the grow join itself
    // emit the old beam (exactly one copy per beam row — the same
    // multiset the union produced), so the one qid-partitioned stream
    // flows straight into ONE complete heap aggregation: zero per-hop
    // exchanges, single insertion per candidate, no buffer serde.
    val selfLoops = Tables.embeddings(s, d)
      .select(col("vec_id").as("u"), col("vec_id").as("v"))
    val adjPlus = adj.unionByName(selfLoops)
    val adjBytes = Tables.footerRowCount(s, s"$d/embeddings.parquet") *
      (M + F + 2) * 48L
    val adjSized = // threshold <= 0 = broadcast disabled by the session
      if (bcThreshold > 0 && adjBytes <= bcThreshold) broadcast(adjPlus)
      else adjPlus.hint("shuffle_hash")
    val grown = beam
      .join(adjSized, beam("cand") === adjSized("u"))
      .select(col("qid"), col("v").as("cand"))
      .where(col("cand") =!= col("qid"))
    val q = Tables.embeddings(s, d)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = Tables.embeddings(s, d)
      .select(col("vec_id").as("cand"), col("embedding").as("cv"))
    grown.join(q, "qid").join(c, "cand")
      .select(col("qid"), col("cand"),
        VectorExpressions.cosine_distance(s, col("qv"), col("cv")).as("dist"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.top_k_distinct_by(s,
        col("dist"), col("cand"), lit(0), b).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("cand"))
  }

  /** Score (qid, cand) against the corpus vectors and rank per query
    * under the (dist, cand) total order. */
  private def rank(s: SparkSession, d: String, cands: DataFrame): DataFrame = {
    val q = Tables.embeddings(s, d)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = Tables.embeddings(s, d)
      .select(col("vec_id").as("cand"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("cand").asc)
    cands.join(q, "qid").join(c, "cand")
      .select(col("qid"), col("cand"),
        VectorExpressions.cosine_distance(s, col("qv"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
  }

  private[graft] def nswTopkAt(s: SparkSession, d: String,
      hops: Int, b: Int = B, e: Int = E, far: Int = F,
      adjOverride: Option[DataFrame] = None,
      qOnly: Option[DataFrame] = None): DataFrame = {
    // qOnly (r13 review): restrict the QUERY side to an explicit (qid)
    // set before the search — per-query independence makes the
    // restriction exact, and a caller evaluating a 1/60 sample must not
    // pay 60× the beam work (the Ann.probesOf qOnly twin). Declared
    // queries pass None: leave-one-out over the whole corpus.
    // keyed repartition (r18, guide §2.4 — the Knn.pairs precedent): hash
    // the query side by its future aggregate/window key so EVERY
    // downstream per-qid operator (each hop's bounded-heap cut, the final
    // rank window) sees its ClusteredDistribution already satisfied. The
    // broadcast grow/scoring joins preserve the partitioning, and
    // localCheckpoint carries outputPartitioning through the per-hop
    // barrier (LogicalRDD.fromDataset keeps it), so the whole unrolled
    // search plans ZERO mid-stream exchanges.
    val qsAll = Tables.embeddings(s, d)
      .repartition(Tables.parallelism(s), col("vec_id"))
      .select(col("vec_id").as("qid"))
    val qs = qOnly.map(ids => qsAll.join(
        broadcast(ids.select(col("qid"))), Seq("qid"), "left_semi"))
      .getOrElse(qsAll)
    val entries = Tables.embeddings(s, d).where(col("vec_id") < e)
      .select(col("vec_id").as("cand"))
    val beam0 = qs.crossJoin(broadcast(entries))
      .where(col("cand") =!= col("qid"))
    // per-hop lineage barrier (the Lloyd's/NN-descent discipline, same
    // conf): each hop references the previous beam TWICE (grow join +
    // monotone union), so an unbarriered fold doubles the plan per hop —
    // measured 46–63 s cold at sf0.1 vs ~17 s with the barrier. The
    // materialized beam is tiny (n_q·B rows); results are bit-identical
    // either way.
    val barrier =
      !s.conf.getOption(Ann.IterativeCheckpointConf).contains("false")
    val beamH = (1 to hops).foldLeft(beam0) { (bm, _) =>
      val next = hop(s, d, bm, b, far, adjOverride)
      if (barrier) next.localCheckpoint(true) else next
    }
    rank(s, d, beamH).where(col("rn") <= K)
      .select(col("qid"), col("rn").as("rnk"), col("cand").as("cid"),
        round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  def nswTopk(s: SparkSession, d: String): DataFrame =
    nswTopkAt(s, d, tunedH(s, d), tunedB(s, d))

  def nswRecall(s: SparkSession, d: String): DataFrame =
    Ann.recallOf(s, d, nswTopk(s, d).select(col("qid"), col("cid")))

  // ------------------------------------------- persisted graph (r13)

  /** The NSW graph as a versioned ON-DISK artifact (VERDICT r12 item 1 —
    * the `ensureIndex` pattern the IVF family proved, applied to the one
    * ANN tier that was still session-cached): the declared far-augmented
    * adjacency (base M-NN graph ∪ F ring links, exactly what
    * [[adjacencyWithFar]] searches) is built once, committed atomically
    * (temp dir + one rename + `_BUILT` marker), and every later session
    * pays SEARCH cost only — the build-dominated 20 s the inventory
    * charged per cold NSW query becomes a parquet read. The path is
    * versioned by every constant the graph depends on plus the corpus
    * fingerprint (incl. the beam-rule constants, since the beam decision
    * lives in the meta file), so retuning can never serve a stale graph
    * and in-place fixture regeneration is caught by the fingerprint's
    * size/range/byte-length triple (see `Ann.corpusFingerprint` for its
    * honest limit). Edges are (u, v) longs — parquet
    * round-trips them exactly, so graph-from-disk ≡ graph-recomputed and
    * the DuckDB oracle carries over UNCHANGED (the
    * `ann_ivf_topk_indexed` precedent).
    *
    * UPSERT CONTRACT (stated, like the IVF lifecycle): the graph has no
    * incremental edge-maintenance path — neighbor lists are global
    * properties a single insert can perturb anywhere. A deployment
    * reuses the IVF retrain plumbing: serve the committed version,
    * accumulate arriving vectors in the delta table, and when the delta
    * crosses the retrain trigger (Ann.RetrainNum/RetrainDen of the
    * base) REBUILD the graph from the compacted corpus into a NEW
    * version directory — the same atomic-commit lifecycle, with the
    * rebuild (not an in-place patch) as the declared compaction step.
    * Between retrains, delta vectors are served by the IVF tier (exact
    * within probed lists), which needs no graph. */
  /** 64-bit FNV-1a digest of the WHOLE [[BSteps]] table (every
    * threshold/beam pair), folded into the index path. The r13 path
    * carried only `BSteps.last._2`, so retuning any NON-last row would
    * have changed the live beam rule (and the oracle's CASE) without
    * changing the path — serving a stale persisted beam at that tier
    * (ADVICE r13 item 1). Any edit to any row now moves the path. */
  private[graft] def bStepsDigest: String = {
    val str = BSteps.map { case (hi, bb) => s"$hi:$bb" }.mkString(",")
    val h = str.foldLeft(0xcbf29ce484222325L)((a, c) =>
      (a ^ c.toLong) * 0x100000001b3L)
    f"$h%016x".take(12)
  }

  private def nswIndexPath(s: SparkSession, d: String,
      seedC: Int = Ann.C, dRounds: Option[Int] = None): String = {
    val root = s.conf.getOption(Ann.IndexDirConf)
      .getOrElse("spark-warehouse/graft_ann_index")
    // versioned by EVERY constant the artifact depends on — the graph
    // build constants AND (r13 review finding) the beam-rule constants,
    // since the beam DECISION is committed in the meta file: a beam
    // retune without this would serve a stale persisted beam while the
    // live rule (and the oracle) moved. The beam rule enters as a
    // digest of the FULL step table (r14), not just its last row. A
    // non-default seed retune ([[retunedSeedC]]) is its own version
    // family (`_sc<seedC>`): the declared fixed-C path is byte-stable.
    // a hier-routed seed set is its own version family: the h segment
    // is rule-derived (coarseCFor), so the path stays a pure function
    // of (constants, seedC, corpus) — no new caller-supplied knob
    val sc = if (seedC == Ann.C) ""
      else s"_sc$seedC" +
        (if (seedRoutingIsHier(seedC)) s"h${coarseCFor(seedC)}" else "")
    s"$root/nsw_v3_M${M}_F${F}_P${PAdj}_R${RingD}_" +
      s"D${dRounds.getOrElse(descentRoundsFor(seedC))}_" +
      s"B${B}bs${bStepsDigest}m${ClusterShareMul}d${ClusterBeamDiv}" +
      s"c${Ann.C}$sc" +
      s"_${Ann.corpusFingerprint(s, d)}_${graft.Tables.dirTag(d)}"
  }

  /** The path the CURRENT resolution rule hands a reader — the NSW
    * serving version, protected absolutely by [[IndexGc]]. */
  private[graft] def livePath(s: SparkSession, d: String,
      seedC: Int = Ann.C, dRounds: Option[Int] = None): String =
    nswIndexPath(s, d, seedC, dRounds)

  private val buildLock = new Object

  private[graft] def ensureNswIndex(s: SparkSession, d: String,
      seedC: Int = Ann.C, dRounds: Option[Int] = None): String = {
    import org.apache.hadoop.fs.Path
    val path = nswIndexPath(s, d, seedC, dRounds)
    val marker = new Path(path, "_BUILT")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) buildLock.synchronized {
      if (!fs.exists(marker)) {
        val tmp = new Path(
          IndexGc.buildTmpPath(path))
        adjacencyWithFar(s, d, F, seedC = seedC, dRounds = dRounds)
          .write.mode("overwrite").parquet(s"$tmp/adjacency")
        // the beam decision is INDEX metadata (r13): the shape signal
        // (top seed-cell occupancy) is a property of the corpus the
        // graph was built from, so it is decided once at build time and
        // committed beside the edges — a cold session reads one tiny
        // file instead of re-scanning the corpus for its beam. Signals
        // computed ONCE and the beam derived locally (beamFrom).
        import s.implicits._
        val n = Tables.footerRowCount(s, s"$d/embeddings.parquet")
        val top = topCellSize(s, d)
        Seq((n, top, beamFrom(n, top)))
          .toDF("n", "top_cell_size", "beam")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
        fs.create(new Path(tmp, "_BUILT"), true).close()
        if (!fs.rename(tmp, new Path(path))) {
          fs.delete(tmp, true)
          if (!fs.exists(marker)) throw new IllegalStateException(
            s"NSW index commit failed and no committed index at $path")
        }
      }
    }
    path
  }

  /** The committed on-disk adjacency, bucketed-by-u shaped on a real
    * cluster exactly like the IVF lists by cent_id. */
  private[graft] def storedAdjacency(s: SparkSession, d: String,
      seedC: Int = Ann.C, dRounds: Option[Int] = None): DataFrame =
    s.read.parquet(s"${ensureNswIndex(s, d, seedC, dRounds)}/adjacency")

  /** The committed beam decision (one tiny meta file — see the build
    * comment in [[ensureNswIndex]]). Equals the live [[tunedB]] by
    * construction (both are the same pure integer function of the same
    * corpus; law-tested in NswSpec). */
  private[graft] def storedBeam(s: SparkSession, d: String,
      seedC: Int = Ann.C): Int =
    s.read.parquet(s"${ensureNswIndex(s, d, seedC)}/meta")
      .head().getAs[Int]("beam")

  /** ann_nsw_topk_indexed: identical semantics (and oracle SQL) to
    * ann_nsw_topk, but searching the PERSISTED graph with the PERSISTED
    * beam — a cold session pays E + H·B·(M+F) probe work only, never
    * the NN-descent build or the shape scan. */
  def nswTopkIndexed(s: SparkSession, d: String): DataFrame =
    nswTopkAt(s, d, tunedH(s, d), storedBeam(s, d), E, far = 0,
      adjOverride = Some(storedAdjacency(s, d)))

  private[graft] def nswRecallAt(s: SparkSession, d: String,
      hops: Int, b: Int = B, e: Int = E, far: Int = F,
      adjOverride: Option[DataFrame] = None): DataFrame =
    Ann.recallOf(s, d,
      nswTopkAt(s, d, hops, b, e, far, adjOverride)
        .select(col("qid"), col("cid")))

  /** ann_nsw_topk_upserted (r15, VERDICT r14 item 6): the DELTA-SERVING
    * topology the upsert contract below states in prose, now a graded
    * query. The graph tier has no incremental edge maintenance (neighbor
    * lists are global properties), so between retrains a deployment
    * serves:
    *
    *   search(q) = top-K of ( NSW beam over the BASE-ONLY graph
    *             ∪ IVF probe of the DELTA lists under the frozen
    *               base-trained quantizer )
    *
    * Base graph: the same build chain restricted to the first
    * [[Ann.upsertCut]] vectors (its own beam/hop decisions, keyed to the
    * BASE size and the BASE occupancy census — the signals the serving
    * version was actually built from). Delta side:
    * [[Ann.ivfTopkDelta]] — exact within probed delta lists, so an
    * arriving vector is searchable the moment its list row lands, no
    * graph surgery. The union is re-ranked under the one (dist, cid)
    * total order; overall top-K ⊆ union of the two sides' top-K, so
    * K-deep sides suffice. Queries are the full corpus (delta vectors
    * query too — leave-one-out, like every ANN key). At 100 TB: the
    * base search is the measured sublinear serving trend; the delta
    * term is O(n·P·|delta|/C) and |delta| is retrain-bounded at
    * [[Ann.RetrainNum]]/[[Ann.RetrainDen]] of the base. */
  def nswTopkUpserted(s: SparkSession, d: String): DataFrame = {
    val cut = Ann.upsertCut(s, d)
    val baseAdj = adjacencyWithFar(s, d, F, None, Ann.C, Some(cut))
    val base = nswTopkAt(s, d, stepHops(cut),
      beamFrom(cut, topCellSizeBase(s, d, cut)), E, far = 0,
      adjOverride = Some(baseAdj))
    val delta = Ann.ivfTopkDelta(s, d)
    val cands = base.select(col("qid"), col("cid").as("cand"))
      .unionByName(delta.select(col("qid"), col("cid").as("cand")))
      .distinct()
    rank(s, d, cands).where(col("rn") <= K)
      .select(col("qid"), col("rn").as("rnk"), col("cand").as("cid"),
        round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_nsw_topk" -> (nswTopk _),
    "ann_nsw_recall" -> (nswRecall _),
    "ann_nsw_topk_indexed" -> (nswTopkIndexed _),
    "ann_nsw_topk_upserted" -> (nswTopkUpserted _),
  )

  // ---------------------------------------------------------------- SQL

  /** The identical unrolled chain in DuckDB: the sub-quadratic BUILD
    * mirrored step for step (IVF seed assignment + PAdj probes — the
    * same CTE bodies the certified ann_* oracles use — the id-ring,
    * best-M seed cut, then DescentRounds symmetrize/2-hop/best-M
    * rounds), then per search hop grow → dedup → score → top-B. Every
    * distance is re-read from the shared all-pairs CTE (named npairs:
    * Ann.recallSelect appends its own `pairs`), so every float is the
    * one both engines computed; the oracle may afford the O(n²) npairs
    * table at the graded tiers — the ENGINE never builds it. Each step
    * MATERIALIZED (the inlining lesson — g02/docEdgeSql). Leaves
    * `ranked` (qid, cid, dist, rnk). */
  private def nswCtes: String = nswCtesOver("embeddings", withSeedCents = true)

  /** The same chain over graph-source table `src` (the base slice for
    * the upserted key; queries ALWAYS range over the full `embeddings`).
    * `withSeedCents` = false when the surrounding statement already
    * defines `cents0` (the upsert family's [[Ann.upsertBaseCtes]] does,
    * identically: cells are vec_id < C, inside every legal base). With
    * the defaults this IS the original text, byte for byte — the three
    * certified nsw oracles cannot move. */
  private def nswCtesOver(src: String, withSeedCents: Boolean): String = {
    // one best-M cut: candidates cte -> graph cte
    def bestMCte(name: String, from: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT u, v FROM (
         |    SELECT c.u, c.v, row_number() OVER (PARTITION BY c.u
         |      ORDER BY p.dist ASC, c.v ASC) AS rn
         |    FROM $from c JOIN npairs p ON p.qid = c.u AND p.cid = c.v) z
         |  WHERE rn <= $M)""".stripMargin
    val rounds = (1 to DescentRounds).map { r =>
      s"""asym$r AS MATERIALIZED (
         |  SELECT u, v FROM ag${r - 1}
         |  UNION SELECT v AS u, u AS v FROM ag${r - 1}),
         |acnd$r AS MATERIALIZED (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT u, v FROM ag${r - 1}
         |    UNION ALL
         |    SELECT a.u, b.v FROM asym$r a JOIN asym$r b ON a.v = b.u) x
         |  WHERE u <> v),
         |${bestMCte(s"ag$r", s"acnd$r")}""".stripMargin
    }.mkString(",\n")
    // hop chain unrolled to the HUnrollK row (r14 hop rule): hops ≤ H
    // are unconditional; each later hop's GROW branch is guarded by its
    // activation threshold from the SAME generated BSteps table the
    // engine's stepHops reads — below the threshold the hop re-ranks an
    // unchanged beam (top-B of the top-B: an exact identity), so both
    // engines compute the same hop count at every corpus size.
    val hopsN = H + (HUnrollK - HAnchorK)
    val hops = (1 to hopsN).map { h =>
      val guard = if (h <= H) "" else
        s"\n    WHERE (SELECT n FROM nn1) > ${BSteps(HAnchorK + h - H - 1)._1}"
      s"""g$h AS MATERIALIZED (
         |  SELECT DISTINCT qid, cand FROM (
         |    SELECT qid, cand FROM b${h - 1}
         |    UNION ALL
         |    SELECT b.qid, a.v AS cand
         |    FROM b${h - 1} b JOIN adj a ON b.cand = a.u$guard) u$h
         |  WHERE cand <> qid),
         |s$h AS MATERIALIZED (
         |  SELECT g.qid, g.cand,
         |    row_number() OVER (PARTITION BY g.qid
         |      ORDER BY p.dist ASC, g.cand ASC) AS rn
         |  FROM g$h g JOIN npairs p ON p.qid = g.qid AND p.cid = g.cand),
         |b$h AS MATERIALIZED (SELECT qid, cand FROM s$h
         |  WHERE rn <= (SELECT bt FROM btuned))"""
        .stripMargin
    }.mkString(",\n")
    val seedCents = if (withSeedCents) s"${Ann.seedCentsCte},\n" else ""
    s"""npairs AS MATERIALIZED (${Knn.cosPairs}),
       |$seedCents${Ann.assignProbeCtes("cents0", PAdj, src, src)},
       |nn1 AS (SELECT count(*) AS n FROM $src),
       |bsize AS (
       |  SELECT n, CASE ${Nsw.BSteps.map { case (hi, bb) =>
                  s"WHEN n <= $hi THEN $bb" }.mkString(" ")}
       |  ELSE CAST(error('corpus beyond the beam rule declared max ' ||
       |    'scale (last threshold ${BSteps.last._1}) - raise BMaxK')
       |    AS INTEGER)
       |  END AS bs FROM nn1),
       |occ AS (SELECT max(c) AS topsz FROM (
       |  SELECT cent_id, count(*) AS c FROM assign GROUP BY cent_id) zo),
       |btuned AS (
       |  SELECT CASE WHEN (SELECT topsz FROM occ) * ${Ann.C}
       |      >= $ClusterShareMul * n
       |    THEN GREATEST($B, bs // $ClusterBeamDiv) ELSE bs
       |  END AS bt FROM bsize),
       |aseed AS MATERIALIZED (
       |  SELECT DISTINCT u, v FROM (
       |    SELECT p.qid AS u, a.vec_id AS v
       |    FROM probes p JOIN assign a USING (cent_id)
       |    UNION ALL
       |    SELECT e.vec_id AS u,
       |      ((e.vec_id + dd.d) % nn1.n + nn1.n) % nn1.n AS v
       |    FROM $src e CROSS JOIN nn1
       |      CROSS JOIN (SELECT unnest(range(-$RingD, ${RingD + 1})) AS d) dd
       |    WHERE dd.d <> 0) x
       |  WHERE u <> v),
       |${bestMCte("ag0", "aseed")},
       |$rounds,
       |farl AS (
       |  SELECT u, v FROM (
       |    SELECT e.vec_id AS u,
       |      ((e.vec_id + (kk.k * nn1.n) // ${F + 1}) % nn1.n + nn1.n)
       |        % nn1.n AS v
       |    FROM $src e CROSS JOIN nn1
       |      CROSS JOIN (SELECT unnest(range(1, ${F + 1})) AS k) kk) x
       |  WHERE u <> v),
       |adj AS (SELECT DISTINCT u, v FROM (
       |  SELECT u, v FROM ag$DescentRounds
       |  UNION ALL SELECT u, v FROM farl) zadj),
       |hguard AS (
       |  SELECT CASE WHEN n <= ${BSteps(HUnrollK)._1} THEN 1
       |  ELSE CAST(error('corpus beyond the oracle hop unroll (row ' ||
       |    '$HUnrollK, ${BSteps(HUnrollK)._1} vectors) - raise ' ||
       |    'HUnrollK; the n^2 npairs oracle is infeasible here anyway')
       |    AS INTEGER) END AS okh FROM nn1),
       |b0 AS (
       |  SELECT q.vec_id AS qid, e.vec_id AS cand
       |  FROM embeddings q CROSS JOIN $src e CROSS JOIN hguard
       |  WHERE e.vec_id < $E AND e.vec_id <> q.vec_id
       |    AND hguard.okh = 1),
       |$hops,
       |ranked AS (
       |  SELECT s.qid, s.cand AS cid, p.dist, s.rn AS rnk
       |  FROM s$hopsN s JOIN npairs p ON p.qid = s.qid AND p.cid = s.cand
       |  WHERE s.rn <= $K)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_nsw_topk" ->
      s"""WITH $nswCtes
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM ranked ORDER BY qid, rnk""".stripMargin,
    // the persisted-graph search is bit-identical to the live one (the
    // artifact is (u, v) longs, exact through parquet), so the oracle is
    // the SAME recomputed chain — the ann_ivf_topk_indexed precedent
    "ann_nsw_topk_indexed" ->
      s"""WITH $nswCtes
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM ranked ORDER BY qid, rnk""".stripMargin,
    "ann_nsw_recall" ->
      s"""WITH $nswCtes,
         |${Ann.recallSelect}""".stripMargin,
    // delta serving (r15): upsertBaseCtes carves the base slice, trains
    // the frozen quantizer over it and defines cents0 (≡ seedCentsCte:
    // cells are vec_id < C ⊂ base); the nsw chain then builds/searches
    // over `base` only (queries still range over ALL of embeddings),
    // the delta side routes every query through the trained quantizer
    // into the delta rows only, and the two K-deep sides re-rank under
    // the one (dist, cid) order — the engine's union, mirrored.
    "ann_nsw_topk_upserted" ->
      s"""WITH ${Ann.upsertBaseCtes},
         |${nswCtesOver("base", withSeedCents = false)},
         |${Ann.assignProbeCtes(s"cents${Ann.LloydIters}", Ann.P,
              "embeddings", "embeddings", "d")},
         |dcand AS MATERIALIZED (
         |  SELECT p.qid, a.vec_id AS cid,
         |    1.0 - list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                 CAST(a.embedding AS DOUBLE[])) AS dist
         |  FROM dprobes p
         |  JOIN dassign a ON p.cent_id = a.cent_id
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  WHERE a.vec_id >= (SELECT count(*) FROM base)
         |    AND a.vec_id <> p.qid),
         |dtop AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY dist ASC, cid ASC) AS drn
         |    FROM dcand) z WHERE drn <= $K),
         |uni AS (
         |  SELECT qid, cid FROM ranked
         |  UNION
         |  SELECT qid, cid FROM dtop),
         |fin AS (
         |  SELECT u.qid, u.cid, p.dist,
         |    row_number() OVER (PARTITION BY u.qid
         |      ORDER BY p.dist ASC, u.cid ASC) AS rnk
         |  FROM uni u JOIN npairs p ON p.qid = u.qid AND p.cid = u.cid)
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM fin WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin,
  )
}
