package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster construction: connected components over a
  * candidate-pair edge list by iterative min-label propagation.
  *
  * Near-dup detection (minhash bands, simhash bands, …) emits PAIRS;
  * an actual dedup pipeline needs CLUSTERS (every doc mapped to one
  * canonical representative, here the minimum doc id in its component).
  * Pairs → clusters is transitive closure, which no single SQL operator
  * expresses — this is the one genuinely iterative operator in the
  * engine.
  *
  * Algorithm: every node starts labeled with itself; each round a node
  * takes the minimum of its own label and its ≤2-hop neighbors' labels
  * (the propagation runs over a loop-invariant 2-hop edge closure built
  * once before the loop); stop when the (strictly decreasing) global
  * label sum is unchanged. Each round is one shuffle (join
  * closure⋈labels + groupBy-min with map-side combine), and
  * `localCheckpoint` cuts the growing lineage so round N doesn't replan
  * rounds 1..N-1. Rounds ≈ component diameter / 2 — small for near-dup
  * clusters (dups of a doc are dups of each other).
  * At 100 TB scale the same loop runs with the large-star/small-star
  * optimization (Kiveris et al., "Connected Components in MapReduce"),
  * which bounds rounds to O(log n); plain propagation keeps this
  * implementation a pure composition of joins and aggregations.
  */
object Cluster {

  /** Observability hook (tests/profiling): rounds the CALLING THREAD's
    * last CC call ran (-1 before any) — the O(log n) claim for the star
    * variant is checkable, and a profile can split per-round cost from
    * round count. Thread-local so concurrent queries in one JVM (or
    * interleaved staged builds) cannot misattribute each other's round
    * counts; the CC loops drive all their actions from the calling
    * thread, so the count lands where the call was made. */
  private val rounds = new ThreadLocal[Integer] {
    override def initialValue(): Integer = -1
  }
  def lastRounds: Int = rounds.get()
  def resetRounds(): Unit = rounds.set(-1)

  /** Large-star/small-star alternation (Kiveris et al.): O(log n)
    * rounds instead of O(diameter), the variant that ships at 100 TB
    * where a long-chain component would stall plain propagation.
    *
    *  - large-star: every node links its LARGER neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: every node links its smaller-or-equal neighbors
    *    (and itself) to that minimum.
    *
    * Each half-round is one groupBy-min + one join; iteration stops
    * as soon as the canonical edge set IS a star forest (no leaf is
    * also a root, every leaf has exactly one parent) — the fixed
    * point of the alternation — at which point every component is a
    * star rooted at its minimum id. */
  def connectedComponentsStar(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{min => fmin}
    def canon(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()

    // one star round (large-star then small-star), lazily checkpointed
    // — materialized by the convergence-check action that consumes it.
    // Two rewrites were MEASURED and REJECTED at sf0.1 (r11): dropping
    // large's mid-round distinct (steady 1.5 → 2.4 s — on the near-dup
    // clique graph y re-links to m(x) once per smaller neighbor, so
    // the un-distinct'd large blows up ∝ degree and the saved shuffle
    // costs more downstream) and disabling AQE for the loop (1.5 →
    // 3.4 s — AQE's single-partition coalescing of these tiny shuffles
    // beats the static 32-partition stages it would otherwise run).
    def starRound(ein: DataFrame): DataFrame = {
      // large-star over the symmetric view: m(x) = min of closed
      // neighborhood; larger neighbors y of x re-link to m(x)
      val sym = ein.select(col("u").as("x"), col("v").as("y"))
        .union(ein.select(col("v").as("x"), col("u").as("y")))
      val m = sym.groupBy("x").agg(fmin(col("y")).as("mn"))
        .select(col("x"), least(col("x"), col("mn")).as("m"))
      val large = canon(
        sym.join(m, "x").filter(col("y") > col("x"))
          .select(col("y").as("a"), col("m").as("b")))
        .localCheckpoint(eager = false) // referenced 3x below (m2 + both union arms)
      // small-star over canonical edges (u > v): all of u's smaller
      // neighbors, and u itself, link to m(u) = min neighbor
      val m2 = large.groupBy("u").agg(fmin(col("v")).as("m"))
      canon(
        large.join(m2, "u")
          .select(col("v").as("a"), col("m").as("b"))
          .union(large.join(m2, "u").select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint(eager = false)
    }

    // the input plan is materialized ONCE: both the canonical edge set
    // and the post-convergence singleton recovery read this checkpoint
    // — deriving allNodes from the raw `edges` plan would re-run the
    // whole upstream candidate-pair query (band self-join + DISTINCT)
    // a second time after the loop. Lazy (the connectedComponents
    // cascade rule): the first round's convergence check materializes
    // base → canon → round 1 in ONE job — on local-scale dataflow
    // per-action overhead dominates this loop.
    val base = edges.select(col("a"), col("b")).localCheckpoint(eager = false)
    var e = canon(base).localCheckpoint(eager = false)
    var nRounds = 0
    var converged = false
    while (!converged) {
      nRounds += 1
      rounds.set(nRounds)
      e = starRound(e)
      // STAR-FOREST FIXED-POINT TEST (r11; replaces the edge-set
      // signature compare): a canonical edge set is a fixed point of
      // the alternation iff it is a star forest — the exact shape the
      // label extraction below already assumes (the old sig-compare
      // loop rested on the same fixed-point ⟺ star-forest theorem of
      // Kiveris et al., it just paid an extra full confirmation round
      // plus a pre-loop signature to detect it: 3 driver actions for
      // a 2-round graph where this loop pays 1). Star forest = BOTH
      // of: (1) no leaf u also appears as a root v (no chains), AND
      // (2) every leaf u has exactly ONE parent. Conjunct (2) is NOT
      // implied by (1): on edges {(4,3),(5,3),(4,2),(5,1)} one round
      // yields {(3,1),(3,2),(5,1),(4,2)} — u-set {3,4,5} disjoint
      // from v-set {1,2}, yet node 3 has two parents and the
      // component is not yet merged; a chains-only test stops here
      // and emits duplicate doc_id labels (regression-pinned in
      // OpsSpec). One driver action checks both via the union.
      converged = e.select(col("u"))
        .join(e.select(col("v").as("u")).distinct(), Seq("u"), "left_semi")
        .union(e.groupBy("u").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).select(col("u")))
        .isEmpty
    }
    // converged: stars rooted at component minima; nodes whose only
    // edges were self-loops (dropped by canon) come back as singleton
    // components so the result matches connectedComponents node-for-node
    val members = e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
    val roots = e.select(col("v").as("doc_id"), col("v").as("cluster_id")).distinct()
    val labeled = members.union(roots).distinct()
    val allNodes = base.select(col("a").as("doc_id"))
      .union(base.select(col("b").as("doc_id"))).distinct()
    val singletons = allNodes.join(labeled, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    labeled.union(singletons)
  }

  /** Edge list (cols `a`, `b`) → (doc_id, cluster_id = min reachable id).
    * Nodes are the ids appearing in at least one edge. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // hash-distribute the (checkpointed, loop-invariant) edge list on
    // the join key before materializing it: the union of the two edge
    // directions otherwise inherits the upstream file/shuffle layout,
    // which can be few and skewed partitions — every round's join would
    // re-read that imbalance. (localCheckpoint erases planner-visible
    // partitioning — Scan ExistingRDD reports UnknownPartitioning — so
    // this is a data-layout/balance win, not an exchange-elimination
    // one; the per-round join itself stays shuffle-free on the edge
    // side because the label side is node-cardinality and broadcasts
    // under AQE. At 100 TB, where labels outgrow broadcast, the
    // edge side of the resulting sort-merge join is exchanged per
    // round — that regime is what connectedComponentsStar's bounded
    // round count is for.)
    // checkpoints BEFORE the closure build: `base` is referenced by
    // both union arms (an un-checkpointed upstream plan would execute
    // twice), and sym1 three times below (union arm + both join
    // sides — un-checkpointed, the pair plan executed three times:
    // MEASURED 3.5 s steady vs 2.5 s on the sf0.1 embedding graph).
    // Lazy, like every pre-loop checkpoint here: the initial labelSum
    // action materializes base → sym1 → closure → seed in ONE cascade
    // (each caches as its shuffle completes), where eager checkpoints
    // were separate driver actions — on local-scale dataflow the
    // per-action overhead (AQE stage materialization + job
    // scheduling) dominates this loop, so actions are the budget.
    val base = edges.select(col("a"), col("b")).localCheckpoint(eager = false)
    val sym1 = base
      .union(base.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(eager = false)
    // loop-invariant 2-hop edge closure, built ONCE before the loop:
    // paths of length ≤ 2 (generated a→m→a self-pairs dropped — the
    // self label is carried by the seed's least(a, …) and the hop's
    // union(l); ORIGINAL self-loop edges are kept so a
    // self-loop-only node still surfaces as a singleton component).
    // Each round's single join+aggregate over this closure propagates
    // labels TWO hops, so the per-round driver cost is ONE hop plan +
    // one action instead of r9's two chained hop plans with an inner
    // lazy checkpoint — same reach per materialized round, roughly
    // half the per-round plan/codegen overhead, which is what
    // dominates this loop on local[32]-sized dataflow (per-round cost
    // decomposes as ~0.16 s per hop plan + ~0.12 s per action,
    // MEASURED r7-r9 across the 1/2-hop variants). SCALE NOTE: the
    // closure is |paths ≤ 2| = Σ_v deg(v)² edges in the worst case —
    // near-dup band graphs are unions of near-cliques (a clique's
    // 2-hop closure is itself), so the blowup is benign HERE, but a
    // hub-star topology squares its hub degree: at 100 TB route
    // long-chain or hub-heavy graphs to connectedComponentsStar,
    // whose alternation bounds rounds without materializing paths.
    val sym = sym1
      .union(sym1.select(col("a"), col("b").as("m"))
        .join(sym1.select(col("a").as("m"), col("b")), "m")
        .select(col("a"), col("b"))
        // only GENERATED paths drop their a→m→a self-pairs; original
        // edges keep self-loops, because a self-loop-only node is
        // still a node and must surface as a singleton component
        .filter(col("a") =!= col("b")))
      .distinct()
      .repartition(col("b"))
      .localCheckpoint(eager = false)
    // seed labels with the first TWO propagation hops fused in:
    // lbl₀ = min(self, ≤2-hop neighbors) — computable in the same
    // groupBy that enumerates the nodes (every edge endpoint appears
    // as `a` in some length-1 path of the closure), so the loop
    // starts two hops ahead; diameter-4 components converge in a
    // single loop iteration plus the fixpoint check
    var labels = sym.groupBy(col("a").as("id"))
      .agg(least(min(col("b")), col("a")).as("lbl"))
      .localCheckpoint(eager = false)
    // convergence test: labels only ever decrease (min propagation),
    // so the label sum strictly decreases until fixpoint — summed in
    // DECIMAL(38,0) so extreme node counts cannot wrap a signed long
    // and alias two different rounds to the same value
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum: java.math.BigDecimal = null
    var curSum = labelSum(labels)
    var nRounds = 0
    rounds.set(nRounds)
    // TWO chained hops per MATERIALIZED round over the 2-hop closure
    // — FOUR hops of reach per convergence action, so the 9-hop
    // embedding graph converges in 3 materialized rounds instead of
    // r9's 5. Per-round cost here is dominated by the ACTION (AQE
    // stage materialization + broadcast build + job scheduling), not
    // by hop-plan count (codegen is cached across identically-shaped
    // rounds) — MEASURED on the sf0.1 embedding graph: one 2-hop-
    // closure hop per round kept 5 rounds and ~2.4 s steady, no
    // better than r9's two 1-hop plans (~2.2 s quiet); earlier
    // variants for the record: un-checkpointed inner hop 3.1 s
    // (executed twice — join side + union arm), single-hop rounds
    // 2.8 s, pointer-doubling lbl(x) ← min(lbl(x), lbl(lbl(x)))
    // 3.3 s (its node-cardinality label self-join grew the plan
    // enough to lose). `lastRounds` counts materialized rounds —
    // each is four hops of reach, so diameter ≈ up to 4·rounds + 2
    // (seed). No broadcast hint: locally AQE broadcasts the
    // node-cardinality label side on its own, and at cluster scale —
    // where labels outgrow broadcast — a forced hint would OOM the
    // driver where the planner would have picked sort-merge.
    def hop(l: DataFrame): DataFrame =
      sym.join(l, sym("b") === l("id"))
        .select(sym("a").as("id"), col("lbl"))
        .union(l)
        .groupBy("id").agg(min("lbl").as("lbl"))
    while (curSum != prevSum) {
      prevSum = curSum
      nRounds += 1
      rounds.set(nRounds)
      // TWO chained hops over the 2-hop closure = FOUR hops of reach
      // per materialized round, one convergence action; the inner hop
      // is behind a lazy checkpoint because it is referenced twice
      // (join side + union arm) and would otherwise execute twice.
      // The labelSum action below materializes both checkpoints —
      // one convergence job per round.
      labels = hop(hop(labels).localCheckpoint(eager = false))
        .localCheckpoint(eager = false)
      curSum = labelSum(labels)
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Incremental (delta-edge) cluster maintenance: merge a batch of new
    * candidate pairs into an EXISTING cluster map without recomputing
    * the corpus-wide transitive closure — the daily-ingest story at
    * 100 TB, where yesterday's map is billions of rows and the delta is
    * millions.
    *
    * Correctness rests on component CONTRACTION: every base component
    * is collapsed to its label (which, by the min-label convention, IS
    * the component's minimum doc id), so running CC over the contracted
    * delta graph — nodes are base labels and genuinely-new doc ids —
    * yields exactly the union graph's component minima: the min over a
    * merged set of base components and new docs equals the min over
    * their labels and the new ids, because each label already equals
    * its component's min. Untouched components never enter the loop and
    * keep their labels verbatim.
    *
    * Cost ∝ delta: the iterative loop runs on the contracted graph
    * (edges = delta pairs, nodes ≤ 2·|delta|); the only full-map work
    * is one broadcastable join to re-label the touched components
    * (`relabel` is bounded by the contracted node count, tiny next to
    * the map). Gate-checked against the same recursive-CTE closure
    * oracle as the from-scratch builds — the delta result must be
    * row-identical to full CC on the union graph. */
  /** Assert the min-label convention [[incrementalUpdate]] relies on:
    * every cluster_id must itself appear as a doc_id row of its own
    * cluster (labels are self-labeled member representatives, as
    * [[connectedComponents]] produces). A map violating this — e.g.
    * hand-edited on disk or built by a different CC variant — would
    * make incrementalUpdate relabel silently wrongly; one anti-join
    * count over the (2-column) map fails loudly instead. Callers that
    * ingest a map across a trust boundary (disk, external system) run
    * this; maps produced in-JVM by connectedComponents hold it by
    * construction. */
  def requireMinLabelMap(map: DataFrame): Unit = {
    val labels = map.select(col("cluster_id").as("doc_id"), col("cluster_id"))
    val violations = labels.except(map.select(col("doc_id"), col("cluster_id"))).count()
    require(violations == 0,
      s"cluster map violates the self-labeled-representative invariant for $violations label(s)")
  }

  def incrementalUpdate(baseMap: DataFrame, deltaEdges: DataFrame): DataFrame = {
    // contract: delta endpoints → their base component label (new docs
    // pass through as themselves; precondition: baseMap labels are
    // self-labeled member representatives — see [[requireMinLabelMap]],
    // enforced where a map crosses a trust boundary). Left joins: an
    // endpoint absent from the base map is a first-seen doc.
    val la = baseMap.select(col("doc_id").as("a"), col("cluster_id").as("la"))
    val lb = baseMap.select(col("doc_id").as("b"), col("cluster_id").as("lb"))
    val contracted = deltaEdges.select(col("a"), col("b"))
      .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("a"),
              coalesce(col("lb"), col("b")).as("b"))
    // CC over the (delta-sized) contracted graph
    val cc = connectedComponents(contracted)
      .select(col("doc_id").as("node"), col("cluster_id").as("new_lbl"))
    // split the contracted nodes back out: a node that is some base
    // component's label re-labels that whole component; anything else
    // is a new doc appearing directly in the result
    val relabel = cc.select(col("node").as("cluster_id"), col("new_lbl"))
    val rebased = baseMap.join(relabel, Seq("cluster_id"), "left")
      .select(col("doc_id"),
              coalesce(col("new_lbl"), col("cluster_id")).as("cluster_id"))
    val baseLabels = baseMap.select(col("cluster_id").as("node")).distinct()
    val newDocs = cc.join(baseLabels, Seq("node"), "left_anti")
      .select(col("node").as("doc_id"), col("new_lbl").as("cluster_id"))
    rebased.union(newDocs)
  }
}
