"""Connected components over duplicate pairs (LLM-pipeline extension;
no reference equivalent).

Pair-level dedup (LSH + Jaccard verify) yields EDGES; an actual keeper
table needs the transitive closure: if A~B and B~C, then A, B, C are
one duplicate cluster even when A~C was never emitted. This is the
standard label-propagation / BSP connected-components loop (the same
algorithm GraphX and GraphFrames run):

    label(v) <- min(label(v), min over neighbors' labels)

iterated to fixpoint. Two execution paths, picked by measured edge
count: below ``max_driver_edges`` (64k edges ≈ ~1 MB) an exact
driver-side union-find — duplicate-pair graphs are orders smaller than
their corpus, and a BSP round costs a scheduler round-trip that
dominates at that size; above it, the distributed label-propagation
loop. Each BSP iteration is one join + one aggregate —
shuffle volume O(|edges|) per round, rounds = graph diameter (duplicate
clusters are short chains in practice, so a handful). State per round
is the (node, label) frame, persisted; lineage is cut with
localCheckpoint every few rounds so the plan does not grow with the
iteration count (a 20-round loop would otherwise compile a 20-deep
join tree).

Convergence is detected with a driver-side scalar (sum of labels) — a
per-round KB-scale collect, the Spark-idiomatic shape for iterative
algorithms (SURVEY §4: "FedAvg — driver-side algorithm"). The sum trick
requires INTEGER node ids (strings sum to NULL and would fake instant
convergence; fractional float/decimal labels could round to an
unchanged decimal(38,0) sum and stop early), so all other id types are
first mapped to dense surrogate longs via
``monotonically_increasing_id`` and mapped back at the end — the
per-round loop stays join-free either way.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Only INTEGER ids may take the direct sum-convergence path: the scalar
# casts labels to decimal(38,0), so a fractional (float/double/decimal-
# with-scale) label change, e.g. 2.9 -> 2.6, could round to an unchanged
# sum and report convergence prematurely. Non-integer ids go through the
# surrogate-long path instead, which is exact for every id type.
_INTEGER_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})


def _driver_union_find(edges) -> dict:
    """Exact union-find (path-halving + union-by-min) over a collected
    edge list. Returns {node: min reachable node id} — the same label
    contract as the BSP loop. Pure Python; used only below the bounded
    ``max_driver_edges`` threshold."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN so every root IS its component's smallest id
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    node_out: str = "doc_id",
    label_out: str = "cluster_id",
    max_iter: int = 30,
    checkpoint_every: int = 5,
    max_driver_edges: int = 65536,
) -> DataFrame:
    """Min-label propagation over undirected ``(a, b)`` edges. Returns
    one row per node appearing in any pair, labeled with the smallest
    node id reachable from it (the cluster id; lexicographic min for
    string ids). Deterministic. Warns if ``max_iter`` rounds elapse
    without reaching the fixpoint (labels then only partially
    propagated — raise ``max_iter`` for graphs of larger diameter)."""
    # Probe BEFORE any checkpoint (r14): limit(cap+1).collect() runs the
    # pair pipeline exactly once and decides the path AND fetches the
    # data for the fast one — <= cap means "small graph, and these ARE
    # all the edges" (no separate count needed); cap+1 means "large,
    # take the BSP loop". The r13 form eagerly localCheckpoint'ed fwd
    # FIRST and probed the frozen blocks; on the (overwhelmingly
    # common) driver path that paid block materialization plus a second
    # collect job for nothing — only the BSP/surrogate paths have
    # multiple consumers that need frozen blocks, so the checkpoint now
    # happens after the size check, and only large graphs re-execute
    # the pair pipeline once more to freeze it (amortized over the
    # O(diameter) loop rounds that read it).
    fwd_plan = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    node_type = dict(fwd_plan.dtypes)["u"]
    spark = fwd_plan.sparkSession
    _cap = max_driver_edges // 2
    probe = fwd_plan.limit(_cap + 1).collect()
    if len(probe) <= _cap:
        # Driver fast path: duplicate-pair graphs are orders smaller
        # than the corpus that produced them (260 edges at sf0.1), and
        # each BSP round costs a full scheduler round-trip (~0.15 s/job
        # on local[32]) — ~2.2 s of pure overhead for a graph that fits
        # in one collect. Below the bound (64k edges ≈ ~1 MB) an exact
        # union-find on the driver is both faster and identical in
        # output: min-id labels, any orderable id type, no surrogate
        # mapping needed. The same driver-side-when-k-sized shape as
        # the FedAvg/centroid collects (SURVEY §4). Large graphs take
        # the BSP loop below, whose shuffle volume is O(|edges|)/round.
        # Result slices sized to the rows (~64k/slice), not to core
        # count: the default parallelize split scheduled 32 near-empty
        # tasks for a few hundred label rows in every downstream stage.
        labels = _driver_union_find([(r[0], r[1]) for r in probe])
        rows = sorted(labels.items())
        n_slices = max(1, -(-len(rows) // 65536))
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, n_slices),
            schema=f"`{node_out}` {node_type}, `{label_out}` {node_type}",
        )
    # Eager localCheckpoint for the distributed paths: fwd feeds both
    # union branches below (and, on the surrogate path, the mapping
    # build plus two joins) — without freezing it, every consumer
    # re-executes the full upstream pair pipeline (for the dedup chain,
    # the tokenize→shingle→self-join Jaccard plan ran twice; measured
    # 3.5s→1.2s edge setup at sf0.1).
    fwd = fwd_plan.localCheckpoint(eager=True)
    if node_type not in _INTEGER_TYPES:
        # Surrogate-id path: CC over dense longs, then map back and take
        # min ORIGINAL id per cluster so the public label contract
        # (smallest reachable node id) holds for strings too. Two extra
        # one-time shuffles; the per-round loop is untouched.
        # Eager localCheckpoint (not persist): monotonically_increasing_id
        # is nondeterministic under recomputation, and the result's
        # lineage reads `mapping` twice (edge build + final map-back) —
        # the ids must be frozen, not recomputable. fwd is already
        # checkpointed, so this job is edge-count-sized.
        mapping = (
            fwd.select("u")
            .unionByName(fwd.select(F.col("v").alias("u")))
            .distinct()
            .withColumn("nid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        mapped = (
            fwd.join(mapping, "u")
            .select(F.col("nid").alias("u_nid"), "v")
            .join(mapping.select(F.col("u").alias("v"), F.col("nid").alias("v_nid")), "v")
            .select(F.col("u_nid").alias("a"), F.col("v_nid").alias("b"))
        )
        numeric = connected_components(
            mapped, "a", "b", "nid", "label_nid", max_iter,
            checkpoint_every, max_driver_edges,
        )
        out = numeric.join(mapping, "nid").select("u", "label_nid")
        clusters = out.groupBy("label_nid").agg(F.min("u").alias(label_out))
        return out.join(clusters, "label_nid").select(
            F.col("u").alias(node_out), label_out
        )

    # Eager localCheckpoint, not persist: every loop action would
    # otherwise re-OPTIMIZE the full upstream lineage each round.
    # Checkpointing freezes edges into in-memory blocks with an empty
    # plan; the job is edge-count-sized (fwd is already frozen).
    # Size the round loop to the GRAPH, not the session defaults:
    # duplicate-pair graphs are orders smaller than the corpus that
    # produced them (260 edges at sf0.1), and with default partitioning
    # each propagation round pays full task fan-out plus AQE per-stage
    # replanning — ~2.2 s of pure overhead on a 260-edge graph. Small
    # graphs run the whole loop at ~64k edges/partition with AQE off
    # (restored after); big graphs keep the distributed path and AQE
    # skew handling. fwd is frozen, so the count is a block scan.
    n_edges = 2 * fwd.count()  # undirected: both directions, pre-distinct
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    small_graph = n_edges <= 65536
    if small_graph:
        want = max(1, (n_edges + 65535) // 65536)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(want))
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=True)
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    labels = labels.persist()
    # Convergence scalar: labels are monotonically non-increasing per
    # node, so sum(label) is strictly decreasing until the fixpoint —
    # an equal sum between CHECKS is convergence. Summed as
    # decimal(38,0) so huge id spaces (e.g.
    # monotonically_increasing_id's partition-shifted longs) cannot
    # overflow bigint and corrupt the check. Checks run every TWO
    # propagation steps (equal sums over a double step ⟺ neither step
    # changed anything, since the sum is monotone): driver actions are
    # the dominant per-round cost for small label frames, and a check
    # per step would double them.
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    # No initial sum action: the first check compares against None
    # (never equal), saving one driver round-trip on every invocation.
    prev_sum = None
    converged = False
    steps_per_check = 2
    persisted = labels  # last MATERIALIZED label frame (cache anchor)

    try:
        for it in range(max_iter):
            msgs = (
                edges.join(labels.withColumnRenamed("u", "v"), "v")
                .select("u", "label")
            )
            new_labels = (
                labels.unionByName(msgs)
                .groupBy("u")
                .agg(F.min("label").alias("label"))
            )
            if (it + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint(eager=False)
            if (it + 1) % steps_per_check == 0 or it == max_iter - 1:
                new_labels = new_labels.persist()
                new_sum = _label_sum(new_labels)
                persisted.unpersist()
                persisted = labels = new_labels
                if new_sum == prev_sum:
                    converged = True
                    break
                prev_sum = new_sum
            else:
                labels = new_labels  # lazy intermediate; checked next step
    finally:
        if small_graph:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds; labels are only partially propagated (graph diameter "
            "exceeds max_iter). Increase max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    # edges/fwd/mapping are localCheckpoint blocks, not persist() caches:
    # there is no public eager-free API for them; the ContextCleaner GCs
    # the blocks once the frames fall out of scope after return.
    return labels.select(
        F.col("u").alias(node_out), F.col("label").alias(label_out)
    )


def pagerank(
    edges: DataFrame,
    iters: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    checkpoint_every: int = 5,
    tol_units: int | None = None,
    dangling: str = "redistribute",
) -> DataFrame:
    """Weighted PageRank in integer micro-units (damping 0.85,
    rank_0 = 1.0 ≡ 1e9 units) — the general form of t17's fixed-3
    loop, safe for real iteration counts.

    Determinism (the t17 finding, queries/textsim.py): per-edge
    contribution is ``floor(weight * r_int / out_w)`` — one IEEE
    double division then floor, bit-identical across engines and plan
    shapes — and the per-node reduction is a BIGINT sum, order-free.
    No double is ever summed, so results don't depend on partitioning.

    Scale: each iteration is one edges⋈ranks equi-join plus one
    dst-keyed sum — O(|edges|) shuffle per round, the BSP loop shape
    shared with connected_components above. The rank frame is
    localCheckpoint'ed every ``checkpoint_every`` rounds so the
    logical plan stays bounded at long iteration counts (the t16/d8
    lineage lesson: persist caches data but plans still grow per
    round). Bound: weight·r_int < 2^53, i.e. pair multiplicities up
    to ~1e5 at rank mass ≈ |nodes|.

    ``tol_units`` switches to ITERATE-UNTIL-FIXPOINT: stop as soon as
    no node moved more than that many micro-units in a round (``iters``
    becomes the safety cap). The convergence test is an exact integer
    max-|delta| — one 1-row collect per round, the m9/s13 driver-scalar
    shape — so early convergence is deterministic, never epsilon-on-doubles.

    Dangling nodes (ADVICE r9): ranks cover the FULL node set
    (src ∪ dst), and each round the mass sitting on sink nodes (no
    out-edges) is redistributed uniformly — share = dangling_total
    div |nodes|, an exact integer division folded into the damped
    update via a broadcast 1-row cross join (no per-round collect).
    On a graph with no sinks (t17's undirected word graph) the
    dangling aggregate is empty and the update reduces to the plain
    damped sum, so existing results are unchanged. Callers whose graph
    has no sinks BY CONSTRUCTION (undirected graphs: every node's edge
    list is symmetric, so src covers every node) pass
    ``dangling="none"`` to skip the node-set build, its count job, and
    the per-round sink aggregate entirely — with a sink present that
    mode would silently drop the sink's rank row and leak its mass,
    so it is a documented structural precondition, not a tuning knob.

    Returns (node, r_int) — callers scale by 1e-9 for display."""
    if dangling not in ("redistribute", "none"):
        raise ValueError(f"dangling must be 'redistribute' or 'none': {dangling!r}")
    w = (
        F.col(weight_col)
        if weight_col
        else F.lit(1).cast("long")
    )
    # LAZY checkpoint (r12): the edge build (a corpus scan for t17)
    # materializes inside the caller's first action instead of paying
    # a separate construction-time job barrier; every later stage and
    # iteration reads the saved blocks. Plan freezing — the reason the
    # checkpoint exists — is identical either way.
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.alias("weight"),
    ).localCheckpoint(eager=False)
    # outw derives LAZILY from the frozen edge blocks: it is a
    # vocab-sized groupBy over a checkpoint scan, so for SMALL fixed
    # iteration counts re-computing it inside each round's job is
    # cheaper than the extra eager checkpoint job barrier it used to
    # pay at construction (r12 compile trim; the plan stays bounded
    # because its leaf is the checkpoint, not the corpus scan). For
    # MANY rounds that trade inverts — each round's job (plus the
    # per-round dangling anti-join in convergence mode) re-aggregates
    # the full edge checkpoint, O(iters) recompute for one saved
    # barrier — so outw is re-frozen LAZILY when the round count
    # implies reuse beats the barrier (ADVICE r12): the first round's
    # job materializes it as a side effect (no construction-time
    # barrier either way), and rounds 2+ read the saved vocab-sized
    # blocks.
    outw = e.groupBy("src").agg(F.sum("weight").alias("out_w"))
    many_rounds = tol_units is not None or iters > 4
    if many_rounds:
        outw = outw.localCheckpoint(eager=False)
    if dangling == "redistribute":
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        ).localCheckpoint(eager=True)
        n_nodes = nodes.count()
    else:
        # sink-free precondition: src reaches every node
        nodes = outw.select(F.col("src").alias("node"))
        n_nodes = None
    ranks = nodes.select(
        "node", F.lit(1_000_000_000).cast("long").alias("r_int")
    )
    prev = ranks
    # loop expressions as server-parsed text (r12 compile trim; same
    # Catalyst expressions as the Column-API form they replace: floor
    # on DOUBLE returns BIGINT, 0.85D is the double literal F.lit(0.85)
    # built, long/double division promotes identically)
    contrib_x = (
        "CAST(sum(floor(CAST(weight * r_int AS DOUBLE) / out_w)) "
        "AS BIGINT) AS x"
    )
    for i in range(iters):
        contrib = (
            e.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.expr(contrib_x))
        )
        inbound_txt = "CAST(coalesce(x, 0L) AS DOUBLE)"
        updated = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if dangling == "redistribute":
            # mass parked on sink nodes this round, spread as an exact
            # integer per-node share (empty aggregate -> 0 on sink-free
            # graphs); 1-row frame, broadcast into the update
            dangling_share = (
                ranks.join(outw, ranks.node == outw.src, "left_anti")
                .agg(
                    F.expr(
                        f"coalesce(sum(r_int), 0L) DIV {int(n_nodes)}L"
                    ).alias("dang")
                )
            )
            updated = updated.crossJoin(F.broadcast(dangling_share))
            inbound_txt = "CAST(coalesce(x, 0L) + dang AS DOUBLE)"
        ranks = updated.select(
            F.col("node"),
            F.expr(
                "CAST(150000000 AS BIGINT) + floor(0.85D * "
                f"{inbound_txt}) AS r_int"
            ),
        )
        if tol_units is not None or (
            (i + 1) % checkpoint_every == 0 and i + 1 < iters
        ):
            # convergence mode needs the frame materialized anyway for
            # the delta aggregate, so checkpoint every round there
            ranks = ranks.localCheckpoint(eager=True)
        if tol_units is not None:
            # fixpoint early-exit (the connected_components pattern):
            # one 1-row max(|delta|) collect per round — integer units,
            # so the test is exact, not epsilon-on-doubles
            delta = (
                ranks.join(
                    prev.withColumnsRenamed({"r_int": "prev_r"}), "node"
                )
                .agg(
                    F.max(F.abs(F.col("r_int") - F.col("prev_r"))).alias(
                        "d"
                    )
                )
                .collect()[0]["d"]
            )
            if delta is not None and delta <= tol_units:
                break
            prev = ranks
    return ranks


def orient_by_degree(und: DataFrame) -> DataFrame:
    """Orient an undirected edge list (u, v) by TOTAL (degree, id)
    rank: each edge points from the lower-ranked to the higher-ranked
    endpoint, carrying both endpoints' degrees. This is the
    'compact-forward' preparation step for triangle counting: wedges
    are enumerated at each edge's SOURCE (the lower-degree corner), so
    per-node wedge work is out-degree², and the degree ordering bounds
    every out-degree by sqrt(2m) — total wedge work O(m^1.5) on ANY
    degree distribution, where plain id-ordering degrades to
    O(Σ deg²) = O(n·max_deg²) the moment a hub gets a small id
    (r9 verdict item 8's skew question). Degrees come from one
    aggregate; the struct(deg, id) comparison is Spark's native
    lexicographic struct ordering, so no dense-rank window (which
    would be a single-partition sort at 100 TB) is ever built."""
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v")
    )
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    return e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )


def wedge_count(und: DataFrame, orientation: str = "degree"):
    """Number of wedges the triangle join would enumerate under the
    given orientation ('degree' = orient_by_degree, 'id' = low-id ->
    high-id). Σ C(out_deg, 2) — the probe/test surface for the skew
    claim; not part of any query plan."""
    if orientation == "degree":
        out = orient_by_degree(und).groupBy("a").agg(
            F.count(F.lit(1)).alias("d")
        )
    else:
        out = und.groupBy(F.col("u").alias("a")).agg(
            F.count(F.lit(1)).alias("d")
        )
    row = out.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("w")
    ).collect()[0]
    return int(row["w"] or 0)


def triangles_per_node(und: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected edge list
    (u, v), one row per edge, u != v, each edge listed once in either
    direction. Compact-forward enumeration: wedges fan out of each
    edge's lower-(degree, id) endpoint and are closed by one
    edge-existence semi-join, so every triangle materializes exactly
    once and the wedge volume is O(m^1.5) regardless of skew (see
    orient_by_degree). Returns (node, n_triangles)."""
    o = orient_by_degree(und).localCheckpoint(eager=True)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tris = (
        e1.join(
            e2,
            (F.col("e1.a") == F.col("e2.a"))
            & (
                F.struct(F.col("e1.db"), F.col("e1.b"))
                < F.struct(F.col("e2.db"), F.col("e2.b"))
            ),
        )
        .join(
            e3,
            (F.col("e1.b") == F.col("e3.a"))
            & (F.col("e2.b") == F.col("e3.b")),
            "left_semi",
        )
        .select(
            F.col("e1.a").alias("na"),
            F.col("e1.b").alias("nb"),
            F.col("e2.b").alias("nc"),
        )
    )
    return (
        tris.selectExpr("na AS node")
        .unionAll(tris.selectExpr("nb AS node"))
        .unionAll(tris.selectExpr("nc AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
