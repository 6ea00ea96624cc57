"""Distributed union-find: iterative smallest-id label propagation.

The reference never needs this (its duplicates are exact-hash groups — a
partition, not a graph); our three detectors emit *edges*, whose transitive
closure defines the clusters. north_rule names the algorithm: iterative
smallest-id label propagation via self-joins.

Each iteration does two monotone steps (labels only ever decrease, so
iterations are idempotent and safe to re-run — the property that makes the
checkpoint/resume story sound):

1. neighbor propagation  l(v) ← min(l(v), min_{(u,v)∈E} l(u))   [join on edges]
2. pointer jumping       l(v) ← min(l(v), l(l(v)))              [join labels]

Step 2 (path halving) makes chain-shaped components (caption-containment
chains A ⊂ B ⊂ C…) converge in O(log diameter) instead of O(diameter).

Fault tolerance at scale: ``localCheckpoint`` every iteration truncates the
lineage that would otherwise grow unboundedly — via
``plans.ckpt.local_checkpoint_fresh_stats``, because a plain checkpoint
carries the checkpointed plan's SIZE ESTIMATE into the new leaf and an
iterated self-join then compounds that estimate multiplicatively per round
until the driver grinds multi-megabit BigInteger products inside every
stats-reading optimizer rule (see plans/ckpt.py for the full mechanism and
measurements). Local checkpoints also live on
executor-local storage — one lost executor at hour 3 of a 100-TB run kills
the job unrecoverably. When a ``catalog`` is passed, every ``ckpt_every``
iterations the label relation is ALSO committed through the Catalog
(reliable storage, atomic _SUCCESS/Iceberg-snapshot semantics) and re-read,
and a fresh ``connected_components`` call RESUMES from the latest committed
iteration: labels are monotone, so re-running a partially-complete iteration
is harmless (SURVEY §4/§7's "checkpoint every k rounds" promise).

Driver-loop overhead is kept to two jobs per iteration (one localCheckpoint
materialization + one convergence probe): the previous label rides along in
the iterated frame, so convergence is a filter on the just-materialized
relation, not a third self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from tbdedup_spark.plans.ckpt import local_checkpoint_fresh_stats


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "image_id",
    max_iter: int = 50,
    catalog=None,
    ckpt_every: int = 4,
    ckpt_table: str = "uf_labels",
    delta_threshold: int = 100_000,
) -> DataFrame:
    """(image_id, cluster_id) with cluster_id = min id in the component.

    ``nodes``: one column ``id_col``. ``edges``: columns a_id, b_id
    (direction irrelevant). Isolated nodes label themselves.
    ``catalog``: optional ``sources.catalog.Catalog`` for durable
    every-``ckpt_every``-iterations label commits + mid-loop resume.
    RESUME IS KEYED BY ``ckpt_table`` ALONE — a committed
    ``{ckpt_table}_iter*`` table is trusted with no check that it came from
    THESE nodes/edges, so two CC invocations sharing a catalog run_id MUST
    use distinct ``ckpt_table`` names or the second silently resumes the
    first's labels (review catch; ``incremental_components`` defaults its
    inner call to ``uf_labels_incr`` for this reason).

    Two iteration regimes (``delta_threshold`` switches them): label
    propagation converges front-loaded — measured on a 600k-node corpus,
    iteration 0 moved 297,137 labels and iterations 1-6 moved 41, 4, 1, 1,
    1, 0, yet each full iteration re-shuffled the complete edge and label
    relations (~3.5 s/iteration for a handful of rows). When the previous
    iteration moved fewer than ``delta_threshold`` labels, the loop switches
    to SEMI-NAIVE (delta) iterations: only changed labels can lower anything
    further (labels are monotone — a neighbor/jump contribution from an
    unchanged label was already applied the round it last changed), so the
    three datalog rules are driven by the broadcast delta —

      Δ-neighbor  edge(u,v), Δl(u)          -> cand(v, l(u))
      Δ-jump-ptr  Δlab(v)=w, l(w)=x         -> cand(v, x)   [v's pointer moved]
      Δ-jump-val  lab(v)=w, Δl(w)=x         -> cand(v, x)   [target's value moved]

    each driven by the broadcast delta (bounded by ``delta_threshold`` rows —
    no shuffle of the full relations; the static-static halves of the rules
    contribute nothing new by the semi-naive argument), followed by one
    least() update join of the candidate mins onto the label relation. The
    candidate relation gets NO broadcast hint: its size is the delta's
    neighborhood, not the delta, so AQE picks broadcast-vs-shuffle from its
    runtime size. Same fixpoint, measured 31.6s -> ~17s on the corpus
    above at 8 cores — and the late-round cost now scales with |Δ|, not
    |V|+|E|, which is what a 10^12-row run spends most iterations on.
    """
    sym = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ACTIVE-SUBGRAPH restriction (r6): only a node with >= 1 edge can ever
    # leave its identity label (every update rule joins through `sym`), so
    # the iterated relation is the edge-endpoint subset of `nodes` —
    # O(min(|V|, 2|E|)) rows per round instead of O(|V|). Isolated nodes
    # rejoin as their own cluster in the final projection below; at web
    # scale, where duplicates are sparse, this is the difference between
    # iterating over the corpus and iterating over the duplicate graph.
    # Identical output by construction (a left-join + coalesce(identity)).
    labels = (
        nodes.select(F.col(id_col).alias("id"))
        .join(
            sym.select(F.col("src").alias("id")).dropDuplicates(["id"]),
            "id",
            "left_semi",
        )
        .select("id", F.col("id").alias("label"))
    )
    start = 0
    if catalog is not None:
        # resume: the latest durable label commit wins (monotone labels make
        # replaying the partial iteration after it idempotent). One catalog
        # listing, not one exists() probe per candidate iteration.
        pre = f"{ckpt_table}_iter"
        committed = sorted(
            it for it in (
                int(t[len(pre):]) for t in catalog.list_tables(pre)
                if t[len(pre):].isdigit()
            )
            if it % ckpt_every == 0 and it <= max_iter
        )
        if committed:
            start = committed[-1]
            labels = catalog.read(f"{ckpt_table}_iter{start:04d}")
    labels = local_checkpoint_fresh_stats(labels)

    moved = None  # unknown -> full iteration (also right after resume)
    delta = None  # (id, label) rows that changed last iteration
    for i in range(start, max_iter):
        if moved is None or moved > delta_threshold:
            # FULL round: min neighbor label, then pointer jumping, over the
            # complete relations (the first round or two does ~all the work)
            nbr_min = (
                sym.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
                .withColumnRenamed("dst", "id")
            )
            stepped = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.col("label").alias("_old"),
                    F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                )
            )
            jumped = (
                stepped.alias("x")
                .join(
                    stepped.select(F.col("id").alias("label"), F.col("label").alias("label2")).alias("y"),
                    "label",
                    "left",
                )
                .select(
                    F.col("id"),
                    F.col("_old"),
                    F.least("label", F.coalesce("label2", "label")).alias("label"),
                )
            )
        else:
            # DELTA round (semi-naive): candidates only from the broadcast
            # delta; everything else is a map-side pass over `labels`.
            d = F.broadcast(delta)
            cand_nbr = sym.join(
                d.select(F.col("id").alias("src"), F.col("label").alias("_dl")), "src"
            ).select(F.col("dst").alias("id"), "_dl")
            # v's pointer moved to w -> lowest known label of w
            cand_ptr = labels.join(
                d.select(F.col("label").alias("id"), F.col("id").alias("_v")), "id"
            ).select(F.col("_v").alias("id"), F.col("label").alias("_dl"))
            # v points at w whose label value just moved
            cand_val = labels.join(
                d.select(F.col("id").alias("label"), F.col("label").alias("_dl")), "label"
            ).select("id", "_dl")
            cand = (
                cand_nbr.unionByName(cand_ptr).unionByName(cand_val)
                .groupBy("id")
                .agg(F.min("_dl").alias("_cand"))
            )
            # NO broadcast hint on cand: the delta itself is bounded by
            # delta_threshold rows, but cand is the delta's NEIGHBORHOOD —
            # one high-degree node entering the delta late can blow it past
            # broadcast/driver limits at 10^12 edges (ADVICE r3). AQE sees
            # cand's true runtime size and picks broadcast vs shuffle itself.
            jumped = labels.join(cand, "id", "left").select(
                "id",
                F.col("label").alias("_old"),
                F.least("label", F.coalesce("_cand", "label")).alias("label"),
            )
        jumped = local_checkpoint_fresh_stats(jumped)
        # convergence probe doubles as the regime selector — a filter over
        # the just-materialized partitions, not a join
        delta = jumped.filter(F.col("label") != F.col("_old")).select("id", "label")
        moved = delta.count()
        labels = jumped.select("id", "label")
        if catalog is not None and (i + 1) % ckpt_every == 0 and moved != 0:
            catalog.write(labels, f"{ckpt_table}_iter{i + 1:04d}")
            labels = catalog.read(f"{ckpt_table}_iter{i + 1:04d}")
        if moved == 0:
            break
    sym.unpersist()
    # re-attach isolated nodes (self-labelled) — see the active-subgraph
    # note above. The label side is endpoint-bounded, so AQE broadcasts it
    # when small; the corpus side is one map-side pass.
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels.withColumnRenamed("label", "_lbl"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("_lbl", F.col("id")).alias("cluster_id"),
        )
    )


def with_representatives(components: DataFrame, id_col: str = "image_id") -> DataFrame:
    """CLUSTERS schema: representative = the smallest-id member = cluster_id
    itself (deterministic refinement of the reference's take-first rule,
    tbdedup/dedup/__init__.py:156-157)."""
    return components.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )


def incremental_components(
    history_labels: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    id_col: str = "image_id",
    broadcast_threshold: int = 5_000_000,
    **cc_kwargs,
) -> DataFrame:
    """Day-2 cluster maintenance: merge a NEW batch (nodes + candidate edges)
    into existing min-label components WITHOUT re-running union-find over
    history's edge set — the cluster-level counterpart of the signature-level
    batch-vs-history tiers in operators/incremental.py, and the loop a
    10^12-row corpus actually runs (yesterday's labels + today's crawl).

    ``history_labels``: (id_col, cluster_id) — a prior connected_components
    output (or catalog read of one). ``new_nodes``: one column ``id_col``,
    ids DISJOINT from history's. ``new_edges``: (a_id, b_id) where endpoints
    may be new ids or history ids (detector candidates of the batch against
    itself and against history).

    Correctness: min-label CC output is a compact certificate of history's
    connectivity — every member points at the min member id, so the history
    graph can be CONTRACTED to one super-node per cluster (named by
    cluster_id, which IS the min member id) with no loss: (a) connectivity
    through a history cluster is preserved by routing batch edges through the
    super-node, and (b) the min id of a merged component equals the min over
    its super-node names and new ids, because each name is already the min
    of its expansion. So union-find runs on the contracted graph only —
    batch-scale, not corpus-scale — and its output relabels history by a
    bounded (old_cluster -> new_cluster) remap join.

    Scale shape: history is never shuffled. It is scanned exactly twice, both
    map-side — once to resolve the batch edges' touched endpoints (inner join
    against the distinct endpoint set, bounded by 2|new_edges|), once for
    the final relabel (left join against the remap; remap rows are nodes
    whose label differs from their id, which only edge endpoints and touched
    super-nodes can be, so it too is endpoint-bounded). The broadcast hints
    on those joins are GUARDED, not forced: the endpoint set is counted
    (cheap — it is localCheckpoint'd and batch-scale) and the hints apply
    only when it fits ``broadcast_threshold``; a huge crawl batch beyond it
    falls back to AQE-decided joins instead of an 8GB-broadcast/driver OOM
    (ADVICE-r3: an unguarded forced broadcast crashes exactly when the
    batch is big; unguarded AQE costs history one wasted shuffle-write pass
    when the initial SMJ plan is only converted after runtime stats — the
    count buys the map-side plan AND the safety valve). The iterative
    part (connected_components) sees |new_nodes| + touched-cluster
    super-nodes. Cost scales with the batch, not the corpus — evidence:
    BENCH/incremental_scale.py (fixed 10k batch vs 1M/4M history: 0.64x
    wall at 4x history); equivalence to a full recompute is checked by
    tests/test_round5e.py (random graphs) and the incremental_cluster_update
    driver query's full-recompute DuckDB oracle.

    Reference analog: the reference re-runs its whole hash->group pass per
    invocation (/root/reference/tbdedup/dedup/__init__.py:100-157); this is
    the resumable-at-scale replacement its own --location-based reruns
    approximate.
    """
    hist = history_labels.select(F.col(id_col).alias("id"), "cluster_id")
    e = new_edges.select("a_id", "b_id")

    # 1. Resolve touched endpoints to their history super-node. The endpoint
    #    set is batch-bounded; one count on the materialized relation decides
    #    the broadcast hint (see docstring) — under the threshold history
    #    never shuffles, over it the joins degrade to AQE-decided shuffle
    #    joins instead of an 8GB-broadcast/driver OOM crash.
    endpoints = (
        e.select(F.col("a_id").alias("id"))
        .unionByName(e.select(F.col("b_id").alias("id")))
        .dropDuplicates(["id"])
    )
    endpoints = local_checkpoint_fresh_stats(endpoints)
    _hint = F.broadcast if endpoints.count() <= broadcast_threshold else (lambda df: df)
    touched = hist.join(_hint(endpoints), "id").select("id", "cluster_id")
    touched = local_checkpoint_fresh_stats(touched)

    # 2. Contract: route each edge endpoint through its super-node name.
    ec = (
        e.join(_hint(touched.withColumnRenamed("id", "a_id")), "a_id", "left")
        .withColumnRenamed("cluster_id", "a_super")
        .join(_hint(touched.withColumnRenamed("id", "b_id")), "b_id", "left")
        .withColumnRenamed("cluster_id", "b_super")
        .select(
            F.coalesce("a_super", "a_id").alias("a_id"),
            F.coalesce("b_super", "b_id").alias("b_id"),
        )
    )
    nodes_c = (
        new_nodes.select(F.col(id_col).alias("id"))
        .unionByName(touched.select(F.col("cluster_id").alias("id")))
        .dropDuplicates(["id"])
    )

    # 3. Union-find on the contracted (batch-scale) graph.
    # distinct checkpoint namespace: a caller forwarding the SAME catalog
    # that the bootstrap full CC used must not cross-resume its labels
    cc_kwargs.setdefault("ckpt_table", "uf_labels_incr")
    merged = connected_components(nodes_c, ec, id_col="id", **cc_kwargs)

    # 4. Re-expand: relabel history through the bounded remap; emit new rows
    #    directly. Identity remaps are dropped so untouched clusters take the
    #    left-join's coalesce fast path. Remap rows can only be contracted-
    #    graph nodes with a non-identity label — i.e. edge endpoints or
    #    touched super-nodes — so the endpoint-count guard covers it too.
    remap = merged.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("_old_cluster"), F.col("cluster_id").alias("_new_cluster")
    )
    hist_out = (
        hist.join(
            _hint(remap),
            hist.cluster_id == F.col("_old_cluster"),
            "left",
        )
        .select(
            F.col("id").alias(id_col),
            F.coalesce("_new_cluster", "cluster_id").alias("cluster_id"),
        )
    )
    new_out = (
        new_nodes.select(F.col(id_col).alias("id"))
        .join(merged.withColumnRenamed("cluster_id", "_c"), "id")
        .select(F.col("id").alias(id_col), F.col("_c").alias("cluster_id"))
    )
    return hist_out.unionByName(new_out)
