"""Stage D(i) — connected components over the linking edge list.

Distributed min-label propagation ("hash-to-min") with iterative joins:
every node repeatedly adopts the smallest component label among itself and
its neighbors; convergence when no label changes. Labels are the norm
strings themselves (total lexicographic order), so the component id is the
lexicographically smallest member — fully deterministic, no
monotonically_increasing_id anywhere.

Reference equivalent: the driver-side DFS at app.py:3185-3211 — verified
equal by tests/test_components.py against a Python DFS oracle.

Scale notes:
* iterations = O(component diameter); linking components are alias
  groups/similarity cliques with tiny diameters (≤ ~6), so the loop
  terminates in a handful of rounds even at 10^12-turn vocabularies.
  When a pathological graph (long chains) blows past the iteration budget,
  ``algorithm="auto"`` (default) falls back to the O(log n)-round
  large-star/small-star variant (:func:`connected_components_star`,
  Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  behind the same nodes+edges -> labels contract.
* each round is a shuffle on node id; hub nodes (e.g. "polymer") are heavy
  keys — the min() aggregation does map-side partial aggregation (Spark
  hash-aggregate), which is exactly the salting this agg needs, and AQE
  skew handling covers the join side.
* localCheckpoint() every round truncates the lineage so the plan doesn't
  grow exponentially across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.localrel import local_df


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = 25,
    local_threshold: int = 200_000,
    local_edge_threshold: int = 2_000_000,
    salt_partitions: int = 8,
    algorithm: str = "auto",
    hash_to_min_budget: int = 8,
) -> DataFrame:
    """Compute components.

    Args:
        nodes: one ``norm`` column — the node universe (singletons included).
        edges: ``src``/``dst`` string columns, undirected, deduped.
        local_threshold: node-count cutoff below which the graph is collected
            and solved driver-side (a vocabulary graph far smaller than the
            corpus is a broadcast-scale dimension — collecting it is the same
            judgement call as broadcasting the canonical map; the iterative
            path takes over beyond the cutoff and is what the 10^12-turn case
            runs). Pass 0 to force the distributed path (tests do).
        local_edge_threshold: edge-count cutoff guarding the same driver
            path — a ≤200k-node graph with a dense gated similarity edge
            set (hub vocabulary, low thresholds) could still collect tens
            of millions of edge rows; when EITHER bound trips, the
            distributed path runs.
        algorithm: "auto" (hash-to-min, falling back to large/small-star
            after ``hash_to_min_budget`` non-converged rounds — O(diameter)
            for the common tiny-diameter alias graphs, O(log n) worst case),
            "hash_to_min" (no fallback; raises past max_iterations), or
            "star" (large/small-star from the start).

    Returns:
        DataFrame (norm, component) where component = lexicographic min of
        the node's component.
    """
    spark = nodes.sparkSession
    if local_threshold > 0:
        # ONE bounded limit-collect per input doubles as the size gate AND
        # the driver-path data (was: checkpoint + limit-count + full
        # collect per input — four extra jobs). The collects are bounded
        # by the thresholds (+1 row), so driver memory stays capped even
        # when the gate says "too big" and the distributed path runs.
        node_rows = nodes.limit(local_threshold + 1).collect()
        if len(node_rows) <= local_threshold:
            edge_rows = edges.limit(local_edge_threshold + 1).collect()
            if len(edge_rows) <= local_edge_threshold:
                mapping = _local_components(
                    [r[0] for r in node_rows],
                    [(r[0], r[1]) for r in edge_rows],
                )
                return local_df(
                    spark,
                    sorted(mapping.items()),
                    "norm string, component string",
                )
    # Distributed paths: materialize inputs once — the iterative rounds
    # otherwise re-execute the full upstream DAG (TF-IDF similarity join
    # included) per consumption. (The driver path above deliberately skips
    # this: its single collect per input is the only consumption, and the
    # pipeline already hands it checkpointed linking tables.)
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    if algorithm == "star":
        return _star_labels(nodes, edges, max_rounds=max_iterations)
    # Materialize the edge list once: without this every iteration would
    # re-execute the full upstream DAG (TF-IDF similarity join included).
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    # neighbor lists never materialize; we only ever join (node -> label)
    labels = nodes.select(
        F.col("norm"), F.col("norm").alias("component")
    ).localCheckpoint(eager=True)

    budget = (
        min(hash_to_min_budget, max_iterations)
        if algorithm == "auto"
        else max_iterations
    )
    for _ in range(budget):
        # two-stage salted min: hub nodes ("polymer"-style entities with
        # thousands of similarity neighbors) spread their partial mins over
        # salt_partitions reducers before the final per-node min (on top of
        # Spark's map-side partial aggregation)
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("norm").alias("dst"),
                    F.col("component").alias("n_component"),
                ),
                "dst",
            )
            .groupBy(
                F.col("src").alias("norm"),
                F.pmod(F.xxhash64("dst"), F.lit(salt_partitions)).alias("_salt"),
            )
            .agg(F.min("n_component").alias("part_min"))
            .groupBy("norm")
            .agg(F.min("part_min").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, "norm", "left")
            .select(
                "norm",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
                F.col("component").alias("prev_component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(
            F.col("component") != F.col("prev_component")
        ).limit(1).count()
        labels = updated.drop("prev_component")
        if changed == 0:
            return labels

    if algorithm == "auto":
        # diameter exceeded the hash-to-min budget (long-chain graph) —
        # switch to the O(log n)-round star algorithm from scratch (the
        # budget rounds are sunk cost; correctness is unaffected)
        return _star_labels(nodes, edges, max_rounds=max_iterations)
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. §3): every node connects its
    strictly-greater neighbors to the minimum of its closed neighborhood."""
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
        "src", F.least(F.col("mn"), F.col("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges large->small; every node connects its
    small neighbors (and itself) to the minimum small neighbor."""
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    with_min = oriented.join(mins, "src")
    to_small = with_min.select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_small.unionByName(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _edges_differ(new: DataFrame, old: DataFrame) -> bool:
    """Exact set-inequality probe for convergence detection — one job, same
    shape as the hash-to-min loop's changed-row limit(1) check (a checksum
    comparison would admit an astronomically-unlikely hash-collision false
    convergence; this is exact at the same cost). Both inputs are distinct
    edge sets, so a full-outer join with a one-sided-null filter finds a
    differing row iff the sets differ."""
    lhs = new.select("src", "dst", F.lit(1).alias("_new"))
    rhs = old.select("src", "dst", F.lit(1).alias("_old"))
    return (
        lhs.join(rhs, ["src", "dst"], "full_outer")
        .filter(F.col("_new").isNull() | F.col("_old").isNull())
        .limit(1)
        .count()
        > 0
    )


def _star_labels(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Alternating large-star/small-star to convergence: O(log n) rounds on
    any graph shape (the long-chain worst case hash-to-min handles poorly).
    At the fixed point every edge is (member -> component minimum)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        prev = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if not _edges_differ(e, prev):
            break
    else:
        raise RuntimeError(
            f"star components did not converge in {max_rounds} rounds"
        )
    # fixed point: e is exactly {(member, min)}; singletons label themselves
    labels = e.select(F.col("src").alias("norm"), F.col("dst").alias("component"))
    singletons = nodes.join(
        labels.select("norm"), "norm", "left_anti"
    ).select("norm", F.col("norm").alias("component"))
    return labels.unionByName(singletons)


def _local_components(nodes: list, edges: list) -> dict:
    """Driver-side union-find for broadcast-scale graphs (same output
    contract as the distributed path: component = lexicographic min)."""
    parent = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the lexicographically smaller root
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent}
