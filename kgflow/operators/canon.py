"""Canonicalization: symmetric pairs, duplicate-group resolution,
and iterative connected-components entity consolidation.

The reference consolidates equivalent entities pairwise
(``cql/remediation/remediate_gene_node.cql:5-52``: copy props, migrate
edges, delete source) and canonicalizes symmetric edges with the
non-deterministic internal-id ordering ``id(u1) < id(u2)``
(``cql/import/uniprot/uniprot_intact.cql:30-39``). Here:

* symmetric pairs use ``least/greatest`` — deterministic, no internal ids;
* duplicate groups resolve by window ``row_number() == 1`` with an
  explicit tie-break (``cql/remediation/remediate_duplicate_pubmed_ids
  .cql:1-13`` kept ``nodes[0]`` — order-dependent; we keep min(key));
* chained equivalences (A↔B↔C across id spaces) resolve by iterative
  min-label propagation to a fixpoint — pure DataFrame hash joins, no
  GraphFrames dependency.

Scale notes: each iteration is one shuffle-join plus one groupBy-min;
``min`` is algebraic so map-side partial aggregation absorbs hot-key
skew before the shuffle (plus AQE skew-join splitting). Lineage is
truncated every iteration with ``localCheckpoint`` so plans stay O(1)
deep regardless of iteration count. Iterations are O(log d) in the
graph diameter for the doubling variant below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def canonical_pairs(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One canonical (least, greatest) row per unordered pair, self-pairs
    dropped — the deterministic re-expression of ``id(u1) < id(u2)``."""
    return (
        df.select(
            F.least(F.col(col_a), F.col(col_b)).alias("pair_a"),
            F.greatest(F.col(col_a), F.col(col_b)).alias("pair_b"),
        )
        .filter(F.col("pair_a") != F.col("pair_b"))
        .dropDuplicates(["pair_a", "pair_b"])
    )


def dedup_keep_first(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Duplicate-group resolution (C3): deterministic keep-one per key."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(id, canonical_id) for every id reachable through same-as edges.

    canonical_id = min(member id) of the component (FIXTURES.md §8
    expected output). Algorithm: undirected min-label propagation with
    label-graph contraction — each round joins current labels across
    edges AND rewrites the edge set onto the label space (pointer
    doubling), giving O(log d) rounds instead of O(d).
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .dropDuplicates()
    )
    # Fast path: same-as graphs derived from ontology lexicons are
    # dimension-scale (the reference parses whole ontologies in the
    # driver, import_go_obo.py:64-145). Below the threshold a driver
    # union-find beats ~10 distributed join rounds of fixed latency;
    # the iterative path below is the 100 TB route.
    n_edges = e.limit(driver_threshold + 1).count()
    if n_edges <= driver_threshold:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in e.collect():
            ra, rb = find(row.a), find(row.b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        members = sorted(set(parent) | {find(k) for k in parent})
        data = [(m, find(m)) for m in members]
        # preserve the caller's id type — hardcoding string would make
        # the operator crash below the threshold but work above it
        id_type = dict(e.dtypes)["a"]
        return spark.createDataFrame(data, f"id {id_type}, canonical_id {id_type}")

    nodes = e.select(F.col("a").alias("id")).union(e.select("b")).distinct()
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    # symmetric closure once; afterwards we contract on labels
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint(
        eager=True
    )

    for _ in range(max_iter):
        # candidate label for each node: min of own and neighbors' labels
        nbr = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), "label")
        )
        new_labels = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        # pointer doubling: relabel through the current label map so long
        # chains collapse exponentially (label(label(x))). The map side is
        # re-projected to fresh column names to keep the self-join
        # unambiguous.
        lbl_map = new_labels.select(
            F.col("id").alias("_l_id"), F.col("label").alias("_l_lbl")
        )
        new_labels = (
            new_labels.withColumnRenamed("label", "_old")
            .join(lbl_map, F.col("_old") == F.col("_l_id"), "left")
            .select("id", F.coalesce("_l_lbl", "_old").alias("label"))
        ).localCheckpoint(eager=True)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("canonical_id"))


def apply_canonical(
    df: DataFrame, mapping: DataFrame, cols: list[str]
) -> DataFrame:
    """Rewrite id columns through the (id → canonical_id) mapping.

    Ids absent from the mapping stay as-is (they are their own
    canonical form).
    """
    out = df
    for c in cols:
        m = mapping.select(
            F.col("id").alias(f"_m_{c}"), F.col("canonical_id").alias(f"_c_{c}")
        )
        out = (
            out.join(F.broadcast(m), out[c] == m[f"_m_{c}"], "left")
            .withColumn(c, F.coalesce(F.col(f"_c_{c}"), F.col(c)))
            .drop(f"_m_{c}", f"_c_{c}")
        )
    return out


def bounded_paths(
    edges: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded variable-length reachability (J12): all (src, dst) pairs
    connected by a directed path of 1..max_hops edges, with the minimum
    hop count — the reference's ``(:Hpo)<-[:SUBCLASSOF*1..3]-``
    (``import_hpo.cql:271-273``) as an iterated self-join.

    Each hop is one equi-join shuffle on the frontier's endpoint; the
    frontier is deduped per round so diamond-shaped DAGs don't multiply
    paths (only pair existence matters, not path count). max_hops is a
    small constant, so the plan is max_hops-1 joins — no driver loop
    over data, no unbounded iteration.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    paths = e.withColumn("depth", F.lit(1))
    frontier = e
    for d in range(2, max_hops + 1):
        nxt = e.select(F.col("src").alias("_mid"), F.col("dst").alias("_dst"))
        frontier = (
            frontier.join(nxt, frontier["dst"] == nxt["_mid"])
            .select("src", F.col("_dst").alias("dst"))
            .distinct()
        )
        paths = paths.unionByName(frontier.withColumn("depth", F.lit(d)))
    return paths.groupBy("src", "dst").agg(F.min("depth").alias("min_depth"))
