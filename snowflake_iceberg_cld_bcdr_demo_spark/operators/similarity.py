"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a narrow map over the scan (dot
product via higher-order functions, JVM-side) followed by TakeOrdered.
Scale path: LSH-bucketed ANN (random-hyperplane signs partition the space,
candidates only join within a bucket) — the same pattern that keeps MinHash
sub-quadratic in :mod:`.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm


def brute_force_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the embedding of `query_vec_id`.

    The 1-row query side is broadcast (no shuffle of the big side); the
    ranking is `orderBy(desc).limit(k)` → TakeOrderedAndProject, which at
    cluster scale reduces per-partition top-k on the executors.  Cosine is
    a sequential double fold (bit-deterministic) and ties break by id."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("query_vec"))
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.col("label"),
            cosine(F.col(vec_col), F.col("query_vec")).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col)).limit(k)


def hyperplane_lsh_buckets(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket = sign pattern against fixed random
    hyperplanes (passed in as literals so the plan stays deterministic).

    At 100 TB this is the partitioning key for ANN: search only touches the
    query's bucket (and optionally Hamming-1 neighbors)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.lit([float(x) for x in p])
        bits.append(F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = (sum(bits) if bits else F.lit(0)).cast("int")  # 0 planes → 1 bucket
    return emb.select(F.col(id_col), F.col(vec_col), F.col("label"), bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (approximate — may
    miss cross-bucket neighbors; recall grows with fewer planes/bands)."""
    bucketed = hyperplane_lsh_buckets(emb, planes, id_col, vec_col)
    q = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("query_vec"), F.col("bucket").alias("query_bucket")
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("query_bucket"))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.col("label"),
            cosine(F.col(vec_col), F.col("query_vec")).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (all pairs above threshold).

    O(n²) self-join — the oracle-checked correctness baseline.  At corpus
    scale use :func:`cosine_pairs_lsh`, which only joins within hyperplane
    buckets (same result modulo LSH recall)."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                   norm(F.col(vec_col)).alias("_na"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                   norm(F.col(vec_col)).alias("_nb"))
    # both norms hoisted out of the pair loop: one dot per pair,
    # bit-identical cosine (sqrt of the same fold)
    sim = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") > threshold)
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-dup pairs: candidates only form inside an LSH
    bucket (sub-quadratic; misses cross-bucket pairs — recall/cost dial is
    the plane count)."""
    bucketed = hyperplane_lsh_buckets(emb, planes, id_col, vec_col)
    a = bucketed.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), F.col("bucket"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = bucketed.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), F.col("bucket"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    # both norms hoisted out of the pair loop: one dot per pair,
    # bit-identical cosine (sqrt of the same fold)
    sim = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") > threshold)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (IVF cell) by cosine.

    Centroids arrive as literal arrays (typically a deterministic sample
    or k-means output collected once — K×dims floats, trivially
    broadcastable inside the plan).  The argmax is an ``array_max`` over
    (sim, cell) structs — pure Catalyst, no UDF.  The centroid table
    enters the plan as ONE nested array literal + one ``transform``
    (see :func:`_l2_argmin` — per-element F.lit loops made expression
    construction, not execution, the driver cost of this family)."""
    book = F.lit([[float(x) for x in c] for c in centroids])
    best = F.array_max(
        F.transform(
            book,
            lambda cv, i: F.struct(
                cosine(F.col(vec_col), cv).alias("sim"), i.alias("cell")
            ),
        )
    )
    # `label` rides along when the input has one (the ANN family always
    # does); generic embedding frames without it work too (semdedup).
    extras = [F.col("label")] if "label" in emb.columns else []
    return emb.select(
        F.col(id_col), F.col(vec_col), *extras, best["cell"].alias("cell")
    )


def sample_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seed centroids: the k lowest-id vectors (documented
    stand-in for a k-means pass; IVF quality improves with better
    centroids but correctness/plumbing is identical).  Collects K×dims
    floats — driver-safe at any corpus size."""
    rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: score only vectors whose cell is among the query's
    ``nprobe`` nearest cells.

    Scale: the assignment is a narrow map; the search probes
    ``nprobe/K`` of the corpus (the recall/cost dial).  At 100 TB the
    assigned table is written once partitioned by ``cell`` so probes
    become partition-pruned scans."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    sims = F.transform(
        F.lit([[float(x) for x in c] for c in centroids]),
        lambda cv, i: F.struct(
            cosine(F.col(vec_col), cv).alias("sim"), i.alias("cell")
        ),
    )
    probe_cells = F.slice(F.sort_array(sims, asc=False), 1, nprobe)["cell"]
    q = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("query_vec"), probe_cells.alias("probe_cells"))
    )
    return (
        assigned.join(F.broadcast(q), F.array_contains(F.col("probe_cells"), F.col("cell")))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.col("label"),
            cosine(F.col(vec_col), F.col("query_vec")).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def label_norm_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label embedding stats (count, min/max L2 norm, dims) — sanity
    profile of an embedding table before indexing.  MIN/MAX (not AVG):
    order-independent folds stay bit-identical across engines
    (functions.numeric module docstring)."""
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min(norm(F.col(vec_col))).alias("min_norm"),
        F.max(norm(F.col(vec_col))).alias("max_norm"),
        F.max(F.size(F.col(vec_col))).alias("n_dims"),
    )


def knn_join_exact(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbors for EVERY vector (kNN self-join), exact O(n²)
    BASELINE — the oracle twin of :func:`knn_join_lsh`, which is the
    operator to use at corpus scale.  Per-vector ranking is a window
    row_number (partition-local sort after one shuffle on vec_a)."""
    from pyspark.sql.window import Window

    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                   norm(F.col(vec_col)).alias("_na"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                   norm(F.col(vec_col)).alias("_nb"))
    # both norms hoisted out of the pair loop: one dot per pair,
    # bit-identical cosine (sqrt of the same fold)
    sim = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    pairs = a.join(b, F.col("vec_a") != F.col("vec_b")).select(
        "vec_a", "vec_b", sim.alias("cosine_sim")
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cosine_sim").desc(), F.col("vec_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_a", "vec_b", "cosine_sim", F.col("rk").cast("int").alias("rk"))
    )


def knn_join_lsh(
    emb: DataFrame,
    tables: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for the kNN self-join: candidates only form inside a
    hyperplane-LSH bucket, unioned across several independent hash tables
    (OR-amplification — a true neighbor is missed only if it lands in a
    different bucket in EVERY table, so recall compounds per table while
    each table's pair count stays Σ|bucket|²).

    ``tables`` is a list of plane sets; more tables → higher recall, more
    candidate pairs (the recall/cost dial, asserted in tests).  Candidates
    are deduplicated before scoring so each pair's cosine is computed
    once."""
    from pyspark.sql.window import Window

    cands: DataFrame | None = None
    for planes in tables:
        bucketed = hyperplane_lsh_buckets(emb, planes, id_col, vec_col)
        a = bucketed.select(F.col(id_col).alias("vec_a"), "bucket")
        b = bucketed.select(F.col(id_col).alias("vec_b"), "bucket")
        t = (
            a.join(b, ["bucket"])
            .filter(F.col("vec_a") != F.col("vec_b"))
            .select("vec_a", "vec_b")
        )
        cands = t if cands is None else cands.unionAll(t)
    cands = (cands if cands is not None else _all_pairs(emb, id_col)).distinct()
    va = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                    norm(F.col(vec_col)).alias("_na"))
    vb = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                    norm(F.col(vec_col)).alias("_nb"))
    # both norms hoisted out of the pair loop: one dot per pair,
    # bit-identical cosine (sqrt of the same fold)
    sim = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    pairs = (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cosine_sim").desc(), F.col("vec_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_a", "vec_b", "cosine_sim", F.col("rk").cast("int").alias("rk"))
    )


def _all_pairs(emb: DataFrame, id_col: str) -> DataFrame:
    a = emb.select(F.col(id_col).alias("vec_a"))
    b = emb.select(F.col(id_col).alias("vec_b"))
    return a.join(b, F.col("vec_a") != F.col("vec_b"))


def quantize_error_stats(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector int8 scalar quantization with reconstruction-quality
    metrics — the storage/IO-reduction step of an embedding store (4x
    smaller vectors before the ANN index is built).

    Symmetric quantization: ``scale = 127 / max|x|``, ``q_i = floor(x_i *
    scale + 0.5)`` (half-up, identical in the SQL oracle where banker's-
    vs half-up ``round`` would diverge).  Quality is reported without
    materializing the reconstruction: ``mse = (x.x - 2 x.r + r.r) / dim``
    and the cosine between original and reconstruction, all via the same
    deterministic left-fold dot products the ANN operators use.

    One narrow codegen stage over the scan — no shuffle, no UDFs; at
    100 TB this runs at parquet-read speed.
    """
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(xd, F.abs))
    scale = F.lit(127.0) / max_abs
    recon = F.transform(xd, lambda v: F.floor(v * scale + 0.5).cast("double") / scale)
    dim = F.size(xd)
    xx = dot(xd, xd)
    rr = dot(recon, recon)
    xr = dot(xd, recon)
    return emb.filter(max_abs > 0).select(
        id_col,
        max_abs.alias("max_abs"),
        scale.alias("scale"),
        ((xx - 2 * xr + rr) / dim).alias("mse"),
        (xr / (F.sqrt(xx) * F.sqrt(rr))).alias("cos_recon"),
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[list[list[float]], list[float]]:
    """Distributed k-means (Lloyd) over the embedding column — the real
    centroid trainer behind :func:`sample_centroids`' documented stand-in.
    Returns ``(centroids, inertia_history)``; feed the centroids straight
    into :func:`ivf_assign` / :func:`ivf_topk`.

    Determinism: init picks the k lowest seeded-md5-hash vectors (stable
    under partitioning and corpus order); the mean update is FIXED-POINT
    (``sum(floor(v·2²⁰)) / (2²⁰·n)`` — an integer sum, order-free), so
    the trained model is bit-identical under any partitioning or
    aggregation order, and a SQL engine can replay every Lloyd round
    exactly (the ``kmeans_cell_profile`` oracle does).  The ≤2⁻²⁰
    quantization per mean is far below the embedding noise floor.

    Scale, per iteration: the assignment is a narrow map (centroid
    literals are K×dims floats baked into the plan, no join); the update
    is posexplode → ONE (cell, dim) shuffle, map-side combined to
    K×dims partials; only K×dims averages ever reach the driver.  An
    emptied cell keeps its previous centroid (standard Lloyd fallback).
    Cosine assignment + mean update is spherical k-means on unit-scaled
    inputs; pass L2-normalized vectors for textbook behavior."""
    rows = (
        emb.orderBy(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
        )
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in rows]
    history: list[float] = []
    for _ in range(iters):
        assigned = ivf_assign(
            emb.select(id_col, vec_col, F.lit(0).alias("label")),
            centroids,
            id_col,
            vec_col,
        )
        best_sim = F.array_max(
            F.transform(
                F.lit([[float(x) for x in c] for c in centroids]),
                lambda cv: cosine(F.col(vec_col), cv),
            )
        )
        q = F.floor(F.col("v").cast("double") * F.lit(1048576.0)).cast("long")
        stats = (
            assigned.withColumn("_sim", best_sim)
            .select("cell", "_sim", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(q).alias("sum_q"),
                F.count(F.lit(1)).alias("n_v"),
                # cosine distance inertia, counted once per vector (dim 0)
                F.sum(F.when(F.col("dim") == 0, 1.0 - F.col("_sim"))).alias("d"),
            )
            .collect()
        )
        new_c = [list(c) for c in centroids]  # emptied cells keep position
        inertia = 0.0
        for r in stats:
            new_c[r.cell][r.dim] = float(r.sum_q) / (1048576.0 * r.n_v)
            if r.d is not None:
                inertia += float(r.d)
        centroids = new_c
        history.append(round(inertia, 6))
    return centroids, history


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space with k-means, compute pairwise cosine ONLY within a
    cluster, connect pairs above ``threshold`` into duplicate groups,
    and keep one representative (the min id) per group.  Returns one row
    per vector: ``(id, cell, cluster_id, is_kept)``.

    Scale: this is the composition that makes embedding-level dedup
    tractable at 100 TB — the quadratic term is n²/K per cell instead
    of n² (the paper's core trick); the trained centroids are plan
    literals; duplicate groups resolve with the same edge-touched-only
    label propagation as text near-dup (``dedup.neardup_clusters``), so
    the iterative stage only ever touches pair endpoints.  With the
    fixed-point k-means (round 6) every stage is deterministic — the
    ``semdedup_decisions`` oracle replays train → assign → pair →
    connected components end to end in SQL.

    ``max_cell`` is the HOT-CELL guard (the embedding analog of the LSH
    band join's ``max_band_bucket``, ``dedup.lsh_candidate_pairs``): a
    skewed embedding distribution — a giant boilerplate cluster — can
    collapse into ONE k-means cell, and the within-cell self-join is
    quadratic in that cell.  When set, only the ``max_cell`` members
    with the lowest seeded-md5 rank inside each cell participate in
    pairing (the rank window rides the same cell partitioning the
    self-join needs — O(B log B), never B²), bounding pair count at
    ``K · max_cell²/2``.  Recall trade-off: capped-out members are never
    paired, so a duplicate group larger than ``max_cell`` keeps its
    over-cap members as false uniques — acceptable because such
    mega-cells are near-certain exact-duplicate clusters that exact
    dedup (``dedup_exact_groups``) removes upstream for a fraction of
    the cost.  ``None`` keeps the paper-exact all-pairs-within-cell
    contract.  Deterministic either way — the capped path is
    SQL-replayable (``semdedup_capped_decisions`` oracle)."""
    from .dedup import neardup_clusters

    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    pairable = assigned
    if max_cell is not None:
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.partitionBy("cell").orderBy(
                F.md5(F.concat_ws(":", F.lit("guard"), F.col(id_col).cast("string"))),
                F.col(id_col),
            )
        )
        pairable = (
            assigned.withColumn("_rk", rk)
            .filter(F.col("_rk") <= max_cell)
            .drop("_rk")
        )
    a = pairable.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), "cell",
        norm(F.col(vec_col)).alias("_na"),
    )
    b = pairable.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), "cell",
        norm(F.col(vec_col)).alias("_nb"),
    )
    # norms hoisted out of the within-cell pair loop — the quadratic
    # n²/K term now costs one dot per pair, bit-identical cosine
    sim = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(sim > threshold)
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    clusters = neardup_clusters(emb.select(id_col), pairs, id_col=id_col)
    return (
        assigned.select(F.col(id_col), F.col("cell"))
        .join(clusters.withColumnRenamed("doc_id", id_col), id_col)
        .select(
            id_col,
            "cell",
            "cluster_id",
            (F.col(id_col) == F.col("cluster_id")).alias("is_kept"),
        )
    )


def cluster_balanced_sample(
    emb: DataFrame,
    centroids: list[list[float]],
    per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: assign every vector to its
    k-means cell and keep the ``per_cell`` lowest seeded-md5-rank
    members of EACH cell — the embedding-space analog of per-source
    quotas.  Over-represented semantic regions (boilerplate clusters,
    templated pages) are capped at the same mass as rare regions, the
    standard cluster-balancing step between dedup and mixture in an
    embedding-curated pipeline.

    Output: kept vectors only — ``(id, cell, cell_rank)``, rank being
    the deterministic admission order within the cell.

    Scale: assignment is a narrow map (centroid literals — see the
    PLANS.md note on the K ≳ 10⁴ broadcast-join alternative); the rank
    is a ``row_number`` over the cell partition whose ``<= per_cell``
    filter pushes down as a WindowGroupLimit (per-partition top-k,
    O(B log per_cell) for a hot cell of B, the ``source_quota``
    precedent) — one cell shuffle total.  Deterministic end to end, so
    the DuckDB oracle replays trainer + assignment + rank cut."""
    from pyspark.sql import Window

    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    rk = F.row_number().over(
        Window.partitionBy("cell").orderBy(
            F.md5(F.concat_ws(":", F.lit("bal"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )
    return (
        assigned.withColumn("cell_rank", rk)
        .filter(F.col("cell_rank") <= per_cell)
        .select(id_col, "cell", "cell_rank")
    )


def embedding_decontaminate(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination — the semantic complement of the
    text-space :func:`dedup.neardup_decontaminate`: for every TRAINING
    vector, find its nearest EVAL vector by cosine and flag training
    docs whose nearest benchmark neighbor exceeds ``threshold``
    (rewrites and translations land near the benchmark in embedding
    space even when no n-gram or shingle survives).

    Output per train vector: ``(id, nearest_eval_id, max_cosine,
    leaked)``; argmax ties break to the larger eval id (struct-max
    order, mirrored by the oracle's DESC row_number).

    Scale: eval sets are fixed-size, so the eval side BROADCASTS and the
    |train|×|eval| score space never materializes past the map side —
    the broadcast nested-loop join feeds a partial max-struct aggregate
    that collapses to ONE row per train vector before the only shuffle
    (|train| rows).  Linear in the corpus, zero data-dependent skew.
    Both L2 norms are HOISTED out of the pair loop (computed once per
    row before the join — Catalyst lambdas do no loop-invariant
    hoisting themselves), so each pair costs one dot product instead of
    three: same sqrt-of-same-fold doubles, bit-identical cosine, ~3×
    less arithmetic (measured 8.3 s → ~3 s at sf0.1).  The train-side
    scan rides the :func:`..operators.dedup._parallelize_scan` guard:
    the per-row work here is |eval| dot products, so a single-file scan
    would put the WHOLE quadratic term on one core (measured 362 s
    single-task at the sf1 spot before the guard)."""
    from .dedup import _parallelize_scan

    ev = eval_emb.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("ev"),
        norm(F.col(vec_col)).alias("_en"),
    )
    sim = dot(F.col(vec_col), F.col("ev")) / (F.col("_tn") * F.col("_en"))
    best = (
        _parallelize_scan(
            train_emb.select(id_col, vec_col, norm(F.col(vec_col)).alias("_tn"))
        )
        .crossJoin(F.broadcast(ev))
        .groupBy(id_col)
        .agg(
            F.max(F.struct(sim.alias("cos"), F.col("eval_id"))).alias("b")
        )
    )
    return best.select(
        id_col,
        F.col("b.eval_id").alias("nearest_eval_id"),
        F.round(F.col("b.cos"), 6).alias("max_cosine"),
        (F.col("b.cos") >= threshold).alias("leaked"),
    )


def ivf_index(
    ref_emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PERSISTABLE side of :func:`embedding_decontaminate_ivf`: the
    reference vectors assigned to their centroid cells once, with the
    pair-loop L2 norm hoisted — ``(eval_id, ev, cell, _en)``.  Write it
    to parquet / a lakehouse table and pass it back via
    ``embedding_decontaminate_ivf(index=...)`` so repeated probes (a
    daily admission batch vs the same corpus, many training runs vs the
    same benchmark suite) never re-assign the reference side.  Cell
    assignment is deterministic from the centroid literals, so the
    round trip is value-identical to inline assignment (pytest-pinned)."""
    if not centroids:
        raise ValueError("ivf_index: centroids is empty")
    return ivf_assign(
        ref_emb.select(id_col, vec_col), centroids, id_col, vec_col
    ).select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("ev"),
        "cell",
        norm(F.col(vec_col)).alias("_en"),
    )


def embedding_decontaminate_ivf(
    train_emb: DataFrame,
    eval_emb: DataFrame | None,
    centroids: list[list[float]],
    nprobe: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-probed embedding decontamination — the unconditionally
    scale-safe variant of :func:`embedding_decontaminate`: eval vectors
    are assigned to their nearest centroid cell once (argmax cosine,
    ties to the larger cell — :func:`ivf_assign` semantics), and each
    TRAIN vector scores only the eval vectors in its ``nprobe`` nearest
    cells instead of the whole eval set.  The exact broadcast-NLJ
    operator stays the certified baseline; this is the path for eval
    sets big enough (≥10⁵) that the per-train-row |eval| constant IS
    the job.

    Output schema identical to the exact operator: ``(id,
    nearest_eval_id, max_cosine, leaked)``; train vectors with NO eval
    vector in any probed cell get NULL neighbor/cosine and
    ``leaked=false`` (the recall trade-off, bounded in tests against
    the exact baseline).

    Scale: centroids are plan literals; the probe-cell ranking is a
    narrow map; the eval side still broadcasts but each train row now
    joins ``nprobe/K`` of it (hash join on cell, not NLJ), so the
    scoring work per train vector drops by K/nprobe and the partial
    max-struct still collapses everything to |train| rows before the
    only shuffle."""
    if not centroids:
        # an empty codebook would probe nothing: every train vector
        # silently gets leaked=false — decontamination disabled, no error
        raise ValueError("embedding_decontaminate_ivf: centroids is empty")
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(
            f"embedding_decontaminate_ivf: nprobe must be in "
            f"[1, {len(centroids)}], got {nprobe}"
        )
    if eval_emb is None and index is None:
        raise ValueError(
            "embedding_decontaminate_ivf: need eval_emb or a prebuilt index"
        )
    # ``index``: the frozen reference-side assignment (:func:`ivf_index`)
    # — must have been built with the SAME centroids (the probe ranking
    # below re-derives cells from them)
    ev = index if index is not None else ivf_index(
        eval_emb, centroids, id_col, vec_col
    )
    sims = F.transform(
        F.lit([[float(x) for x in c] for c in centroids]),
        lambda cv, i: F.struct(
            cosine(F.col(vec_col), cv).alias("sim"), i.alias("cell")
        ),
    )
    probe_cells = F.slice(F.sort_array(sims, asc=False), 1, nprobe)["cell"]
    # both L2 norms hoisted out of the pair loop (the exact operator's
    # trick): one dot per probed pair, bit-identical cosine; the train
    # scan rides the parallelism guard (per-row work is nprobe/K of the
    # eval set — a single-file scan would serialize it)
    from .dedup import _parallelize_scan

    probed = _parallelize_scan(train_emb).select(
        id_col,
        vec_col,
        norm(F.col(vec_col)).alias("_tn"),
        F.explode(probe_cells).alias("cell"),
    )
    sim = dot(F.col(vec_col), F.col("ev")) / (F.col("_tn") * F.col("_en"))
    # Broadcast asymmetry: with an INLINE eval set, eval is the small
    # side (an eval benchmark vs the whole training corpus) → broadcast
    # it.  With a PREBUILT index the index is the persistent, possibly
    # corpus-sized side (the admission flow probes a daily batch against
    # the frozen corpus index) → broadcast the probing side instead;
    # broadcasting the index there would ship the corpus to every
    # executor.
    if index is not None:
        joined = F.broadcast(probed).join(ev, "cell")
    else:
        joined = probed.join(F.broadcast(ev), "cell")
    best = (
        joined.groupBy(id_col)
        .agg(F.max(F.struct(sim.alias("cos"), F.col("eval_id"))).alias("b"))
    )
    return (
        train_emb.select(id_col)
        .distinct()
        .join(best, id_col, "left")
        .select(
            id_col,
            F.col("b.eval_id").alias("nearest_eval_id"),
            F.round(F.col("b.cos"), 6).alias("max_cosine"),
            F.coalesce(F.col("b.cos") >= threshold, F.lit(False)).alias(
                "leaked"
            ),
        )
    )


# -- product quantization (the 100 TB embedding-store compression) -------

def _l2_argmin(sub_col, codewords: list[list[float]]):
    """Index of the nearest codeword to ``sub_col`` by squared L2 —
    ``array_min`` over (dist, idx) structs, pure Catalyst (ties break to
    the lowest index via struct ordering).

    The codebook enters the plan as ONE nested array literal and the
    candidates via ONE ``transform`` — the former per-codeword
    ``F.array(*[F.lit(x) …])`` loop built k×(D/m) literals through
    individual py4j calls, which made EXPRESSION CONSTRUCTION (not
    execution) the dominant cost of `pq_train`/`pq_encode` on the
    driver (measured: ~9s of a 11s pq_train in py4j round trips).
    Same arithmetic, same tie-break — values bit-identical."""
    book = F.lit([[float(x) for x in c] for c in codewords])
    return F.array_min(
        F.transform(
            book,
            lambda cv, i: F.struct(
                F.aggregate(
                    F.zip_with(sub_col, cv, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                i.alias("idx"),
            ),
        )
    )["idx"]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the D-dim space into
    ``m`` subspaces and run L2 Lloyd iterations per subspace (init = the
    k lowest seeded-md5-hash sub-vectors; the codeword mean update is
    the same FIXED-POINT ``sum(floor(v·2²⁰)) / (2²⁰·n)`` integer fold as
    :func:`kmeans_centroids`, so the model is bit-identical under any
    partitioning and SQL-replayable — the ``ann_pq_topk`` oracle retrains
    it in DuckDB).  Returns ``m`` codebooks of ``k`` codewords.

    Scale: each iteration is one narrow assignment map (codeword
    literals in the plan) plus ONE (subspace, code, dim)
    map-side-combined shuffle reducing to m×k×(D/m) partial means — the
    classic distributed PQ trainer.  ALL ``m`` subspaces train inside
    that one job (and the seeded init is one windowed job): the r13
    shape looped the driver over subspaces, paying m×(1+iters)
    sequential Spark jobs — 24 for the default m=8/iters=2 — where the
    fused trainer pays 1+iters (measured 15s → ~2s on the 500-vector
    test corpus; values BIT-IDENTICAL — the fixed-point integer fold is
    order-free and the init rank order is preserved per subspace).  The
    model is m×k×(D/m) = D×k floats total, driver-trivial.
    """
    first = emb.select(vec_col).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    # seeded init, all subspaces in ONE job: per subspace j the k
    # lowest md5(f"{seed}:{j}:{id}") sub-vectors, in ascending hash
    # order — exactly the rows (and row order) of the former per-j
    # orderBy().limit(k)
    from pyspark.sql import Window

    init_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.md5(
                    F.concat_ws(
                        ":", F.lit(f"{seed}:{j}"), F.col(id_col).cast("string")
                    )
                ).alias("h"),
                F.slice(F.col(vec_col), j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    wj = Window.partitionBy("j").orderBy("h")
    init_rows = (
        emb.select(F.explode(init_structs).alias("s"))
        .select("s.j", "s.h", "s.sv")
        .withColumn("_rk", F.row_number().over(wj))
        .filter(F.col("_rk") <= k)
        .collect()
    )
    codebooks: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(init_rows, key=lambda r: (r.j, r._rk)):
        codebooks[r.j].append([float(x) for x in r.sv])

    for _ in range(iters):
        # assignment + sufficient statistics for every subspace in ONE
        # map-side-combined job: each row contributes its m codes'
        # (j, code, dim) partial sums — the same integer fold as the
        # per-subspace loop, summed in one shuffle
        code_structs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _l2_argmin(
                        F.slice(F.col(vec_col), j * sub + 1, sub), codebooks[j]
                    ).alias("code"),
                    F.slice(F.col(vec_col), j * sub + 1, sub).alias("sv"),
                )
                for j in range(m)
            ]
        )
        q = F.floor(F.col("v").cast("double") * F.lit(1048576.0)).cast("long")
        stats = (
            emb.select(F.explode(code_structs).alias("s"))
            .select("s.j", "s.code", F.posexplode("s.sv").alias("dim", "v"))
            .groupBy("j", "code", "dim")
            .agg(F.sum(q).alias("sum_q"), F.count(F.lit(1)).alias("n_v"))
            .collect()
        )
        new_books = [[list(c) for c in b] for b in codebooks]  # emptied codes keep position
        for r in stats:
            new_books[r.j][r.code][r.dim] = float(r.sum_q) / (1048576.0 * r.n_v)
        codebooks = new_books
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codeword indices (m bytes at k<=256 —
    a 64-dim float32 embedding compresses 32× at m=8/k=16).  Pure
    Catalyst: per-subspace argmin over literal codewords, zero shuffles.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = F.array(
        *[
            _l2_argmin(F.slice(F.col(vec_col), j * sub + 1, sub), codebooks[j])
            for j in range(m)
        ]
    )
    keep = [c for c in emb.columns if c != vec_col]
    return emb.select(*keep, codes.alias("codes"))


def pq_topk(
    emb: DataFrame,
    query_vec_id: int,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    query stays full-precision, every corpus vector is its PQ code, and
    the distance is a per-subspace table lookup.

    Scale: the m×k lookup table is computed driver-side from the 1-row
    query and baked into the plan as a literal array; scoring is ONE
    ``element_at`` sum over the codes array per row (no vector math on
    the corpus side at all — this is why PQ serves billion-vector
    stores), then TakeOrderedAndProject.  Ranking is ascending ADC
    distance; ties break by id.

    ``rerank > k`` adds the standard refine stage (FAISS
    ``IndexRefineFlat``): the ADC shortlist of that size is joined back
    to the full-precision vectors (a broadcast of ``rerank`` ids) and
    re-scored with exact cosine — recall approaches the shortlist's
    coverage while the corpus-wide scan still never touches a float.
    Output schema gains ``cosine_sim`` in that mode."""
    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    q = emb.filter(F.col(id_col) == query_vec_id).select(vec_col).first()
    if q is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    qv = [float(x) for x in q[0]]
    lut: list[float] = []
    for j in range(m):
        qs = qv[j * sub : (j + 1) * sub]
        for c in codebooks[j]:
            lut.append(sum((a - b) * (a - b) for a, b in zip(qs, c)))
    lut_lit = F.lit([float(v) for v in lut])
    encoded = pq_encode(emb, codebooks, id_col, vec_col)
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(lut_lit, F.element_at(F.col("codes"), j + 1) + j * kk + 1),
    )
    shortlist = (
        encoded.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), F.col("label"), adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc_nulls_last(), F.col(id_col))
        .limit(max(k, rerank))
    )
    if rerank <= k:
        return shortlist.limit(k)
    qvec = F.lit([float(x) for x in qv])
    return (
        emb.join(
            F.broadcast(shortlist.select(id_col, "adc_dist")), id_col
        )
        .select(
            F.col(id_col),
            F.col("label"),
            F.col("adc_dist"),
            cosine(F.col(vec_col), qvec).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def ivf_residuals(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its IVF cell and subtract that cell's
    centroid (the FAISS IVFPQ residual): PQ codebooks trained on
    residuals are much tighter than on raw vectors because each cell's
    residual cloud is centered at the origin.  Pure Catalyst — the
    centroid table is a literal array-of-arrays indexed by cell."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    cents = F.lit([[float(x) for x in c] for c in centroids])
    res = F.zip_with(
        F.col(vec_col),
        F.element_at(cents, F.col("cell") + 1),
        lambda a, b: a.cast("double") - b,
    )
    return assigned.select(
        F.col(id_col), F.col("label"), F.col("cell"), res.alias("residual")
    )


def ivfpq_topk(
    emb: DataFrame,
    query_vec_id: int,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ composed (the FAISS ``IVFPQ`` index — the standard
    billion-vector serving shape): vectors live in IVF cells as m-byte
    PQ codes of their CELL RESIDUALS; a query probes its ``nprobe``
    nearest cells and scores codes by ADC against a PER-CELL lookup
    table built from (query − centroid).

    Scale: the scan prunes to nprobe/K of the corpus (cell partition
    pruning once the encoded table is written partitioned by cell), the
    probed rows cost one table-lookup sum each, and only the optional
    ``rerank`` shortlist ever touches a full-precision vector."""
    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    q = emb.filter(F.col(id_col) == query_vec_id).select(vec_col).first()
    if q is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    qv = [float(x) for x in q[0]]

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    order = sorted(range(len(centroids)), key=lambda c: (-_cos(qv, centroids[c]), c))
    probed = order[:nprobe]
    # per-cell ADC tables over the query residual, flat-indexed by
    # (cell, subspace, code); unprobed cells are filtered out before
    # scoring so their slots never evaluate
    lut: list[float] = [0.0] * (len(centroids) * m * kk)
    for c in probed:
        qr = [a - b for a, b in zip(qv, centroids[c])]
        for j in range(m):
            qs = qr[j * sub : (j + 1) * sub]
            for ci, cw in enumerate(codebooks[j]):
                lut[(c * m + j) * kk + ci] = sum(
                    (a - b) * (a - b) for a, b in zip(qs, cw)
                )
    lut_lit = F.lit([float(v) for v in lut])
    encoded = pq_encode(
        ivf_residuals(emb, centroids, id_col, vec_col),
        codebooks,
        id_col,
        vec_col="residual",
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            lut_lit,
            (
                (F.col("cell") * m + j) * kk
                + F.element_at(F.col("codes"), j + 1)
                + 1
            ).cast("int"),
        ),
    )
    shortlist = (
        encoded.filter(
            F.col("cell").isin([int(c) for c in probed])
            & (F.col(id_col) != query_vec_id)
        )
        .select(F.col(id_col), F.col("label"), adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc_nulls_last(), F.col(id_col))
        .limit(max(k, rerank))
    )
    if rerank <= k:
        return shortlist.limit(k)
    qvec = F.lit([float(x) for x in qv])
    return (
        emb.join(F.broadcast(shortlist.select(id_col, "adc_dist")), id_col)
        .select(
            F.col(id_col),
            F.col("label"),
            F.col("adc_dist"),
            cosine(F.col(vec_col), qvec).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


# -- index lifecycle (build once in the lakehouse, serve many queries) ---

def build_ivfpq_index(
    cat,
    namespace: str,
    emb: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize an IVF-PQ index into the lakehouse: the model
    (centroids + codebooks, driver-trivial) lands in
    ``{namespace}.ann_model`` and the encoded corpus (cell + m-byte
    codes, NO vectors) in ``{namespace}.ann_codes`` partitioned by
    cell — so a query's nprobe cell scan is a partition-pruned read of
    a few bytes per vector, the production serving layout.  Rebuild on
    drift (``jobs/lineage.snapshot_psi``) or on a schedule.

    Returns {"model_rows", "encoded_rows", "n_cells", "version"}."""
    import json as _json

    try:
        _, _, prev = load_ann_model_versioned(cat, namespace)
        version = (prev or 0) + 1
    except Exception:
        version = 1
    cents = kmeans_centroids(emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)[0]
    res = ivf_residuals(emb, cents, id_col, vec_col)
    books = pq_train(res, m=m, k=k, iters=iters, id_col=id_col, vec_col="residual")
    spark = emb.sparkSession
    model_rows = (
        [("centroid", i, _json.dumps(c)) for i, c in enumerate(cents)]
        + [("codebook", j, _json.dumps(book)) for j, book in enumerate(books)]
        # the version row pairs the model with its codes table: readers
        # accept a (model, codes) pair only when the stamps agree, which
        # is what makes a rebuild SWAP safe without a cross-table
        # transaction (the two overwrites commit independently)
        + [("version", version, _json.dumps({"n_cells": n_cells, "m": m, "k": k}))]
    )
    model = spark.createDataFrame(
        model_rows, "kind string, idx int, payload string"
    )
    encoded = pq_encode(res, books, id_col, vec_col="residual").withColumn(
        "model_version", F.lit(version)
    )
    # codes land FIRST: when the new model becomes visible its codes
    # already exist, so the only transient is (old model, new codes) —
    # which the version check turns into a reload, never a wrong result.
    # Rebuilds REPLACE (history-preserving snapshots: a reader pinned to
    # the old pair keeps serving it; expire_snapshots reclaims later)
    # rather than overwrite (which resets lineage and deletes old dirs).
    if cat.table_exists(namespace, "ann_codes"):
        cat.replace_table(namespace, "ann_codes", encoded)
    else:
        cat.create_table(namespace, "ann_codes", encoded, partition_by=["cell"])
    if cat.table_exists(namespace, "ann_model"):
        cat.replace_table(namespace, "ann_model", model)
    else:
        cat.create_table(namespace, "ann_model", model)
    return {
        "model_rows": len(model_rows),
        "encoded_rows": cat.current_snapshot(namespace, "ann_codes").row_count,
        "n_cells": n_cells,
        "version": version,
    }


def load_ann_model(cat, namespace: str) -> tuple[list, list]:
    """(centroids, codebooks) back from ``{namespace}.ann_model``."""
    cents, books, _ = load_ann_model_versioned(cat, namespace)
    return cents, books


def load_ann_model_versioned(cat, namespace: str) -> tuple[list, list, int | None]:
    """(centroids, codebooks, version) from ``{namespace}.ann_model`` —
    version is None for a pre-versioning-era model table."""
    import json as _json

    rows = cat.load(namespace, "ann_model").collect()
    cents = [
        _json.loads(r.payload)
        for r in sorted((r for r in rows if r.kind == "centroid"), key=lambda r: r.idx)
    ]
    books = [
        _json.loads(r.payload)
        for r in sorted((r for r in rows if r.kind == "codebook"), key=lambda r: r.idx)
    ]
    versions = [r.idx for r in rows if r.kind == "version"]
    return cents, books, (max(versions) if versions else None)


def ivfpq_query_index(
    cat,
    namespace: str,
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve an ANN query from the PREBUILT index: the stored codes
    table is read with a cell-IN filter (partition-pruned — only the
    probed cells' files are listed), scored by per-cell ADC lookup
    tables, optionally reranked against full vectors for just the
    shortlist.  The corpus embedding table is touched ONLY for the
    query vector and the rerank ids."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(vec_col).first()
    if q is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    qv = [float(x) for x in q[0]]

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    # version-paired read: a rebuild swaps ann_codes then ann_model as
    # two independent CAS commits, so a reader can observe (old model,
    # new codes); the stamps disagree there and the loop reloads — a
    # mid-swap query either serves the OLD consistent pair (its codes
    # snapshot read is immutable) or the NEW one, never a mix
    for _attempt in range(3):
        cents, books, ver = load_ann_model_versioned(cat, namespace)
        m, kk = len(books), len(books[0])
        sub = len(books[0][0])
        order = sorted(range(len(cents)), key=lambda c: (-_cos(qv, cents[c]), c))
        probed = [int(c) for c in order[:nprobe]]
        lut: list[float] = [0.0] * (len(cents) * m * kk)
        for c in probed:
            qr = [a - b for a, b in zip(qv, cents[c])]
            for j in range(m):
                qs = qr[j * sub : (j + 1) * sub]
                for ci, cw in enumerate(books[j]):
                    lut[(c * m + j) * kk + ci] = sum(
                        (a - b) * (a - b) for a, b in zip(qs, cw)
                    )
        codes = cat.load(namespace, "ann_codes", filters=[("cell", "in", probed)])
        if ver is not None and "model_version" in codes.columns:
            stamp = codes.select("model_version").first()
            if stamp is not None and stamp[0] != ver:
                continue  # swap in flight: reload the model and retry
            codes = codes.filter(F.col("model_version") == ver)
        break
    else:
        raise RuntimeError(
            f"{namespace}.ann_model/ann_codes versions kept disagreeing "
            "after 3 reads — is a rebuild_ann_index loop stuck mid-swap?"
        )
    lut_lit = F.lit([float(v) for v in lut])
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            lut_lit,
            (
                (F.col("cell") * m + j) * kk
                + F.element_at(F.col("codes"), j + 1)
                + 1
            ).cast("int"),
        ),
    )
    shortlist = (
        codes.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), F.col("label"), adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc_nulls_last(), F.col(id_col))
        .limit(max(k, rerank))
    )
    if rerank <= k:
        return shortlist.limit(k)
    qvec = F.lit([float(x) for x in qv])
    return (
        emb.join(F.broadcast(shortlist.select(id_col, "adc_dist")), id_col)
        .select(
            F.col(id_col),
            F.col("label"),
            F.col("adc_dist"),
            cosine(F.col(vec_col), qvec).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def refresh_ivfpq_index(
    cat,
    namespace: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance: encode ONLY the new vectors with
    the STORED model (no retraining — the standard serving trade: cell
    boundaries drift slowly; retrain on schedule or on a
    ``snapshot_psi`` alarm) and append them to the code table.  Cost is
    O(delta), independent of index size.

    Returns {"appended_rows", "total_rows"}."""
    cents, books, ver = load_ann_model_versioned(cat, namespace)
    encoded = pq_encode(
        ivf_residuals(new_vectors, cents, id_col, vec_col),
        books,
        id_col,
        vec_col="residual",
    )
    if ver is not None:
        # same stamp as the model that encoded them: the delta stays
        # servable through the version-paired read
        encoded = encoded.withColumn("model_version", F.lit(ver))
    snap = cat.append(namespace, "ann_codes", encoded)
    return {"appended_rows": snap.added_rows, "total_rows": snap.row_count}


def rebuild_ann_index(
    cat,
    namespace: str,
    surviving_emb: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Codebook RETRAIN + index SWAP — the maintenance story the frozen
    IVF-PQ model needs (reference analog for the discipline: the MV
    refresh task, `/root/reference/scripts/12_materialized_views.sql:6-9`
    — precomputed artifacts carry a refresh job): after heavy takedown
    or corpus drift the build-time centroids/codebooks stop fitting the
    surviving distribution and recall decays silently, because
    :func:`refresh_ivfpq_index` never retrains and
    `ann_recall_datasheet` certifies recall only at build time.

    Retrains centroids and PQ codebooks from ``surviving_emb`` (the
    CURRENT corpus — post-takedown, post-drift), re-encodes it, and
    swaps both tables under the usual manifest-CAS commits, version-
    stamped: codes commit first, then the model, and
    :func:`ivfpq_query_index` accepts a (model, codes) pair only when
    their version stamps agree — so an in-flight query serves either
    the old consistent pair or the new one, never a mix, with no
    cross-table transaction.  History is preserved (time travel to the
    pre-rebuild index still works until ``expire_snapshots``).

    Pair with :func:`ann_recall_drift_check` on the maintenance
    cadence: when measured recall@k sags under the datasheet floor,
    rebuild.  Returns the :func:`build_ivfpq_index` dict (including the
    new ``version``)."""
    return build_ivfpq_index(
        cat, namespace, surviving_emb,
        n_cells=n_cells, m=m, k=k, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )


def ann_recall_drift_check(
    cat,
    namespace: str,
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 100,
    floor: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Replay the `ann_recall_datasheet` contract against the CURRENT
    stored index: for each probe query, recall@k of
    :func:`ivfpq_query_index` vs the exact brute-force top-k on the
    CURRENT corpus ``emb``.  Build-time recall certifies the index once;
    this is the drift alarm that tells you when :func:`rebuild_ann_index`
    is due (takedowns thinned cells, a refresh appended a shifted
    distribution, ...).

    Driver cost is O(len(query_vec_ids)) index queries — probe with a
    handful of ids on the maintenance cadence, not the corpus.  Returns
    ``{"recall_at_k", "per_query", "k", "version", "rebuild_due"}``
    (``rebuild_due`` is None unless ``floor`` is given)."""
    if not query_vec_ids:
        raise ValueError("ann_recall_drift_check: pass at least one query id")
    per_query: dict[int, float] = {}
    for qid in query_vec_ids:
        exact = {
            r[0]
            for r in brute_force_topk(
                emb, query_vec_id=qid, k=k, id_col=id_col, vec_col=vec_col
            )
            .select(id_col)
            .collect()
        }
        got = {
            r[0]
            for r in ivfpq_query_index(
                cat, namespace, emb, query_vec_id=qid,
                k=k, nprobe=nprobe, rerank=rerank,
                id_col=id_col, vec_col=vec_col,
            )
            .select(id_col)
            .collect()
        }
        per_query[qid] = len(exact & got) / float(k)
    mean = sum(per_query.values()) / len(per_query)
    _, _, ver = load_ann_model_versioned(cat, namespace)
    return {
        "recall_at_k": round(mean, 4),
        "per_query": per_query,
        "k": k,
        "version": ver,
        "rebuild_due": (None if floor is None else mean < floor),
    }
