"""Approximate-ANN quality tests: IVF and LSH variants against the exact
brute-force baseline (recall is the contract for approximate ops — they
have no SQL oracle by design)."""

from __future__ import annotations

import pytest

from snowflake_iceberg_cld_bcdr_demo_spark.operators import similarity
from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_top10(spark, emb):
    return [r.vec_id for r in similarity.brute_force_topk(emb, 0, k=10).collect()]


def test_ivf_full_probe_equals_exact(spark, emb, exact_top10):
    """nprobe = K (probe everything) must reproduce the exact result —
    separates IVF bookkeeping bugs from genuine recall loss."""
    cents = similarity.sample_centroids(emb, k=8)
    full = [r.vec_id for r in similarity.ivf_topk(emb, 0, cents, k=10, nprobe=8).collect()]
    assert full == exact_top10


def test_ivf_partial_probe_recall(spark, emb, exact_top10):
    cents = similarity.sample_centroids(emb, k=8)
    approx = [r.vec_id for r in similarity.ivf_topk(emb, 0, cents, k=10, nprobe=4).collect()]
    assert len(approx) <= 10
    recall = len(set(approx) & set(exact_top10)) / 10
    assert recall >= 0.3  # half the cells probed → nontrivial recall


def test_ivf_assignment_covers_all(spark, emb):
    cents = similarity.sample_centroids(emb, k=8)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1


def test_registered_ann_variants_run(spark):
    for name in ("ann_ivf_topk", "ann_lsh_topk"):
        df = QUERY_SPECS[name].build(spark, SF)
        rows = df.collect()
        assert len(rows) <= 10
        assert all(-1.0 <= r.cosine_sim <= 1.0 for r in rows)


def test_knn_join_lsh_recall(spark):
    """Bucketed kNN must recover a solid fraction of the exact top-k edges
    (few planes → big buckets → high recall; the dial is documented)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import similarity
    from snowflake_iceberg_cld_bcdr_demo_spark.plans.pipeline import _PLANES
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.knn_join_exact(emb, k=3).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in similarity.knn_join_lsh(
            emb, tables=[_PLANES[0:2], _PLANES[2:4], _PLANES[4:6]], k=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # full-probe degenerate case: 0 planes = 1 bucket = exact result
    full = {
        (r.vec_a, r.vec_b)
        for r in similarity.knn_join_lsh(emb, tables=[[]], k=3).collect()
    }
    assert full == exact


def test_kmeans_deterministic_and_monotone(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1, h1 = S.kmeans_centroids(emb, k=4, iters=3)
    c2, h2 = S.kmeans_centroids(emb.repartition(7), k=4, iters=3)
    # same seeded init → same trajectory; float averaging may wobble in
    # the last ulps across partitionings, so compare with tolerance
    assert all(abs(a - b) < 1e-3 for a, b in zip(h1, h2))
    assert all(h1[i + 1] <= h1[i] + 1e-6 for i in range(len(h1) - 1))
    # trained centroids beat the lowest-id sample on inertia
    sample = S.sample_centroids(emb, k=4)
    _, h_sample = S.kmeans_centroids(emb, k=4, iters=1)
    assert h1[-1] <= h_sample[0] + 1e-6


def test_pq_encode_roundtrip_and_determinism(spark, emb):
    books = similarity.pq_train(emb, m=8, k=8, iters=2)
    assert len(books) == 8 and all(len(b) == 8 and len(b[0]) == 8 for b in books)
    # deterministic across retrains (seeded init + exact means)
    books2 = similarity.pq_train(emb, m=8, k=8, iters=2)
    assert books == books2
    codes = similarity.pq_encode(emb, books).select("codes").collect()
    assert all(0 <= c < 8 for r in codes for c in r.codes)
    assert all(len(r.codes) == 8 for r in codes)


def test_pq_topk_recall_vs_exact(spark, emb, exact_top10):
    # L2-normalize so ADC's L2 ranking serves the cosine contract
    # (||a-b||^2 = 2 - 2cos on unit vectors); cosine itself is
    # scale-invariant, so the exact baseline is unchanged
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize

    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    )
    books = similarity.pq_train(unit, m=8, k=16, iters=2)
    exact = set(exact_top10)
    approx = {
        r.vec_id
        for r in similarity.pq_topk(unit, query_vec_id=0, codebooks=books, k=10).collect()
    }
    assert len(approx) == 10
    # pure ADC on 32x-compressed codes of near-random vectors: weak but
    # nontrivial (the sf0.001 corpus has razor-thin similarity margins)
    assert len(exact & approx) >= 1, (exact, approx)
    # the production shape — ADC shortlist + exact rerank (FAISS refine):
    # recall tracks shortlist coverage
    rr = {
        r.vec_id
        for r in similarity.pq_topk(
            unit, query_vec_id=0, codebooks=books, k=10, rerank=100
        ).collect()
    }
    assert len(rr) == 10
    assert len(exact & rr) >= 6, (exact, rr)


def test_pq_train_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(emb, m=7)


def test_ivfpq_full_probe_rerank_tracks_exact(spark, emb, exact_top10):
    """nprobe = K with a wide rerank: every cell probed, shortlist
    re-scored exactly — isolates IVFPQ bookkeeping from recall loss."""
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize

    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    ).cache()
    cents = similarity.sample_centroids(unit, k=4)
    books = similarity.pq_train(
        similarity.ivf_residuals(unit, cents), m=8, k=16, iters=2,
        vec_col="residual",
    )
    full = [
        r.vec_id
        for r in similarity.ivfpq_topk(
            unit, 0, cents, books, k=10, nprobe=4, rerank=100
        ).collect()
    ]
    assert len(full) == 10
    assert len(set(full) & set(exact_top10)) >= 6

    # partial probe stays within the probed cells and returns k rows
    part = similarity.ivfpq_topk(unit, 0, cents, books, k=10, nprobe=2, rerank=50)
    rows = part.collect()
    assert len(rows) == 10
    assigned = {
        r.vec_id: r.cell for r in similarity.ivf_assign(unit, cents).collect()
    }
    probed_cells = {assigned[r.vec_id] for r in rows}
    assert len(probed_cells) <= 2


def test_ivfpq_residual_encoding_beats_raw_on_reconstruction(spark):
    """Residual PQ's reason to exist: on CLUSTERED data, quantizing
    (vector − centroid) reconstructs better than quantizing the raw
    vector with the same budget (on near-orthogonal random data the
    residual is no smaller — so this asserts on synthetic clusters).
    Mean ADC self-distance is the quantization-error proxy."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    true_c = rng.standard_normal((4, 16)) * 2.0
    vecs = [
        (int(i), [float(x) for x in true_c[i % 4] + rng.standard_normal(16) * 0.15], int(i % 4))
        for i in range(400)
    ]
    frame = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).cache()
    cents = similarity.sample_centroids(frame, k=4)
    res = similarity.ivf_residuals(frame, cents)
    books_res = similarity.pq_train(res, m=4, k=8, iters=2, vec_col="residual")
    books_raw = similarity.pq_train(frame, m=4, k=8, iters=2)

    def recon_err(fr, books, vcol):
        enc = similarity.pq_encode(fr, books, vec_col=vcol)
        dec = enc.join(fr.select("vec_id", vcol), "vec_id")
        m = len(books)
        sub = len(books[0][0])
        kk = len(books[0])
        flat_lit = F.array(
            *[F.lit(float(x)) for book in books for cw in book for x in cw]
        )
        err = F.aggregate(
            F.sequence(F.lit(0), F.lit(m * sub - 1)),
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.element_at(F.col(vcol), i + 1)
                - F.element_at(
                    flat_lit,
                    ((i / sub).cast("int") * kk
                     + F.element_at(F.col("codes"), (i / sub).cast("int") + 1))
                    * sub + F.pmod(i, sub) + 1,
                )
            )
            ** 2,
        )
        return dec.select(F.avg(err).alias("e")).collect()[0].e

    e_res = recon_err(res, books_res, "residual")
    e_raw = recon_err(frame, books_raw, "embedding")
    assert e_res < e_raw, (e_res, e_raw)


def test_ivfpq_index_lifecycle(spark, emb, exact_top10, tmp_path):
    """Build the index once into the lakehouse, serve queries from the
    stored codes with partition-pruned cell scans; results match the
    on-the-fly IVFPQ path."""
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    ).cache()
    rep = similarity.build_ivfpq_index(cat, "ann", unit, n_cells=4, m=8, k=16)
    assert rep["encoded_rows"] == unit.count()
    assert rep["version"] == 1
    assert cat.load("ann", "ann_codes").columns == [
        "vec_id", "label", "cell", "codes", "model_version",
    ]

    # partition pruning: probing 2 cells reads a strict subset of dirs'
    # hive partitions (the codes table is partitioned by cell)
    cents, books = similarity.load_ann_model(cat, "ann")
    assert len(cents) == 4 and len(books) == 8

    served = [
        r.vec_id
        for r in similarity.ivfpq_query_index(
            cat, "ann", unit, query_vec_id=0, k=10, nprobe=4, rerank=100
        ).collect()
    ]
    direct = [
        r.vec_id
        for r in similarity.ivfpq_topk(
            unit, 0, cents, books, k=10, nprobe=4, rerank=100
        ).collect()
    ]
    assert served == direct
    assert len(set(served) & set(exact_top10)) >= 6

    # partial probe serves from fewer partitions and still returns k
    part = similarity.ivfpq_query_index(
        cat, "ann", unit, query_vec_id=0, k=10, nprobe=2, rerank=50
    )
    assert part.count() == 10


def test_ivfpq_index_incremental_refresh(spark, emb, tmp_path):
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    ).cache()
    old = unit.filter("vec_id < 400")
    new = unit.filter("vec_id >= 400")
    similarity.build_ivfpq_index(cat, "ann", old, n_cells=4, m=8, k=16)
    rep = similarity.refresh_ivfpq_index(cat, "ann", new)
    assert rep["appended_rows"] == new.count()
    assert rep["total_rows"] == unit.count()
    # a query can now retrieve a freshly-appended vector
    served = similarity.ivfpq_query_index(
        cat, "ann", unit, query_vec_id=0, k=50, nprobe=4, rerank=100
    ).collect()
    assert any(r.vec_id >= 400 for r in served)
    # delta encoding matches what a full rebuild would produce
    cents, books = similarity.load_ann_model(cat, "ann")
    full = similarity.pq_encode(
        similarity.ivf_residuals(unit, cents), books, vec_col="residual"
    )
    stored = cat.load("ann", "ann_codes")
    a = {r.vec_id: (int(r.cell), tuple(r.codes)) for r in full.collect()}
    b = {r.vec_id: (int(r.cell), tuple(r.codes)) for r in stored.collect()}
    assert a == b


def test_ann_rebuild_swap_and_drift_check(spark, emb, tmp_path):
    """The retrain half of the index lifecycle: rebuild_ann_index
    retrains from the surviving corpus and swaps model+codes as two
    version-stamped CAS commits; queries accept only a version-matched
    (model, codes) pair, so a half-swapped window reloads or raises —
    never serves old-model LUTs against new codes; the drift check
    replays the recall contract against the stored index."""
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    ).cache()
    assert similarity.build_ivfpq_index(
        cat, "ann", unit, n_cells=4, m=8, k=16
    )["version"] == 1

    chk = similarity.ann_recall_drift_check(
        cat, "ann", unit, [0, 11], k=10, nprobe=4, rerank=100, floor=0.5
    )
    assert chk["version"] == 1 and 0.0 <= chk["recall_at_k"] <= 1.0
    assert chk["rebuild_due"] is False

    # heavy takedown, then retrain + swap from the survivors
    surv = unit.filter("vec_id % 3 != 1").cache()
    rep = similarity.rebuild_ann_index(cat, "ann", surv, n_cells=4, m=8, k=16)
    assert rep["version"] == 2
    assert rep["encoded_rows"] == surv.count()
    stored = cat.load("ann", "ann_codes")
    assert stored.filter("model_version != 2").count() == 0
    served = similarity.ivfpq_query_index(
        cat, "ann", surv, query_vec_id=0, k=10, nprobe=4, rerank=100
    ).collect()
    assert len(served) == 10 and all(r.vec_id % 3 != 1 for r in served)
    # the drift check reads the new version and the survivors' recall
    chk2 = similarity.ann_recall_drift_check(
        cat, "ann", surv, [0], k=10, nprobe=4, rerank=100, floor=0.5
    )
    assert chk2["version"] == 2 and chk2["rebuild_due"] is False

    # the pre-rebuild pair is still intact history (time travel), so a
    # query that pinned its snapshots before the swap kept serving it
    first = cat.snapshots("ann", "ann_codes")[0].snapshot_id
    old_codes = cat.load("ann", "ann_codes", snapshot_id=first)
    assert old_codes.filter("model_version != 1").count() == 0
    assert old_codes.count() == unit.count()

    # half-swapped window: codes already v3, model still v2 — the query
    # must refuse (after retries) rather than mix the pair
    cat.replace_table(
        "ann", "ann_codes", stored.withColumn("model_version", F.lit(3))
    )
    with pytest.raises(RuntimeError, match="version"):
        similarity.ivfpq_query_index(
            cat, "ann", surv, query_vec_id=0, k=10, nprobe=4, rerank=100
        )
    # completing the swap (a fresh rebuild commits codes v3' then model)
    # restores service
    rep3 = similarity.rebuild_ann_index(cat, "ann", surv, n_cells=4, m=8, k=16)
    assert rep3["version"] == 3
    again = similarity.ivfpq_query_index(
        cat, "ann", surv, query_vec_id=0, k=10, nprobe=4, rerank=100
    )
    assert again.count() == 10


def test_ann_drift_alarm_fires_and_rebuild_recovers(spark, emb, tmp_path):
    """The reason the drift check exists: after the corpus distribution
    shifts, codes encoded under the OLD model keep serving — silently
    wrong — until something measures recall against the CURRENT corpus.
    Drift half the vectors (deterministic sign flip), leave the stored
    index stale: the alarm fires (recall under floor, rebuild_due);
    rebuild from the drifted corpus restores the contract."""
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    ).localCheckpoint()
    similarity.build_ivfpq_index(cat, "ann", unit, n_cells=4, m=8, k=16)

    # deterministic drift: odd ids flip sign (cosine structure between
    # odd and even vectors inverts, so stale ADC shortlists point at
    # what are now the FARTHEST vectors)
    drifted = unit.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 2 == 1,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    ).localCheckpoint()

    stale = similarity.ann_recall_drift_check(
        cat, "ann", drifted, [0, 4], k=10, nprobe=4, rerank=100, floor=0.6
    )
    assert stale["rebuild_due"] is True, stale

    rep = similarity.rebuild_ann_index(cat, "ann", drifted, n_cells=4, m=8, k=16)
    fresh = similarity.ann_recall_drift_check(
        cat, "ann", drifted, [0, 4], k=10, nprobe=4, rerank=100, floor=0.6
    )
    assert fresh["version"] == rep["version"]
    assert fresh["rebuild_due"] is False, fresh
    assert fresh["recall_at_k"] > stale["recall_at_k"]


def test_semdedup_prunes_planted_duplicates(spark):
    """SemDeDup invariants on planted near-duplicates: a cloned vector
    (cosine ~1 with its source, same cell by construction) is dropped in
    favor of the min-id representative; vectors with no near pair keep
    themselves; every duplicate group's kept member is its min id."""
    import math

    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = base.count()
    # plant: clone vec 3 as id n+3 with a tiny deterministic scale (same
    # direction => cosine 1.0 with the original)
    clone = base.filter("vec_id = 3").select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
        "label",
    )
    emb = base.unionByName(clone)
    cents, _ = similarity.kmeans_centroids(emb, k=4, iters=2)
    out = {r.vec_id: r for r in similarity.semdedup(emb, cents, threshold=0.9).collect()}
    assert len(out) == n + 1
    # the clone collapses onto vec 3 (min id of the pair) and is dropped
    assert out[n + 3].cluster_id == 3 and not out[n + 3].is_kept
    assert out[3].cluster_id == 3 and out[3].is_kept
    # group representative is always the group min; singletons keep themselves
    groups: dict[int, list] = {}
    for r in out.values():
        groups.setdefault(r.cluster_id, []).append(r)
    for cid, members in groups.items():
        assert cid == min(m.vec_id for m in members)
        assert sum(m.is_kept for m in members) == 1
        assert next(m for m in members if m.is_kept).vec_id == cid


def test_semdedup_hot_cell_guard_bounds_pairs(spark):
    """Hot-cell guard (``max_cell``): with 90% of vectors collapsing
    into ONE k-means cell (the skewed-boilerplate scenario), the capped
    run completes with at most ``max_cell`` members participating in
    pairing — over-cap members come back as kept singletons — while the
    uncapped run collapses the whole mega-cluster.  Also exercises
    label-free embedding input (ivf_assign passthrough)."""
    import math

    # 90 near-identical vectors (one hot cell) + 10 spread on another axis
    rows = [(i, [1.0, 0.0001 * i, 0.0, 0.0]) for i in range(90)]
    rows += [
        (90 + i, [0.0, 0.0, math.cos((i + 1) * 0.14), math.sin((i + 1) * 0.14)])
        for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    uncapped = similarity.semdedup(emb, cents, threshold=0.999)
    capped = similarity.semdedup(emb, cents, threshold=0.999, max_cell=16)
    assert uncapped.count() == 100 and capped.count() == 100
    # uncapped: the 90 near-identical vectors form one duplicate group
    assert uncapped.filter("NOT is_kept").count() == 89
    # capped: only <=16 hot-cell members were ever paired, so at most 15
    # can be dropped; the rest survive as (false-unique) singletons —
    # the documented recall trade-off, bounded pair count K*max_cell^2/2
    dropped = capped.filter("NOT is_kept").count()
    assert 0 < dropped <= 15
    # every dropped member still resolves to a min-id representative
    reps = capped.filter("NOT is_kept").select("cluster_id").distinct().collect()
    kept_ids = {r.vec_id for r in capped.filter("is_kept").collect()}
    assert all(r.cluster_id in kept_ids for r in reps)


def test_cluster_balanced_sample_caps_every_cell(spark, emb):
    """Balance contract: no cell exceeds per_cell, a cell with fewer
    members keeps them all, ranks are 1..n_kept dense per cell, and the
    selection is deterministic across reruns."""
    cents, _ = similarity.kmeans_centroids(emb, k=8, iters=2)
    out = similarity.cluster_balanced_sample(emb, cents, per_cell=10)
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes.setdefault(r.cell, []).append(r.cell_rank)
    full = {r.cell: 0 for r in similarity.ivf_assign(emb, cents).collect()}
    for r in similarity.ivf_assign(emb, cents).collect():
        full[r.cell] += 1
    for cell, ranks in sizes.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == min(10, full[cell])
    again = {(r.vec_id, r.cell, r.cell_rank) for r in
             similarity.cluster_balanced_sample(emb, cents, per_cell=10).collect()}
    assert again == {(r.vec_id, r.cell, r.cell_rank) for r in rows}


def test_embedding_decontaminate_flags_planted_copy(spark):
    """A training vector that is a tiny perturbation of an eval vector
    must be flagged leaked with that eval id as nearest neighbor; an
    orthogonal vector stays clean.  Plan: eval side broadcasts."""
    base = [1.0] * 8 + [0.0] * 56
    near = [1.0] * 8 + [0.01] * 56          # cosine ~ 0.9997
    ortho = [0.0] * 56 + [1.0] * 8
    evald = spark.createDataFrame(
        [(100, base)], "vec_id long, embedding array<float>"
    )
    train = spark.createDataFrame(
        [(1, near), (2, ortho)], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r for r in
           similarity.embedding_decontaminate(train, evald).collect()}
    assert out[1].leaked and out[1].nearest_eval_id == 100
    assert out[1].max_cosine > 0.99
    assert not out[2].leaked and out[2].max_cosine < 0.1
    plan = (similarity.embedding_decontaminate(train, evald)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan


def test_embedding_decontaminate_ivf_full_probe_equals_exact(spark, emb):
    """nprobe = K must reproduce the exact broadcast-NLJ decision for
    every train vector — separates IVF bookkeeping bugs from genuine
    recall loss."""
    from pyspark.sql import functions as F

    cents = similarity.sample_centroids(emb, k=8)
    train = emb.filter(F.col("vec_id") % 10 != 0)
    evals = emb.filter(F.col("vec_id") % 10 == 0)
    exact = {
        r.vec_id: (r.nearest_eval_id, r.max_cosine, r.leaked)
        for r in similarity.embedding_decontaminate(
            train, evals, threshold=0.5
        ).collect()
    }
    full = {
        r.vec_id: (r.nearest_eval_id, r.max_cosine, r.leaked)
        for r in similarity.embedding_decontaminate_ivf(
            train, evals, cents, nprobe=8, threshold=0.5
        ).collect()
    }
    assert full == exact


def test_embedding_decontaminate_ivf_partial_probe_recall(spark, emb):
    """Partial probing: the IVF max-cosine can never exceed the exact
    one, and at nprobe=4/8 most exact leaks are still flagged."""
    from pyspark.sql import functions as F

    cents = similarity.sample_centroids(emb, k=8)
    train = emb.filter(F.col("vec_id") % 10 != 0)
    evals = emb.filter(F.col("vec_id") % 10 == 0)
    thr = 0.3  # below the sf0.001 max-cosine ceiling (~0.45) so the exact pass flags a real cohort
    exact = {
        r.vec_id: r
        for r in similarity.embedding_decontaminate(
            train, evals, threshold=thr
        ).collect()
    }
    ivf = {
        r.vec_id: r
        for r in similarity.embedding_decontaminate_ivf(
            train, evals, cents, nprobe=4, threshold=thr
        ).collect()
    }
    assert set(ivf) == set(exact)  # coverage-complete either way
    for vid, r in ivf.items():
        if r.max_cosine is not None:
            assert r.max_cosine <= exact[vid].max_cosine + 1e-9
    leaked_exact = {v for v, r in exact.items() if r.leaked}
    assert leaked_exact, "exact pass must flag something at thr=0.3"
    leaked_ivf = {v for v, r in ivf.items() if r.leaked}
    assert not (leaked_ivf - leaked_exact)  # no false positives vs exact
    recall = len(leaked_ivf & leaked_exact) / len(leaked_exact)
    assert recall >= 0.5


def test_ivf_index_round_trip_is_value_identical(spark, emb, tmp_path):
    """decontaminate-with-prebuilt-index == decontaminate-inline, bit for
    bit, including the index's parquet round trip — the frozen-artifact
    contract the admission pipeline relies on."""
    cents = similarity.sample_centroids(emb, k=8)
    train = emb.filter("vec_id % 3 = 0")
    ref = emb.filter("vec_id % 3 <> 0")
    inline = sorted(
        similarity.embedding_decontaminate_ivf(
            train, ref, cents, nprobe=2, threshold=0.8
        ).collect()
    )
    idx = similarity.ivf_index(ref, cents)
    p = str(tmp_path / "emb_index")
    idx.write.parquet(p)
    frozen = sorted(
        similarity.embedding_decontaminate_ivf(
            train, None, cents, nprobe=2, threshold=0.8,
            index=spark.read.parquet(p),
        ).collect()
    )
    assert frozen == inline
    with pytest.raises(ValueError, match="need eval_emb or a prebuilt"):
        similarity.embedding_decontaminate_ivf(train, None, cents)
    with pytest.raises(ValueError, match="centroids is empty"):
        similarity.ivf_index(ref, [])


def test_ivf_prebuilt_index_broadcasts_probe_side(spark, emb):
    """Broadcast asymmetry (r10 ADVICE): with a PREBUILT index the index
    is the persistent, possibly corpus-sized side, so the PROBE side
    must be the broadcast build side (BuildLeft — the probe is the left
    join input); inline eval stays broadcast (the eval benchmark is the
    small side there).  BuildLeft can only come from our explicit hint:
    the operator's other join is left-outer, which only builds right."""
    cents = similarity.sample_centroids(emb, k=8)
    train = emb.filter("vec_id % 3 = 0")
    ref = emb.filter("vec_id % 3 <> 0")
    idx = similarity.ivf_index(ref, cents)
    plan_index = (
        similarity.embedding_decontaminate_ivf(
            train, None, cents, nprobe=2, index=idx
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BuildLeft" in plan_index
    plan_inline = (
        similarity.embedding_decontaminate_ivf(train, ref, cents, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BuildLeft" not in plan_inline
    assert "BroadcastExchange" in plan_inline


def test_ann_recall_datasheet_matches_hand_computed_sets(spark):
    """The datasheet's recall columns must equal recalls computed
    independently from the underlying top-k sets, and respect the
    published floors: PQ with a 100-wide exact rerank covers k=10
    fully on this data; IVF probing half the cells keeps most of the
    exact set; every recall is in [0, 1]."""
    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.plans.pipeline import _PLANES
    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

    row = QUERY_SPECS["ann_recall_datasheet"].build(spark, SF).collect()[0]
    emb = table(spark, SF, "embeddings")
    cents = similarity.sample_centroids(emb, k=8)
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    )
    books = similarity.pq_train(unit, m=8, k=16, iters=1)
    exact = {r.vec_id for r in
             similarity.brute_force_topk(emb, 0, k=10).collect()}
    hand = {
        "recall_ivf": {r.vec_id for r in
                       similarity.ivf_topk(emb, 0, cents, k=10, nprobe=4).collect()},
        "recall_lsh": {r.vec_id for r in
                       similarity.lsh_topk(emb, 0, _PLANES, k=10).collect()},
        "recall_pq": {r.vec_id for r in
                      similarity.pq_topk(unit, 0, books, k=10, rerank=100).collect()},
    }
    for name, ids in hand.items():
        want = round(len(ids & exact) / 10.0, 4)
        assert getattr(row, name) == want, (name, want)
        assert 0.0 <= getattr(row, name) <= 1.0
    # floors (data-informed at sf0.001: ivf 1.0, pq 0.7, lsh 0.1 —
    # 100 near-orthogonal vectors are LSH's worst case; the datasheet's
    # job is exactly to surface that): PQ's 100-wide exact rerank keeps
    # the clear majority, IVF probing half the cells keeps most
    assert row.recall_pq >= 0.6
    assert row.recall_ivf >= 0.5
    assert (row.k, row.ivf_cells, row.ivf_nprobe) == (10, 8, 4)
