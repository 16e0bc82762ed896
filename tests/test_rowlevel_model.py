"""Model-based randomized test for the row-level write path: a seeded
sequence of append / delete / update / merge / rollback operations applied
both to the lakehouse table and to a plain in-memory model; after every
step the table must equal the model exactly.  Catches interaction bugs
(e.g. a rewrite mis-carrying a dir after a merge that followed a rollback)
that single-operation tests cannot."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"), name="cld")


def _to_df(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(rows.items())], "id long, val long"
    )


def _snapshot_state(cat):
    return {r.id: r.val for r in cat.load("db", "t").collect()}


def test_randomized_op_sequence_matches_model(spark, cat):
    rng = random.Random(20240814)
    model: dict[int, int] = {i: i * 10 for i in range(40)}
    cat.create_table("db", "t", _to_df(spark, model))
    history = [dict(model)]  # model state per snapshot id (1-based)
    next_id = 1000

    for step in range(18):
        op = rng.choice(["append", "delete", "update", "merge", "rollback"])
        if op == "append":
            fresh = {next_id + i: rng.randrange(1000) for i in range(rng.randrange(1, 8))}
            next_id += 10
            cat.append("db", "t", _to_df(spark, fresh))
            model.update(fresh)
            history.append(dict(model))
        elif op == "delete":
            if not model:
                continue
            cut = rng.choice(sorted(model))
            snap = cat.delete_where("db", "t", [("id", ">=", cut)])
            new_model = {k: v for k, v in model.items() if k < cut}
            if new_model != model:
                model = new_model
                history.append(dict(model))
        elif op == "update":
            if not model:
                continue
            lo = rng.choice(sorted(model))
            snap = cat.update_where(
                "db", "t", {"val": F.col("val") + 1}, [("id", "<=", lo)]
            )
            new_model = {k: (v + 1 if k <= lo else v) for k, v in model.items()}
            if new_model != model:
                model = new_model
                history.append(dict(model))
        elif op == "merge":
            keys = rng.sample(sorted(model), min(3, len(model))) if model else []
            src = {k: rng.randrange(1000) for k in keys}
            src[next_id] = rng.randrange(1000)  # one insert
            next_id += 10
            cat.merge_into(
                "db", "t", _to_df(spark, src), on=["id"],
                when_matched_update={"val": "s.val"},
                when_not_matched_insert=True,
            )
            model.update(src)
            history.append(dict(model))
        elif op == "rollback":
            if len(history) < 2:
                continue
            target = rng.randrange(1, len(history))  # snapshot ids are 1-based
            cat.rollback_to_snapshot("db", "t", target)
            model = dict(history[target - 1])
            history.append(dict(model))

        state = _snapshot_state(cat)
        assert state == model, f"divergence at step {step} after {op}"
        assert cat.current_snapshot("db", "t").row_count == len(model)

    # every historical snapshot still reads back its own model state
    for sid, m in enumerate(history, start=1):
        got = {r.id: r.val for r in cat.load("db", "t", snapshot_id=sid).collect()}
        assert got == m, f"time travel to snapshot {sid} diverged"
