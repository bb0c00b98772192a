"""MERGE (upsert) — the batch CDC primitive.

Spark has no single MERGE INTO operator on plain parquet (that lives in
table formats layered above), but the relational algebra is two ops:
keep target rows with no update (left anti join on the key), then union
the updates. At 100 TB both sides shuffle on the merge key once; if the
changeset is small — the common CDC case — the anti join broadcasts it
and the target never shuffles at all.

Heritage: north-star ETL surface; the reference overwrites outputs whole
(main.cc:158-172), it has no incremental path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: list[str] | str,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` by ``key``: matched target rows are
    replaced, unmatched update rows are inserted. Both inputs must share a
    schema; update keys must be unique (enforce upstream — last-writer-wins
    needs an explicit version column and a window, not silent duplicates).

    ``broadcast_updates`` hints the anti join for the small-changeset case;
    AQE falls back to shuffle join when the hint is wrong at runtime.
    """
    keys = [key] if isinstance(key, str) else list(key)
    missing = [c for c in target.columns if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing merge columns: {missing}")
    upd = updates.select(*target.columns)
    right = F.broadcast(upd.select(*keys)) if broadcast_updates else upd.select(*keys)
    kept = target.join(right, on=keys, how="left_anti")
    return kept.unionByName(upd)


def merge_apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key: list[str] | str,
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a full insert/update/delete change feed: rows whose ``op_col``
    is ``'D'`` remove the target key, everything else upserts — the MERGE
    INTO ... WHEN MATCHED [AND op='D'] THEN DELETE shape on plain parquet.

    Same algebra as :func:`merge_upsert` with one twist: the anti join
    removes ALL changed keys (deleted AND replaced), and only the non-delete
    change rows union back in. One pass, one anti join — deletes cost
    nothing extra. Change keys must be unique (resolve last-writer-wins
    upstream with a version column + window, as streaming/upsert.py does).

    A NULL ``op_col`` is a malformed feed row: it is IGNORED (neither
    deletes nor upserts) rather than silently deleting — the anti-join key
    set is built from the delete and upsert rows only, never from raw
    ``changes`` (where a NULL-op key would vanish from the target without
    a replacement row).
    """
    keys = [key] if isinstance(key, str) else list(key)
    upserts = changes.filter(
        F.col(op_col).isNotNull() & (F.col(op_col) != "D")
    ).select(*target.columns)
    del_keys = changes.filter(F.col(op_col) == "D").select(*keys)
    change_keys = del_keys.unionByName(upserts.select(*keys))
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    kept = target.join(change_keys, on=keys, how="left_anti")
    return kept.unionByName(upserts)
