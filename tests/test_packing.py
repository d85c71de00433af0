"""Sequence packing (operators/packing.py): the exporter's fold of
token-counted chunks into fixed-budget training rows.

Pins the three contracts the training_pack registry row builds on:

- determinism: pack assignment is a pure function of the row key —
  identical across runs AND across input partitionings (the
  write_training_shards discipline extended to packing);
- budget algebra: cut segments tile each pack exactly (every pack but
  a shard's last holds precisely ``budget`` tokens, no gaps/overlaps);
  next-fit never overfills a pack and never splits an item;
- loader metadata: boundary flags reassemble every item from its
  segments.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import packing as P

BUDGET = 100


def _items(spark, n=200, parts=4):
    """Deterministic token-counted items: sizes 1..60, several shards."""
    rows = [(i % 5, i * 2654435761 % 997, i, 1 + (i * 37) % 60) for i in range(n)]
    return spark.createDataFrame(
        rows, "shard int, ord long, chunk_index long, token_count long"
    ).repartition(parts)


def test_cut_segments_tile_packs_exactly(spark):
    segs = P.pack_cut(
        _items(spark), BUDGET, order_cols=("ord", "chunk_index"),
        keep=("chunk_index",),
    ).collect()
    by_pack: dict = {}
    for r in segs:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pack), rows in by_pack.items():
        rows.sort(key=lambda r: r.pos_in_pack)
        # segments tile [0, fill) with no gaps or overlaps
        at = 0
        for r in rows:
            assert r.pos_in_pack == at, (shard, pack)
            assert r.seg_tokens >= 1
            at += r.seg_tokens
        assert at <= BUDGET
    # every pack except each shard's LAST is exactly full
    last = {}
    for shard, pack in by_pack:
        last[shard] = max(last.get(shard, -1), pack)
    for (shard, pack), rows in by_pack.items():
        if pack != last[shard]:
            assert sum(r.seg_tokens for r in rows) == BUDGET


def test_cut_boundary_flags_reassemble_items(spark):
    items = _items(spark)
    segs = P.pack_cut(
        items, BUDGET, order_cols=("ord", "chunk_index"), keep=("chunk_index",)
    ).collect()
    by_item: dict = {}
    for r in segs:
        by_item.setdefault((r.shard, r.chunk_index), []).append(r)
    expect = {
        (r.shard, r.chunk_index): r.token_count for r in items.collect()
    }
    assert set(by_item) == set(expect)
    for key, rows in by_item.items():
        rows.sort(key=lambda r: (r.pack_id, r.pos_in_pack))
        assert sum(r.seg_tokens for r in rows) == expect[key]
        assert [r.starts_item for r in rows] == [1] + [0] * (len(rows) - 1)
        assert [r.ends_item for r in rows] == [0] * (len(rows) - 1) + [1]
        # spanning segments sit on consecutive packs
        assert [r.pack_id for r in rows] == list(
            range(rows[0].pack_id, rows[0].pack_id + len(rows))
        )


def test_nextfit_never_overfills_never_splits(spark):
    out = P.pack_nextfit(
        _items(spark), BUDGET, order_cols=("ord", "chunk_index")
    ).collect()
    fills: dict = {}
    for r in out:
        key = (r.shard, r.pack_id)
        fills[key] = fills.get(key, 0) + r.token_count
        # whole items only: the slot [pos, pos+tc) fits the pack
        assert r.pos_in_pack + r.token_count <= BUDGET
    assert all(v <= BUDGET for v in fills.values())
    # greedy: an item in pack p+1 would NOT have fit pack p's fill
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r.ord, r.chunk_index))
        for a, b in zip(rows, rows[1:]):
            if b.pack_id != a.pack_id:
                assert b.pack_id == a.pack_id + 1
                assert a.pos_in_pack + a.token_count + b.token_count > BUDGET


@pytest.mark.parametrize("fold", [P.pack_cut, P.pack_nextfit])
def test_pack_assignment_partitioning_invariant(spark, fold):
    """Identical assignment across runs and input partitionings — the
    export determinism contract (never a function of scheduling)."""
    kw = dict(order_cols=("ord", "chunk_index"))
    if fold is P.pack_cut:
        kw["keep"] = ("chunk_index",)
    a = sorted(map(tuple, fold(_items(spark, parts=1), BUDGET, **kw).collect()))
    b = sorted(map(tuple, fold(_items(spark, parts=7), BUDGET, **kw).collect()))
    assert a == b and len(a) > 0


def test_write_packed_shards_deterministic(spark, tmp_path):
    """Two writes of the same corpus land byte-identical pack order in
    every shard directory (shard leads the sort, so FileFormatWriter
    cannot re-order)."""
    packed = P.pack_nextfit(_items(spark), BUDGET, order_cols=("ord", "chunk_index"))
    outs = []
    for d in ("w1", "w2"):
        path = str(tmp_path / d)
        P.write_packed_shards(
            packed, path, order_cols=("pack_id", "pos_in_pack")
        )
        got = []
        for s in range(5):
            rows = spark.read.parquet(f"{path}/shard={s}").collect()
            got.append([tuple(r) for r in rows])
        outs.append(got)
    assert outs[0] == outs[1]
    # intra-shard file order IS pack order
    for shard_rows in outs[0]:
        keys = [(r[-2], r[-1]) for r in shard_rows]  # (pack_id, pos_in_pack)
        assert keys == sorted(keys)


def test_oversized_item_gets_its_own_pack(spark):
    rows = [(0, 1, 0, 40), (0, 2, 1, 150), (0, 3, 2, 40)]
    df = spark.createDataFrame(
        rows, "shard int, ord long, chunk_index long, token_count long"
    )
    out = sorted(
        P.pack_nextfit(df, BUDGET, order_cols=("ord", "chunk_index")).collect(),
        key=lambda r: r.ord,
    )
    assert [r.pack_id for r in out] == [0, 1, 2]
    assert [r.pos_in_pack for r in out] == [0, 0, 0]
