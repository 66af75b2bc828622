"""tools/gen_sf.py fidelity: the generated dataset must be a drop-in
for the driver's read-only testdata — same physical parquet schemas,
same scaling laws, deterministic at a fixed seed. (The sf1 sweep's
validity rests on this: BASELINE.md round-11 row.)"""

from __future__ import annotations

import importlib.util
import os

import pyarrow.parquet as pq
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _gen(sf, out, seed=42):
    spec = importlib.util.spec_from_file_location(
        "gen_sf", os.path.join(os.path.dirname(__file__), "..", "tools", "gen_sf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.generate(sf, out, seed)


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf0.01")
    rows = _gen(0.01, out)
    return out, rows


def test_schemas_match_driver_testdata(gen_dir):
    out, _ = gen_dir
    for t in TABLES:
        ours = pq.read_schema(f"{out}/{t}.parquet")
        theirs = pq.read_schema(f"/root/testdata/sf0.01/{t}.parquet")
        for f in theirs:
            g = ours.field(f.name)
            assert g.type == f.type, (t, f.name, g.type, f.type)
        assert ours.names == theirs.names, t


def test_scaling_laws_and_row_counts(gen_dir):
    _, rows = gen_dir
    assert rows == {
        "region": 5, "nation": 25, "customer": 1500, "supplier": 100,
        "part": 2000, "orders": 15000, "lineitem": 60000, "events": 10000,
        "documents": 500, "embeddings": 500,
    }


def test_deterministic_at_fixed_seed(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _gen(0.001, a)
    _gen(0.001, b)
    for t in ("lineitem", "events", "documents", "embeddings"):
        ta = pq.read_table(f"{a}/{t}.parquet")
        tb = pq.read_table(f"{b}/{t}.parquet")
        assert ta.equals(tb), t


def test_events_fifo_contract(gen_dir):
    """event_id order == ts order (the topic layer's §8-H5 contract,
    which the sessionize/streaming lanes assume)."""
    out, _ = gen_dir
    t = pq.read_table(f"{out}/events.parquet", columns=["event_id", "ts"])
    ts = t.column("ts").to_pylist()
    eid = t.column("event_id").to_pylist()
    assert eid == sorted(eid)
    assert ts == sorted(ts)
