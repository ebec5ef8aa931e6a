"""Arrow IPC source/sink: bit-exact roundtrip + idempotent retries."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from engine.ipcio import read_ipc, write_ipc

SF = "/root/testdata/sf0.001"


def test_ipc_roundtrip_bit_exact(tmp_path):
    """timestamp[us], float64, list<float> all survive IPC exactly —
    the fidelity tier JSONL/CSV can't give."""
    out = str(tmp_path / "ipc")
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    n = write_ipc(ev, out, clean=True)
    back = read_ipc(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    orig = ev.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert n == len(orig)
    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)
    # embeddings: list<float> column
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out2 = str(tmp_path / "ipc2")
    write_ipc(emb, out2, clean=True)
    b = read_ipc(out2).to_pandas().sort_values("vec_id").reset_index(drop=True)
    o = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert all(
        np.array_equal(x, y) for x, y in zip(b["embedding"], o["embedding"])
    )


def test_ipc_sink_idempotent_and_tmp_ignored(tmp_path):
    """Rewriting the same dataset lands on the same content-hash names
    (retry semantics); stray *.tmp files are never read back."""
    out = str(tmp_path / "ipc")
    df = pd.DataFrame({"a": np.arange(50, dtype="int64")})
    ds = ray.data.from_pandas(df).repartition(4)
    write_ipc(ds, out, clean=True)
    first = sorted(os.listdir(out))
    write_ipc(ds, out)  # no clean: retry/re-run must not duplicate
    assert sorted(os.listdir(out)) == first
    with open(os.path.join(out, "part-dead.arrow.tmp999"), "wb") as f:
        f.write(b"garbage")
    back = read_ipc(out).to_pandas()
    assert sorted(back["a"]) == list(range(50))
