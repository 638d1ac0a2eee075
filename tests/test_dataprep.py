"""Composed pretraining-prep flow: gate -> dedup -> quota -> pack."""

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.pipelines.dataprep import prep_documents


def test_prep_documents_matches_sequential_reference():
    rng = np.random.default_rng(21)
    words = ["alpha", "bravo", "charlie", "delta", "echo"]
    n = 400
    texts = [" ".join(rng.choice(words, size=rng.integers(15, 40))) for _ in range(n)]
    texts[5] = texts[0]          # exact dup -> min-id survives
    texts[7] = "tiny"            # fails min_tokens
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["web", "book", "code"], size=n),
            "text": texts,
        }
    )
    got = (
        prep_documents(rd.from_pandas(df), quota_cap=60, capacity=256)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # reference chain in pandas
    s = df["text"].astype(str)
    n_chars = s.str.len()
    tok_chars = n_chars - s.str.count(r"\s")
    n_tokens = s.str.count(r"\S+")
    ref = df.assign(n_tokens=n_tokens)[
        (tok_chars / n_chars.clip(lower=1) >= 0.8) & (n_tokens >= 20)
    ]
    ref = ref.sort_values("doc_id").drop_duplicates(subset=["text"], keep="first")
    ref["__key"] = [hashlib.md5(f"{i}:42".encode()).hexdigest() for i in ref["doc_id"]]
    ref = ref.sort_values(["__key", "doc_id"]).groupby("source", sort=False).head(60)
    ref = ref.sort_values("doc_id")
    before = ref["n_tokens"].cumsum() - ref["n_tokens"]
    ref["seq_id"] = (before // 256).astype(np.int64)
    ref = ref[["doc_id", "source", "n_tokens", "seq_id"]].reset_index(drop=True)

    pd.testing.assert_frame_equal(got[["doc_id", "source", "n_tokens", "seq_id"]], ref)
    assert 5 not in set(got["doc_id"]) and 7 not in set(got["doc_id"])
    assert 0 in set(got["doc_id"])


def test_partitioned_write_and_pruned_read(ray_session, tmp_path, monkeypatch):
    import glob
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.dataprep import read_prepped, write_prepped

    df = pd.DataFrame(
        {
            "id": np.arange(300, dtype=np.int64),
            "group": np.repeat(["a", "b", "c"], 100),
            "seq_id": np.arange(300, dtype=np.int64) // 16,
        }
    )
    out = str(tmp_path / "prepped")
    write_prepped(rd.from_pandas(df), out, partition_col="group")
    # one directory per group: a failed run skips finished partitions
    assert {os.path.basename(d) for d in glob.glob(f"{out}/group=*")} == {
        "group=a", "group=b", "group=c",
    }
    # pruned read: only the requested group's files are opened
    got = read_prepped(out, groups=["b"]).to_pandas()
    assert len(got) == 100 and (got["id"] // 100 == 1).all()
    assert read_prepped(out).count() == 300
