"""Composed continuous flow: probe-dedup -> append -> extend -> view refresh.

Ground truth is the sequential greedy reference from the ingest-dedup tests
(history wins; within a batch ascending id); the maintained view must equal
GROUP BY over the accepted set after every batch, and a crash between the
append commit and the derived-state updates must be healed by the next
call's catch-up step."""

import json

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from quanterra_pipeline_ray.functions.dedup import ngram_jaccard
from quanterra_pipeline_ray.pipelines import continuous as C


def _mk(ids, texts, langs=None):
    n = len(ids)
    return pd.DataFrame(
        {
            "doc_id": np.asarray(ids, dtype=np.int64),
            "text": texts,
            "lang": langs if langs is not None else ["en"] * n,
        }
    )


def _greedy_reference(batches, threshold=0.8):
    accepted = []  # (id, text, lang)
    for df in batches:
        kept_now = []
        for i, t, lg in sorted(zip(df["doc_id"], df["text"], df["lang"])):
            blocked = any(
                ngram_jaccard(t, t2, 5) >= threshold for _, t2, _ in accepted + kept_now
            )
            if not blocked:
                kept_now.append((int(i), t, lg))
        accepted.extend(kept_now)
    return accepted


def _batches(seed=17):
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]

    def text():
        return " ".join(rng.choice(words, size=30))

    base = [text() for _ in range(10)]
    b0 = _mk(range(0, 11), base + [base[0]], ["en"] * 5 + ["de"] * 5 + ["en"])
    b1 = _mk(range(100, 105), [base[1], base[2]] + [text() for _ in range(3)],
             ["fr", "de", "en", "fr", "de"])
    b2 = _mk(range(200, 203), [b1["text"].iloc[3], text(), text()], ["en", "de", "fr"])
    return [b0, b1, b2]


def _expected_view(accepted):
    counts = pd.Series([lg for _, _, lg in accepted]).value_counts()
    return {str(k): int(v) for k, v in counts.items()}


def _got_view(store):
    v = C.read_view(store, "lang").to_pandas()
    return {str(r["lang"]): int(r["n_docs"]) for _, r in v.iterrows()}


def test_flow_view_matches_sequential_reference(ray_session, tmp_path):
    batches = _batches()
    store = str(tmp_path / "store")
    for b in batches:
        C.ingest_with_views(store, rd.from_pandas(b), view_key="lang", n_buckets=16)
    accepted = _greedy_reference(batches)
    assert _got_view(store) == _expected_view(accepted)

    # the table holds exactly the accepted docs
    from quanterra_pipeline_ray.schema import schema_from_json
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    state = json.load(open(f"{store}/flow_state.json"))
    table = TranscriptTable(f"{store}/table", schema=schema_from_json(state["schema"]))
    got_ids = set(table.scan().to_pandas()["doc_id"].astype(int))
    assert got_ids == {i for i, _, _ in accepted}
    # derived state is caught up to the table
    assert state["indexed_snapshot"] == table.current_snapshot_id()
    assert state["view_snapshot"] == table.current_snapshot_id()


def test_flow_crash_resume_heals_derived_state(ray_session, tmp_path):
    """Crash between the append commit and extend/view refresh: the next
    ingest call replays the changelog into the index and view first, so the
    final state is identical to the uncrashed run."""
    batches = _batches(seed=29)

    # uncrashed control run
    control = str(tmp_path / "control")
    for b in batches:
        C.ingest_with_views(control, rd.from_pandas(b), view_key="lang", n_buckets=16)

    # crashed run: batch 1's extend raises AFTER the append committed
    store = str(tmp_path / "crash")
    C.ingest_with_views(store, rd.from_pandas(batches[0]), view_key="lang", n_buckets=16)

    real_extend = C.extend_jaccard_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash after append, before extend")

    C.extend_jaccard_index = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            C.ingest_with_views(store, rd.from_pandas(batches[1]), view_key="lang", n_buckets=16)
    finally:
        C.extend_jaccard_index = real_extend

    # derived state lags the table
    state = json.load(open(f"{store}/flow_state.json"))
    from quanterra_pipeline_ray.schema import schema_from_json
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    table = TranscriptTable(f"{store}/table", schema=schema_from_json(state["schema"]))
    assert state["indexed_snapshot"] < table.current_snapshot_id()

    # next batch catches up, then proceeds; end state == control
    C.ingest_with_views(store, rd.from_pandas(batches[2]), view_key="lang", n_buckets=16)
    assert _got_view(store) == _got_view(control)
    state = json.load(open(f"{store}/flow_state.json"))
    assert state["indexed_snapshot"] == table.current_snapshot_id()
    assert state["view_snapshot"] == table.current_snapshot_id()

    control_state = json.load(open(f"{control}/flow_state.json"))
    ctable = TranscriptTable(
        f"{control}/table", schema=schema_from_json(control_state["schema"])
    )
    got = set(table.scan().to_pandas()["doc_id"].astype(int))
    want = set(ctable.scan().to_pandas()["doc_id"].astype(int))
    assert got == want


def test_read_view_fresh_store_is_typed_empty(ray_session, tmp_path):
    v = C.read_view(str(tmp_path / "nothing"), "lang")
    assert v.count() == 0
    assert set(v.schema().names) == {"lang", "n_docs"}


def test_verify_index_coverage_detects_and_heals(ray_session, tmp_path):
    """Coverage checker: consistent after each flow call; a table append
    WITHOUT extend (the crash window) is flagged as missing docs; the next
    flow call's catch-up heals it."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.continuous import (
        _TABLE,
        ingest_with_views,
        verify_index_coverage,
    )
    from quanterra_pipeline_ray.schema import schema_from_json
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    store = str(tmp_path / "covstore")
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [f"doc number {i} with words {i % 7} {i % 5} etc" for i in range(40)],
            "lang": ["en"] * 40,
        }
    )
    ingest_with_views(store, rd.from_pandas(docs.iloc[:20]), view_key="lang", n_buckets=8)
    rep = verify_index_coverage(store)
    assert rep["consistent"], rep

    # simulate the crash window: append directly, no extend
    import json, os

    state = json.load(open(os.path.join(store, "flow_state.json")))
    table = TranscriptTable(os.path.join(store, _TABLE), schema=schema_from_json(state["schema"]))
    table.append_table(pa.Table.from_pandas(docs.iloc[20:30], preserve_index=False))
    rep = verify_index_coverage(store)
    assert not rep["consistent"] and rep["missing_from_index"] == 10
    assert rep["extra_in_index"] == 0 and len(rep["sample_missing"]) == 10

    # the next flow call catches up the index first; coverage heals
    ingest_with_views(store, rd.from_pandas(docs.iloc[30:]), view_key="lang", n_buckets=8)
    rep = verify_index_coverage(store)
    assert rep["consistent"], rep


def test_expire_views_keeps_current(ray_session, tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.continuous import (
        expire_views,
        ingest_with_views,
        read_view,
    )

    store = str(tmp_path / "ev")
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "text": [f"text {i} alpha beta {i % 3}" for i in range(30)],
            "lang": ["en", "fr", "de"] * 10,
        }
    )
    for b in range(3):
        ingest_with_views(store, rd.from_pandas(docs[docs["doc_id"] % 3 == b]),
                          view_key="lang", n_buckets=8)
    vroot = os.path.join(store, "view")
    before = len(os.listdir(vroot))
    assert before >= 3
    rep = expire_views(store, keep=1)
    assert rep["removed"] == before - 1
    # the CURRENT view still reads
    v = read_view(store, "lang").to_pandas()
    assert v["n_docs"].sum() == 30
