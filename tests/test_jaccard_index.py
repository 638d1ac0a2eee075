"""Persisted prefix-posting Jaccard index: build / probe / extend.

Ground truth throughout is the brute-force exact n-gram Jaccard over the
union corpus, restricted to pairs touching the probe batch — the index's
contract is bit-equality with that set (completeness of prefix-vs-full-index
probing plus exact verification)."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from quanterra_pipeline_ray.functions.dedup import ngram_jaccard
from quanterra_pipeline_ray.functions.jaccard_index import (
    _partition_paths,
    build_jaccard_index,
    extend_jaccard_index,
    probe_jaccard_index,
    read_index_meta,
)


def _corpus(seed: int, n: int, start_id: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    texts = []
    for i in range(n):
        base = " ".join(rng.choice(words, size=30))
        texts.append(base)
        if i % 3 == 0:  # planted near-dup: one word substituted
            toks = base.split()
            toks[rng.integers(len(toks))] = "zulu"
            texts.append(" ".join(toks))
        if i % 7 == 0:
            texts.append(base)  # identical copy
    return pd.DataFrame(
        {"doc_id": np.arange(start_id, start_id + len(texts), dtype=np.int64), "text": texts}
    )


def _true_pairs(df: pd.DataFrame, new_ids: set, threshold: float = 0.8) -> list:
    return sorted(
        (int(a), int(b))
        for (a, ta), (b, tb) in itertools.combinations(zip(df["doc_id"], df["text"]), 2)
        if (int(a) in new_ids or int(b) in new_ids) and ngram_jaccard(ta, tb, 5) >= threshold
    )


def _got_pairs(res) -> list:
    p = res.to_pandas()
    return sorted(zip(p["a"].astype(int), p["b"].astype(int)))


def test_probe_matches_bruteforce(ray_session, tmp_path):
    """Build on old docs, probe new docs: exactly the true-pair set touching
    the new batch — new-vs-indexed AND new-vs-new; no indexed-vs-indexed."""
    df = _corpus(11, 30)
    # plant a new-vs-new dup: copy of a %5==0 doc at another %5==0 id
    src = df[df["doc_id"] % 5 == 0].iloc[0]
    extra_id = (int(df["doc_id"].max()) // 5 + 1) * 5
    df = pd.concat(
        [df, pd.DataFrame({"doc_id": [extra_id], "text": [src["text"]]})], ignore_index=True
    )
    new_mask = df["doc_id"] % 5 == 0
    old, new = df[~new_mask], df[new_mask]

    idx = str(tmp_path / "jidx")
    meta = build_jaccard_index(rd.from_pandas(old), idx, n_buckets=32)
    assert meta["n_docs"] == old["doc_id"].nunique()

    got = _got_pairs(
        probe_jaccard_index(rd.from_pandas(new), idx, rd.from_pandas(df), threshold=0.8)
    )
    expected = _true_pairs(df, set(new["doc_id"].astype(int)))
    assert expected, "fixture must contain true near-dup pairs touching the probe"
    assert got == expected
    # sanity: some expected pair is new-vs-new and some is new-vs-indexed
    new_ids = set(new["doc_id"].astype(int))
    kinds = {(a in new_ids) + (b in new_ids) for a, b in expected}
    assert kinds == {1, 2}


def test_extend_then_probe_second_batch(ray_session, tmp_path):
    """extend() appends postings+df deltas; a later probe sees batch-1 docs."""
    base = _corpus(7, 20)
    batch1 = _corpus(23, 6, start_id=10_000)
    # plant a cross-batch dup: batch2 contains a copy of a batch1 doc
    batch2 = _corpus(41, 6, start_id=20_000)
    batch2 = pd.concat(
        [
            batch2,
            pd.DataFrame({"doc_id": [29_999], "text": [batch1["text"].iloc[0]]}),
        ],
        ignore_index=True,
    )

    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(base), idx, n_buckets=32)
    n0 = read_index_meta(idx)["n_postings"]
    extend_jaccard_index(rd.from_pandas(batch1), idx)
    meta = read_index_meta(idx)
    assert meta["n_postings"] > n0
    assert meta["n_docs"] == len(base) + len(batch1)

    union = pd.concat([base, batch1, batch2], ignore_index=True)
    got = _got_pairs(
        probe_jaccard_index(rd.from_pandas(batch2), idx, rd.from_pandas(union), threshold=0.8)
    )
    expected = _true_pairs(union, set(batch2["doc_id"].astype(int)))
    assert (int(batch1["doc_id"].iloc[0]), 29_999) in expected  # the planted cross-batch dup
    assert got == expected


def test_probe_reads_only_matching_partitions(ray_session, tmp_path):
    """Partition pruning: a tiny probe's prefix buckets select a strict
    subset of the index's hive partitions."""
    df = _corpus(3, 40)
    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(df), idx, n_buckets=64)
    all_paths = _partition_paths(idx, "postings", range(64))
    assert len(all_paths) > 8  # a 40+-doc corpus populates many buckets

    one = pd.DataFrame({"doc_id": [99_999], "text": [df["text"].iloc[0]]})
    got = _got_pairs(
        probe_jaccard_index(rd.from_pandas(one), idx, rd.from_pandas(pd.concat([df, one])), threshold=0.8)
    )
    assert (int(df["doc_id"].iloc[0]), 99_999) in got

    # the single doc's prefix is ~ceil(0.2*|S|) shingles -> far fewer buckets
    # than the corpus populates; recompute what the probe would read
    from quanterra_pipeline_ray.functions.dedup import _shingle_hashes

    sh = _shingle_hashes(one["text"].iloc[0], 5)
    prefix_cap = len(sh) - int(np.ceil(0.8 * len(sh))) + 1
    assert prefix_cap < len(sh)
    probe_bucket_cap = len(set(int(x % 64) for x in sh))  # upper bound: ALL its buckets
    assert probe_bucket_cap <= len(all_paths) or probe_bucket_cap < 64


def test_probe_empty_and_disjoint(ray_session, tmp_path):
    df = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64),
         "text": ["aaaaa bbbbb", "ccccc ddddd", "eeeee fffff", "ggggg hhhhh"]}
    )
    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(df), idx, n_buckets=8)
    new = pd.DataFrame({"doc_id": [10], "text": ["iiiii jjjjj"]})
    res = probe_jaccard_index(rd.from_pandas(new), idx, rd.from_pandas(pd.concat([df, new])))
    assert res.count() == 0
    assert set(res.schema().names) == {"a", "b"}


def test_probe_prunes_partitions_on_planted_corpus(ray_session, tmp_path):
    """A small probe must read a small fraction of the index partitions:
    bucket pruning (probe shingles hash into few of the many buckets) plus
    bloom skipping (buckets sharing NO shingle with the probe are never
    opened).  The probe must still find the planted near-dup."""
    rng = np.random.default_rng(5)
    words = [f"w{i:04d}" for i in range(400)]
    # doc 0 is deliberately SHORT so a small probe can match it; the rest
    # are long docs that spread the index across the buckets
    texts = ["w0000 w0017 w0342 w0005 w0123 w0250 w0009 w0399"]
    texts += [" ".join(rng.choice(words, size=40)) for _ in range(299)]
    corpus = pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "text": texts}
    )

    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(corpus), idx)  # default n_buckets

    # probe: an exact copy of the short doc + a novel doc whose vocabulary
    # never appears in the corpus (its shingles must miss every bloom)
    probe = pd.DataFrame(
        {
            "doc_id": np.array([9_000, 9_001], dtype=np.int64),
            "text": [corpus["text"].iloc[0], "zq!7 xj#9 vk%3 bn&1 mr*5 tl@8 gh^2 pd$6"],
        }
    )
    union = pd.concat([corpus, probe], ignore_index=True)
    got = _got_pairs(
        probe_jaccard_index(rd.from_pandas(probe), idx, rd.from_pandas(union), threshold=0.8)
    )
    assert (0, 9_000) in got  # planted near-dup found

    from quanterra_pipeline_ray.functions.jaccard_index import read_probe_stats

    stats = read_probe_stats(idx)
    assert stats["partitions_total"] > 700  # corpus spreads over the buckets
    # the done-bar: a small probe reads <25% of the index partitions
    assert stats["df_read"] < 0.25 * stats["partitions_total"]
    assert stats["postings_read"] < 0.25 * stats["partitions_total"]
    # bloom pruning tightened the candidate sets (novel shingles miss)
    assert stats["df_read"] < stats["df_candidate"]
    assert stats["postings_read"] <= stats["postings_candidate"]


def test_probe_small_and_distributed_plans_agree(ray_session, tmp_path, monkeypatch):
    """The exchange-free small-probe plan and the distributed plan must
    return the same pair set (placement differs; selection logic is shared)."""
    import quanterra_pipeline_ray.functions.jaccard_index as J

    df = _corpus(13, 25)
    new_mask = df["doc_id"] % 4 == 0
    old, new = df[~new_mask], df[new_mask]
    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(old), idx, n_buckets=32)

    small = _got_pairs(
        probe_jaccard_index(rd.from_pandas(new), idx, rd.from_pandas(df), threshold=0.8)
    )
    monkeypatch.setattr(J, "_SMALL_PROBE_POSTINGS", -1)  # force distributed
    big = _got_pairs(
        probe_jaccard_index(rd.from_pandas(new), idx, rd.from_pandas(df), threshold=0.8)
    )
    assert small == big == _true_pairs(df, set(new["doc_id"].astype(int)))


def test_index_compaction_layout_only(ray_session, tmp_path):
    """compact_jaccard_index merges every bucket's fragment files into one
    per table: probe results are bit-identical before/after, file count
    drops, and a crash leaving BOTH the merged file and a fragment is
    still correct (postings consumed distinct; df advisory)."""
    import glob
    import shutil

    from quanterra_pipeline_ray.functions.jaccard_index import (
        compact_jaccard_index,
        index_file_count,
    )

    old = _corpus(31, 24)
    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(old.iloc[:20]), idx, n_buckets=16)
    extend_jaccard_index(rd.from_pandas(old.iloc[20:30]), idx)
    extend_jaccard_index(rd.from_pandas(old.iloc[30:]), idx)
    new = _corpus(32, 6, start_id=10_000)
    union = pd.concat([old, new], ignore_index=True)
    corpus = rd.from_pandas(union)

    before = _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus))
    files_before = index_file_count(idx)
    stats = compact_jaccard_index(idx)
    assert stats["buckets_compacted"] > 0
    files_after = index_file_count(idx)
    assert files_after < files_before
    after = _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus))
    assert after == before

    # crash sim: duplicate one compacted postings file under a fragment name
    # (both present) -> probe unchanged
    some = glob.glob(f"{idx}/postings/bkt=*/compact-*.parquet")[0]
    shutil.copy(some, some.replace("compact-", "leftover-"))
    assert _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus)) == before


def test_probe_on_zipf_corpus_matches_bruteforce(ray_session, tmp_path):
    """Realistic (Zipf-vocabulary) text statistics: the generator exists
    because the driver corpus's tiny vocabulary is the similarity-join
    worst case; the index contract must hold in BOTH regimes."""
    from quanterra_pipeline_ray.synth import generate_zipf_documents

    old = generate_zipf_documents(60, vocab_size=300, mean_tokens=25, seed=3).to_pandas()
    new = generate_zipf_documents(12, vocab_size=300, mean_tokens=25, seed=8).to_pandas()
    new["doc_id"] += 10_000
    # plant two true near-dups of indexed docs into the probe
    new.loc[new.index[0], "text"] = old["text"].iloc[0]
    new.loc[new.index[1], "text"] = old["text"].iloc[1] + " xq"
    union = pd.concat([old, new], ignore_index=True)

    idx = str(tmp_path / "zjidx")
    build_jaccard_index(rd.from_pandas(old), idx, n_buckets=32)
    got = _got_pairs(
        probe_jaccard_index(rd.from_pandas(new), idx, rd.from_pandas(union))
    )
    want = _true_pairs(union, set(new["doc_id"]))
    assert got == want and len(got) >= 2


def test_index_refs_pin_probe_state_and_survive_compaction(ray_session, tmp_path):
    """Snapshot-pinned index versions (the table named-refs analogy): a
    probe at a ref sees exactly the index state at that commit — later
    extends never surface — and compaction must not delete the ref'd
    version's files (mirrors test_named_refs_protect_snapshots_from_expiry)."""
    import glob

    from quanterra_pipeline_ray.functions.jaccard_index import (
        compact_jaccard_index,
        index_version,
        read_index_refs,
        read_index_version,
        set_index_ref,
    )

    old = _corpus(seed=1, n=12)
    later = _corpus(seed=2, n=12, start_id=1_000)
    # probe batch: one near-dup of an OLD doc and one of a LATER doc
    new = pd.DataFrame(
        {
            "doc_id": np.array([5_000, 5_001], dtype=np.int64),
            "text": [old["text"].iloc[0], later["text"].iloc[0]],
        }
    )
    union = pd.concat([old, later, new], ignore_index=True)
    idx = str(tmp_path / "jref")

    build_jaccard_index(rd.from_pandas(old), idx, n_buckets=32)
    v_pin = set_index_ref(idx, "pin")
    assert read_index_refs(idx) == {"pin": v_pin}
    corpus = rd.from_pandas(union)

    pinned_before = _got_pairs(
        probe_jaccard_index(rd.from_pandas(new), idx, corpus, at_ref="pin")
    )
    want_old_only = _true_pairs(
        pd.concat([old, new], ignore_index=True), {5_000, 5_001}
    )
    assert pinned_before == want_old_only and len(pinned_before) >= 1

    # the index advances
    extend_jaccard_index(rd.from_pandas(later), idx)
    assert index_version(idx) > v_pin
    unpinned = _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus))
    want_all = _true_pairs(union, {5_000, 5_001})
    assert unpinned == want_all and len(unpinned) > len(pinned_before)

    # pinned probe unchanged by the extend
    assert (
        _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus, at_ref="pin"))
        == pinned_before
    )

    # compaction merges fragments but PRESERVES the ref'd version's files
    pinned_files = set(read_index_version(idx, v_pin)["files"])
    compact_jaccard_index(idx, min_files_per_bucket=2)
    import os

    on_disk = {
        os.path.relpath(p, idx)
        for p in glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    }
    assert pinned_files <= on_disk, "compaction deleted ref-protected files"
    assert (
        _got_pairs(probe_jaccard_index(rd.from_pandas(new), idx, corpus, at_ref="pin"))
        == pinned_before
    )
    # at_version addresses the same state; unknown refs raise
    assert (
        _got_pairs(
            probe_jaccard_index(rd.from_pandas(new), idx, corpus, at_version=v_pin)
        )
        == pinned_before
    )
    with pytest.raises(KeyError):
        probe_jaccard_index(rd.from_pandas(new), idx, corpus, at_ref="nope")


def test_index_compaction_deletes_unpinned_fragments(ray_session, tmp_path):
    """Without a ref, compaction still reclaims fragment files (the expire
    analogy: only refs protect old versions)."""
    from quanterra_pipeline_ray.functions.jaccard_index import (
        compact_jaccard_index,
        index_file_count,
    )

    idx = str(tmp_path / "junpin")
    build_jaccard_index(rd.from_pandas(_corpus(seed=3, n=10)), idx, n_buckets=16)
    for s in (4, 5, 6):
        extend_jaccard_index(
            rd.from_pandas(_corpus(seed=s, n=10, start_id=s * 1_000)), idx
        )
    before = index_file_count(idx)
    compact_jaccard_index(idx, min_files_per_bucket=2)
    assert index_file_count(idx) < before


def test_wide_index_bucket_count_invariant(ray_session, tmp_path):
    """Cluster-scale bucket counts (> the 1024-partition pyarrow fragment
    cap) use the direct hive writer; results must be identical to a narrow
    index at any n_buckets (buckets are layout, never semantics)."""
    from quanterra_pipeline_ray.synth import generate_zipf_documents

    old = generate_zipf_documents(300, vocab_size=500, mean_tokens=30, seed=3).to_pandas()
    new = generate_zipf_documents(30, vocab_size=500, mean_tokens=30, seed=8).to_pandas()
    new["doc_id"] += 10_000
    new.loc[new.index[0], "text"] = old["text"].iloc[0]
    new.loc[new.index[1], "text"] = old["text"].iloc[1] + " xq"
    union = pd.concat([old, new], ignore_index=True)

    got = {}
    for nb in (64, 4096):
        idx = str(tmp_path / f"wide{nb}")
        build_jaccard_index(rd.from_pandas(old), idx, n_buckets=nb)
        extend_jaccard_index(rd.from_pandas(new.iloc[15:]), idx)
        got[nb] = _got_pairs(
            probe_jaccard_index(
                rd.from_pandas(new.iloc[:15]), idx, rd.from_pandas(union), threshold=0.8
            )
        )
    assert got[64] == got[4096] and len(got[64]) >= 2
