import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from quanterra_pipeline_ray.functions.multimodal import (
    FrameSampler,
    MediaDecoder,
    decode_features,
    synth_media_table,
)
from quanterra_pipeline_ray.functions.text import (
    Fingerprinter,
    LangId,
    RollingFingerprinter,
    TextStats,
    TokenCounter,
)

SF = "/root/testdata/sf0.001"


def test_text_stats_matches_manual():
    df = pd.DataFrame({"text": ["hello world", "  a  b  ", "", "one.two, three!"]})
    out = TextStats()(df.copy())
    assert out["n_tokens"].tolist() == [2, 2, 0, 2]
    assert out["n_chars_txt"].tolist() == [11, 8, 0, 15]
    assert out["token_chars"].tolist() == [10, 2, 0, 14]
    assert out["n_punct"].tolist() == [0, 0, 0, 3]
    assert out["quality_score"][0] == 10 / 11


def test_token_counter():
    df = pd.DataFrame({"text": ["hello, world! x2"]})
    out = TokenCounter()(df.copy())
    # hello , world ! x 2
    assert out["n_bpe_tokens"].tolist() == [6]


def test_langid_heuristic():
    df = pd.DataFrame(
        {
            "text": [
                "the cat and the dog sat in a box of it",
                "der hund und die katze ist nicht da",
                "le chat est un animal que les gens",
                "el perro y la casa es una cosa que",
                "深層学習 はとても面白い技術です 深層",
                "zzz qqq xxx",
            ]
        }
    )
    out = LangId()(df.copy())
    assert out["lang_pred"].tolist()[:5] == ["en", "de", "fr", "es", "zh"]
    assert out["lang_pred"].tolist()[5] == "und"


def test_fingerprint_matches_md5():
    df = pd.DataFrame({"text": ["abc", "x y z"]})
    out = Fingerprinter()(df.copy())
    assert out["fingerprint"][0] == hashlib.md5(b"abc").hexdigest()


def test_rolling_fingerprint_deterministic_and_shift_invariant_content():
    r = RollingFingerprinter(window=4)
    a = r(pd.DataFrame({"text": ["abcdefgh"]}))
    b = r(pd.DataFrame({"text": ["abcdefgh"]}))
    assert a["rfp_min"][0] == b["rfp_min"][0]
    # a shared window produces overlapping fingerprint ranges
    c = r(pd.DataFrame({"text": ["xxabcdef"]}))
    assert a["rfp_min"][0] != 0


def test_text_stats_on_documents_dataset():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    out = ds.map_batches(TextStats(), batch_format="pandas")
    row = out.take(1)[0]
    assert row["n_chars_txt"] == len(row["text"])
    assert out.count() == 500


# ------------------------------------------------------------------ multimodal
def test_media_decoder_stub_raises_without_fake():
    t = synth_media_table(4)
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)(t.to_pandas())


def test_media_decode_plumbing():
    ds = rd.from_arrow(synth_media_table(32))
    out = decode_features(ds, feature_dim=16)
    rows = out.take_all()
    assert len(rows) == 32
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same payload -> same features
    again = decode_features(rd.from_arrow(synth_media_table(32)), feature_dim=16).take_all()
    a = {r["media_id"]: list(r["features"]) for r in rows}
    b = {r["media_id"]: list(r["features"]) for r in again}
    assert a == b


def test_frame_sampler_expands_rows():
    t = synth_media_table(30, seed=3)
    n_videos = sum(1 for v in t.column("media_type").to_pylist() if v == "video")
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": 4, "fake": True},
        batch_format="pandas", concurrency=2,
    )
    assert out.count() == n_videos * 4


def test_topk_per_group_matches_pandas_reference():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import topk_per_group

    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "id": np.arange(500, dtype=np.int64),
            "grp": rng.choice(["x", "y", "z"], size=500),
            "score": rng.integers(0, 40, size=500),  # many ties -> tiebreak matters
        }
    )
    got = (
        topk_per_group(rd.from_pandas(df), ["grp"], ["score"], k=7, tiebreak=["id"])
        .to_pandas()
        .sort_values(["grp", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
        .groupby("grp", sort=False)
        .head(7)
        .sort_values(["grp", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "grp", "score"]], ref[["id", "grp", "score"]])


def test_quantiles_disc_matches_numpy_nearest_rank():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import quantiles_disc

    rng = np.random.default_rng(12)
    vals = rng.integers(0, 300, size=5_000).astype(np.int64)
    df = pd.DataFrame({"x": vals})
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = quantiles_disc(rd.from_pandas(df), "x", qs, n_buckets=8)
    srt = np.sort(vals)
    for q, v in zip(got["q"], got["v"]):
        rank = max(1, int(np.ceil(q * len(srt))))
        assert v == srt[rank - 1]


def test_sliding_window_counts_matches_bruteforce():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import sliding_window_counts

    rng = np.random.default_rng(6)
    n = 3_000
    ts = rng.integers(0, 10 * 3_600_000_000, size=n)
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b"], size=n),
            "ts": ts.astype("datetime64[us]"),
        }
    )
    got = (
        sliding_window_counts(rd.from_pandas(df), size_us=3_600_000_000, hop_us=900_000_000)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    rows = []
    for et, t in zip(df["event_type"], ts):
        base = (t // 900_000_000) * 900_000_000
        for k in range(4):
            rows.append((et, base - k * 900_000_000))
    ref = (
        pd.DataFrame(rows, columns=["event_type", "ws"])
        .groupby(["event_type", "ws"], as_index=False)
        .size()
        .rename(columns={"size": "n_events", "ws": "window_start"})
    )
    ref["window_start"] = ref["window_start"].astype("datetime64[us]")
    ref = ref.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    ref["n_events"] = ref["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["event_type", "window_start", "n_events"]], ref)


def test_distinct_count_by_matches_pandas():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import distinct_count_by

    rng = np.random.default_rng(14)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], size=4_000),
            "u": rng.integers(0, 150, size=4_000),
        }
    )
    got = (
        distinct_count_by(rd.from_pandas(df), ["g"], "u")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    ref = (
        df.groupby("g", as_index=False)["u"]
        .nunique()
        .rename(columns={"u": "n_distinct"})
        .sort_values("g")
        .reset_index(drop=True)
    )
    ref["n_distinct"] = ref["n_distinct"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["g", "n_distinct"]], ref)


def test_rolling_max_by_matches_pandas_window():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import rolling_max_by

    rng = np.random.default_rng(19)
    n = 2_000
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "uid": rng.integers(0, 40, size=n),
            "t": rng.integers(0, 10_000, size=n),
            "v": rng.normal(size=n),
        }
    )
    got = (
        rolling_max_by(rd.from_pandas(df), "uid", ["t", "eid"], "v", window=3)
        .to_pandas()
        .sort_values(["uid", "t", "eid"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["uid", "t", "eid"]).reset_index(drop=True)
    ref["rolling_max"] = (
        ref.groupby("uid", sort=False)["v"].rolling(3, min_periods=1).max().reset_index(drop=True).to_numpy()
    )
    pd.testing.assert_frame_equal(
        got[["eid", "uid", "t", "v", "rolling_max"]],
        ref[["eid", "uid", "t", "v", "rolling_max"]],
    )


def test_rolling_quantile_by_matches_pandas_window():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import rolling_quantile_by

    rng = np.random.default_rng(23)
    n = 2_000
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "uid": rng.integers(0, 40, size=n),
            "t": rng.integers(0, 10_000, size=n),
            "v": np.round(rng.uniform(0, 100, size=n), 2),
        }
    )
    # q=0.3 exercises real interpolation (frac != 0 for most window sizes)
    got = (
        rolling_quantile_by(rd.from_pandas(df), "uid", ["t", "eid"], "v", window=4, q=0.3)
        .to_pandas()
        .sort_values(["uid", "t", "eid"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["uid", "t", "eid"]).reset_index(drop=True)
    ref["rolling_q"] = (
        ref.groupby("uid", sort=False)["v"]
        .rolling(4, min_periods=1)
        .quantile(0.3, interpolation="linear")
        .reset_index(drop=True)
        .to_numpy()
    )
    # pandas lerps differently at the last ulp; allclose is the right bar
    # for the cross-engine check (the DuckDB oracle pins bit-exactness)
    assert np.allclose(got["rolling_q"], ref["rolling_q"], rtol=1e-12, atol=0)
    # the bit-exact property we rely on: (1-f)*lo + f*hi arithmetic
    one = df[df["uid"] == df["uid"].iloc[0]].sort_values(["t", "eid"])["v"].to_numpy()
    w = one[:2]
    lo, hi = np.sort(w)
    expect = (1.0 - 0.3) * lo + 0.3 * hi
    got_row = got[(got["uid"] == df["uid"].iloc[0])].iloc[1]["rolling_q"]
    assert got_row == expect


def test_pivot_counts_matches_crosstab():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import pivot_counts

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, size=3_000),
            "t": rng.choice(["a", "b", "c"], size=3_000),
        }
    )
    got = (
        pivot_counts(rd.from_pandas(df), "k", "t", ["a", "b", "zzz"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = pd.crosstab(df["k"], df["t"])
    assert (got.set_index("k")["n_a"] == ref["a"]).all()
    assert (got.set_index("k")["n_b"] == ref["b"]).all()
    assert (got["n_zzz"] == 0).all()  # undeclared-in-data value: zeros
    assert "c" not in "".join(got.columns)  # undeclared-in-args value: ignored


def test_unpivot_inverts_pivot():
    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.pipelines.relational import pivot_counts, unpivot_counts

    rng = np.random.default_rng(27)
    df = pd.DataFrame(
        {"k": rng.integers(0, 30, size=1_000), "t": rng.choice(["a", "b", "c"], size=1_000)}
    )
    wide = pivot_counts(rd.from_pandas(df), "k", "t", ["a", "b", "c"])
    long = (
        unpivot_counts(wide, "k", ["a", "b", "c"], name_col="t", value_col="n")
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    ref = (
        df.groupby(["k", "t"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .set_index(["k", "t"])
        .reindex(
            pd.MultiIndex.from_product([sorted(df["k"].unique()), ["a", "b", "c"]], names=["k", "t"]),
            fill_value=0,
        )
        .reset_index()
    )
    ref["n"] = ref["n"].astype(np.int64)
    pd.testing.assert_frame_equal(long[["k", "t", "n"]], ref)


def test_anti_join_keys_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import anti_join_keys

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": np.arange(500, dtype=np.int64), "v": rng.integers(0, 9, 500)})
    right = pd.DataFrame({"rk": rng.choice(np.arange(700, dtype=np.int64), 400)})
    got = (
        anti_join_keys(rd.from_pandas(left), rd.from_pandas(right), "k", "rk")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = left[~left["k"].isin(set(right["rk"]))].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # empty anti set: typed empty result, no crash
    all_right = pd.DataFrame({"rk": left["k"]})
    empty = anti_join_keys(rd.from_pandas(left), rd.from_pandas(all_right), "k", "rk").to_pandas()
    assert len(empty) == 0


def test_running_sum_by_matches_pandas_window():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import running_sum_by

    rng = np.random.default_rng(6)
    n = 3_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 40, n),
            "t": rng.integers(0, 10_000, n),
            "val": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    got = (
        running_sum_by(rd.from_pandas(df).repartition(7), "key", "val", ["t", "id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    cents = np.round(df["val"].to_numpy() * 100).astype(np.int64)
    ref = df.assign(c=cents).sort_values(["key", "t", "id"])
    ref["run_sum"] = ref.groupby("key")["c"].cumsum() / 100.0
    ref = ref.sort_values("id").reset_index(drop=True)
    assert np.array_equal(got["run_sum"].to_numpy(), ref["run_sum"].to_numpy())


def test_quantiles_cont_matches_numpy_linear():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import quantiles_cont

    rng = np.random.default_rng(11)
    v = np.round(rng.uniform(0, 50, 1_234), 2)
    got = quantiles_cont(
        rd.from_pandas(pd.DataFrame({"x": v})).repartition(9), "x", [0.1, 0.5, 0.77, 0.9]
    )
    for q, gv in zip(got["q"], got["v"]):
        s = np.sort(v)
        pos = q * (len(s) - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - lo
        assert gv == s[lo] * (1 - frac) + s[hi] * frac


def test_histogram_bins_width_bucket_semantics():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import histogram_bins

    v = np.array([-5.0, 0.0, 4.99, 5.0, 50.0, 99.99, 100.0, 250.0])
    got = histogram_bins(rd.from_pandas(pd.DataFrame({"x": v})), "x", 0.0, 100.0, 20)
    m = dict(zip(got["bin"], got["n"]))
    # boundary values land in the NEXT bin (bins are [edge, edge+w))
    assert m == {0: 1, 1: 2, 2: 1, 11: 1, 20: 1, 21: 2}


def test_string_agg_by_ordered_and_layout_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import string_agg_by

    rng = np.random.default_rng(12)
    n = 2_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n),
            "v": rng.choice(list("abcdef"), n),
            "o": rng.permutation(np.arange(n, dtype=np.int64)),
        }
    )
    a = string_agg_by(rd.from_pandas(df), "k", "v", ["o"]).to_pandas().sort_values("k")
    b = (
        string_agg_by(rd.from_pandas(df).repartition(9), "k", "v", ["o"])
        .to_pandas()
        .sort_values("k")
    )
    want = (
        df.sort_values(["k", "o"]).groupby("k")["v"].agg("|".join).reset_index(name="agg")
    )
    assert a["agg"].to_list() == want["agg"].to_list()
    assert a["agg"].to_list() == b["agg"].to_list()


def test_late_arrivals_watermark_semantics():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.stages.streaming import late_arrivals

    # one key, arrival order a..e: ts 100, 50 (late at L<50), 200, 199, 90
    df = pd.DataFrame(
        {
            "k": np.ones(5, dtype=np.int64),
            "arr": list("abcde"),
            "ts": pd.to_datetime([100, 50, 200, 199, 90], unit="us"),
            "eid": np.arange(5, dtype=np.int64),
        }
    )
    got = (
        late_arrivals(rd.from_pandas(df), key_col="k", ts_col="ts", arrival_col="arr",
                      lateness_us=10, out_cols=["k", "eid"])
        .to_pandas()
        .sort_values("eid")["late"]
        .to_list()
    )
    # watermarks before each arrival: -, 100, 100, 200, 200 (L=10)
    assert got == [False, True, False, False, True]
    # first arrival per key is never late even with L=0 (no watermark yet)
    got0 = (
        late_arrivals(rd.from_pandas(df), key_col="k", ts_col="ts", arrival_col="arr",
                      lateness_us=0, out_cols=["k", "eid"])
        .to_pandas().sort_values("eid")["late"].to_list()
    )
    assert got0[0] is False or got0[0] == False  # noqa: E712


def test_lag_lead_by_matches_pandas_shift():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import lag_lead_by

    rng = np.random.default_rng(11)
    n = 2_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 50, n).astype(np.int64),  # incl. 1-row keys
            "t": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.normal(size=n),
        }
    )
    # force some single-row partitions
    df.loc[df.index[:5], "key"] = np.arange(1000, 1005)
    got = (
        lag_lead_by(rd.from_pandas(df), "key", "v", ["t", "id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["key", "t", "id"]).copy()
    g = want.groupby("key")["v"]
    want["prev_value"] = g.shift(1)
    want["next_value"] = g.shift(-1)
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["prev_value"], want["prev_value"])
    pd.testing.assert_series_equal(got["next_value"], want["next_value"])


def test_first_last_by_matches_pandas_transform():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import first_last_by

    rng = np.random.default_rng(13)
    n = 2_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 50, n).astype(np.int64),
            "t": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.choice(list("abcdef"), n),
        }
    )
    df.loc[df.index[:5], "key"] = np.arange(1000, 1005)  # 1-row partitions
    got = (
        first_last_by(rd.from_pandas(df), "key", "v", ["t", "id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["key", "t", "id"]).copy()
    g = want.groupby("key")["v"]
    want["first_value"] = g.transform("first")
    want["last_value"] = g.transform("last")
    want = want.sort_values("id").reset_index(drop=True)
    assert (got["first_value"] == want["first_value"]).all()
    assert (got["last_value"] == want["last_value"]).all()


def test_nth_value_by_sql_null_for_short_partitions():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import nth_value_by

    # partition lengths 1..5; n=3 -> null for lengths 1-2, 3rd value else
    rows = []
    rid = 0
    for key, length in enumerate([1, 2, 3, 4, 5]):
        for i in range(length):
            rows.append(
                {"id": rid, "key": key, "t": i, "v": f"k{key}i{i}"}
            )
            rid += 1
    df = pd.DataFrame(rows)
    df[["id", "key", "t"]] = df[["id", "key", "t"]].astype(np.int64)
    got = (
        nth_value_by(rd.from_pandas(df), "key", "v", ["t", "id"], n=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values("id").copy()
    want["nth_value"] = want["key"].map(
        df.sort_values(["key", "t"]).groupby("key")["v"].apply(
            lambda s: s.iloc[2] if len(s) >= 3 else None
        )
    )
    assert got["nth_value"].where(got["nth_value"].notna(), None).to_list() == \
        want["nth_value"].where(want["nth_value"].notna(), None).to_list()


def test_rollup_sums_matches_duckdb_rollup():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rollup_sums

    rng = np.random.default_rng(17)
    n = 5_000
    df = pd.DataFrame(
        {
            "a": rng.choice(list("XYZ"), n),
            "b": rng.choice(list("pq"), n),
            "v": rng.integers(0, 100, n).astype(np.float64),
        }
    )
    cases = [
        ("rollup", "ROLLUP (a, b)"),
        ("cube", "CUBE (a, b)"),
        ([("a", "b"), ("b",), ()], "GROUPING SETS ((a, b), (b), ())"),
    ]
    for sets, sql_sets in cases:
        got = rollup_sums(
            rd.from_pandas(df), ["a", "b"], "v", sum_out="sum_v", sets=sets
        )
        want = duckdb.sql(
            "SELECT a, b, count(*) AS n_rows, CAST(sum(v) AS DOUBLE) AS sum_v "
            f"FROM df GROUP BY {sql_sets}"
        ).df()
        _assert_grouping_sets_equal(got, want)


def _assert_grouping_sets_equal(got, want):

    def canon(d):
        d = d[sorted(d.columns)].copy()
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(
            drop=True
        )

    got, want = canon(got), canon(want)
    assert len(got) == len(want)
    assert (got["n_rows"].to_numpy() == want["n_rows"].to_numpy()).all()
    assert (got["sum_v"].to_numpy() == want["sum_v"].to_numpy()).all()
    assert (
        got["a"].astype(str).to_numpy() == want["a"].astype(str).to_numpy()
    ).all()
    assert (
        got["b"].astype(str).to_numpy() == want["b"].astype(str).to_numpy()
    ).all()


def test_ntile_by_sql_semantics():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import ntile_by

    # partition lengths around and below the tile count: 1..9 rows, t=4
    rows = []
    rid = 0
    for key, length in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100]):
        for i in range(length):
            rows.append({"id": rid, "key": key, "t": i})
            rid += 1
    df = pd.DataFrame(rows).astype(np.int64)
    got = (
        ntile_by(rd.from_pandas(df), "key", ["t", "id"], tiles=4)
        .to_pandas()
        .sort_values("id")["tile"]
        .to_numpy()
    )

    def ntile_ref(length, tiles):
        base, rem = divmod(length, tiles)
        out = []
        for tile in range(1, tiles + 1):
            out.extend([tile] * (base + (1 if tile <= rem else 0)))
        return out

    want = np.concatenate(
        [ntile_ref(ln, 4) for ln in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    )
    assert (got == want).all()


def test_grouped_corr_matches_numpy():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import grouped_corr

    rng = np.random.default_rng(12)
    n = 5_000
    df = pd.DataFrame(
        {
            "key": rng.choice(list("abc"), n),
            "x": rng.integers(1, 51, n).astype(np.float64),
            "y": (rng.integers(0, 11, n) / 100.0),
        }
    )
    got = grouped_corr(rd.from_pandas(df), "key", "x", "y", 1.0, 100.0)
    for _, row in got.iterrows():
        sub = df[df["key"] == row["key"]]
        x, y = sub["x"].to_numpy(), np.round(sub["y"].to_numpy() * 100)
        assert row["n_rows"] == len(sub)
        assert np.isclose(row["covar_pop"], np.cov(x, y, bias=True)[0, 1])
        assert np.isclose(row["corr"], np.corrcoef(x, y)[0, 1])


def test_full_outer_join_keys_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import full_outer_join_keys

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {
            "k": rng.choice(np.arange(80, dtype=np.int64), 120),  # dup keys
            "lv": np.arange(120, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(np.arange(40, 130, dtype=np.int64), 90),
            "rv": np.arange(90, dtype=np.int64) * 10,
        }
    )
    got = (
        full_outer_join_keys(rd.from_pandas(left), rd.from_pandas(right), "k")
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="outer")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["k", "lv", "rv"]:
        a = got[c].astype(float).to_numpy()
        b = want[c].astype(float).to_numpy()
        assert np.array_equal(a, b, equal_nan=True)
    # disjointness guard
    try:
        full_outer_join_keys(
            rd.from_pandas(left.rename(columns={"lv": "rv"})),
            rd.from_pandas(right),
            "k",
        )
        raise AssertionError("expected ValueError on overlapping columns")
    except ValueError:
        pass


def test_tfidf_top_terms_matches_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import tfidf_top_terms

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "apple banana apple",
                "banana cherry",
                "cherry cherry cherry date",
                "apple  date",  # double space → empty token must be dropped
            ],
        }
    )
    out = (
        tfidf_top_terms(rd.from_pandas(docs), n_docs=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # manual: score = tf * 4 / df; df: apple 2, banana 2, cherry 2, date 2
    # doc0 apple tf2 → 4.0 ; doc1 tie banana/cherry both 2.0 → banana (term asc)
    # doc2 cherry tf3 → 6.0 ; doc3 tie apple/date both 2.0 → apple
    assert list(out["term"]) == ["apple", "banana", "cherry", "apple"]
    assert np.allclose(out["score"], [4.0, 2.0, 6.0, 2.0])


def test_rank_by_matches_pandas_with_ties_and_nulls():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rank_by

    rng = np.random.default_rng(14)
    n = 1_500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 30, n).astype(np.int64),
            "v": rng.choice(["a", "b", "c", None], n),  # heavy ties + nulls
        }
    )
    got = (
        rank_by(rd.from_pandas(df), "key", ["v"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # pandas reference (nulls rank last like Arrow's default sort; peers share)
    want = df.copy()
    filled = want["v"].fillna("￿")  # nulls sort last, are mutual peers
    want["rnk"] = filled.groupby(want["key"]).rank(method="min").astype(np.int64)
    want["drnk"] = filled.groupby(want["key"]).rank(method="dense").astype(np.int64)
    sizes = want.groupby("key")["id"].transform("size")
    want["pct_rank"] = np.where(sizes > 1, (want["rnk"] - 1) / np.maximum(sizes - 1, 1), 0.0)
    want["cume"] = filled.groupby(want["key"]).rank(method="max") / sizes
    want = want.sort_values("id").reset_index(drop=True)
    for c in ["rnk", "drnk", "pct_rank", "cume"]:
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy()), c


def test_grouped_quantile_cont_matches_numpy():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import grouped_quantile_cont

    rng = np.random.default_rng(15)
    n = 4_000
    df = pd.DataFrame(
        {
            "key": rng.choice(list("pqrs"), n),
            "v": rng.normal(size=n),
        }
    )
    # include a 1-row key and an even/odd mix of group sizes
    df.loc[df.index[-1], "key"] = "solo"
    for qq in [0.0, 0.25, 0.5, 0.9, 1.0]:
        got = (
            grouped_quantile_cont(rd.from_pandas(df), "key", "v", q=qq)
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            vals = np.sort(df.loc[df["key"] == row["key"], "v"].to_numpy())
            idx = qq * (len(vals) - 1)
            lo = int(np.floor(idx))
            frac = idx - lo
            hi = min(lo + 1, len(vals) - 1)
            want = (1.0 - frac) * vals[lo] + frac * vals[hi]
            assert row["q_val"] == want, (qq, row["key"])


def test_term_counts_matches_manual():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import term_counts

    docs = pd.DataFrame(
        {"text": ["a b a", "b  c", "A c"]}  # case fold + empty-token drop
    )
    got = (
        term_counts(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({"term": ["a", "b", "c"], "cnt": [3, 2, 2]})
    assert list(got["term"]) == list(want["term"])
    assert list(got["cnt"]) == list(want["cnt"])


def test_mode_by_deterministic_tiebreak():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import mode_by

    df = pd.DataFrame(
        {
            "key": np.repeat([1, 2, 3], 4).astype(np.int64),
            "v": ["b", "b", "a", "c",  # key1: b wins on count
                  "d", "c", "c", "d",  # key2: tie c/d -> c (smallest)
                  "z", "z", "z", "z"], # key3: unanimous
        }
    )
    got = (
        mode_by(rd.from_pandas(df), "key", "v")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert list(got["mode_val"]) == ["b", "c", "z"]
    assert list(got["mode_cnt"]) == [2, 2, 4]


def test_hash_join_keys_left_and_inner_match_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import hash_join_keys

    rng = np.random.default_rng(16)
    left = pd.DataFrame(
        {"k": rng.choice(np.arange(60, dtype=np.int64), 100),
         "lv": np.arange(100, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": rng.choice(np.arange(30, 90, dtype=np.int64), 70),
         "rv": np.arange(70, dtype=np.int64) * 10}
    )
    for how in ["left", "inner"]:
        got = (
            hash_join_keys(rd.from_pandas(left), rd.from_pandas(right), "k", how=how)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how=how)
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), how
        for c in ["k", "lv", "rv"]:
            assert np.array_equal(
                got[c].astype(float).to_numpy(),
                want[c].astype(float).to_numpy(),
                equal_nan=True,
            ), (how, c)
    import pytest

    with pytest.raises(ValueError, match="how must be"):
        hash_join_keys(rd.from_pandas(left), rd.from_pandas(right), "k", how="right")


def test_grouped_quantiles_cont_multi_q_matches_single_q():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import (
        grouped_quantile_cont,
        grouped_quantiles_cont,
    )

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {"key": rng.choice(list("xy"), 600), "v": rng.normal(size=600)}
    )
    multi = (
        grouped_quantiles_cont(rd.from_pandas(df), "key", "v", qs=[0.1, 0.5, 0.9])
        .to_pandas()
        .sort_values(["key", "q"])
        .reset_index(drop=True)
    )
    assert len(multi) == 6
    for qq in [0.1, 0.5, 0.9]:
        single = (
            grouped_quantile_cont(rd.from_pandas(df), "key", "v", q=qq)
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        sub = multi[multi["q"] == qq].reset_index(drop=True)
        assert np.array_equal(sub["q_val"].to_numpy(), single["q_val"].to_numpy())
