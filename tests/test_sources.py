import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from quanterra_pipeline_ray.functions.envelope import (
    EnvelopeBuilder,
    normalize_json_safe,
    split_composite_key,
    storage_key,
    substring_semi_join,
)
from quanterra_pipeline_ray.sources.api import (
    DeterministicFakeAPI,
    RetryError,
    fanout_items,
    fetch_fanout,
    with_retries,
)
from quanterra_pipeline_ray.sources.csv import (
    CSVSourceConfig,
    FileValidationError,
    head_sample,
    preview_file,
    read_validated_csv,
    validate_file_type,
    validate_structure,
)


# ------------------------------------------------------------------- csv
def _write_broker_csv(path, header_row=5, rows=30):
    with open(path, "w") as f:
        for i in range(header_row):
            f.write(f"junk preamble line {i},x\n")
        f.write("Trade date,Reference,Description,Value\n")
        for i in range(rows):
            f.write(f"2024-01-{i % 28 + 1:02d},REF{i},desc {i},{i * 1.5}\n")


def test_validate_file_type_rejects_extension(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("a,b")
    with pytest.raises(FileValidationError):
        validate_file_type(str(p))


def test_preview_and_structure_gate(tmp_path):
    p = str(tmp_path / "hl.csv")
    _write_broker_csv(p, header_row=5)
    cfg = CSVSourceConfig(header_row=5, required_columns=("Trade date", "Reference"))
    preview = preview_file(p, cfg)
    assert len(preview) == 15  # preview row cap
    header = validate_structure(preview, cfg)
    assert header[0] == "Trade date"
    bad = CSVSourceConfig(header_row=5, required_columns=("Nope",))
    with pytest.raises(FileValidationError, match="Nope"):
        validate_structure(preview, bad)


def test_read_validated_csv_full_file(tmp_path):
    p = str(tmp_path / "hl.csv")
    _write_broker_csv(p, header_row=5, rows=40)
    cfg = CSVSourceConfig(header_row=5, required_columns=("Trade date",))
    ds = read_validated_csv(p, cfg)
    assert ds.count() == 40  # full file read, preamble skipped
    assert "Trade date" in ds.schema().names
    assert head_sample(ds, 5).count() == 5


# ------------------------------------------------------------------- api
def test_fake_api_deterministic():
    a = DeterministicFakeAPI(seed=1).get("eod", symbol="A.US")
    b = DeterministicFakeAPI(seed=1).get("eod", symbol="A.US")
    c = DeterministicFakeAPI(seed=1).get("eod", symbol="B.US")
    assert a == b and a != c


def test_with_retries_recovers_and_gives_up():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return "ok"

    assert with_retries(flaky, attempts=3, sleep=lambda _s: None) == "ok"
    with pytest.raises(RetryError):
        with_retries(lambda: (_ for _ in ()).throw(ValueError("x")), attempts=2, sleep=lambda _s: None)


def test_fanout_items_cartesian():
    items = fanout_items(["US", "LSE"], ["eod", "div"])
    assert len(items) == 4


def test_fetch_fanout_quarantines_failures():
    items = [{"endpoint": "eod", "symbol": f"S{i}"} for i in range(12)]
    # fail_every=1 -> first attempt of EVERY call fails; retries exhaust for
    # every item (3 attempts all hit the failure cadence? no: calls counter
    # advances per attempt, so only every-Nth attempt fails). Use a cadence
    # that makes SOME items fail all attempts: fail_every=1 fails every call.
    ok, quarantine = fetch_fanout(items, concurrency=2, fail_every=1)
    assert ok.count() == 0
    q = quarantine.take_all()
    assert len(q) == 12
    assert all("transient failure" in r["error"] for r in q)

    ok2, quarantine2 = fetch_fanout(items, concurrency=2, fail_every=0)
    assert ok2.count() == 12
    assert quarantine2.count() == 0


def test_fetch_fanout_on_error_raise():
    items = [{"endpoint": "eod", "symbol": "S"}]
    import ray

    with pytest.raises(Exception):
        ok, _q = fetch_fanout(items, concurrency=1, fail_every=1, on_error="raise")
        ok.count()


# -------------------------------------------------------------- envelope
def test_normalize_json_safe():
    t = pa.table(
        {
            "v": pa.array([1.0, float("nan"), 2.0]),
            "ts": pa.array([1_700_000_000_000_000] * 3, pa.timestamp("us")),
            "s": ["a", "b", "c"],
        }
    )
    out = normalize_json_safe(t)
    assert out.column("v").to_pylist() == [1.0, None, 2.0]
    assert out.column("ts").to_pylist()[0].startswith("2023-11-14T")


def test_envelope_builder():
    t = pa.table({"x": [1, 2]})
    out = EnvelopeBuilder("eod")(t)
    assert out.column("meta_data_type").to_pylist() == ["eod", "eod"]


def test_storage_key_golden():
    ts = pa.chunked_array([pa.array([1_706_486_400_000_000], pa.timestamp("us"))])  # 2024-01-29
    key = storage_key("eod", ts, pa.chunked_array([pa.array(["US"])]), pa.chunked_array([pa.array(["AAPL"])]))
    assert key.to_pylist() == ["eodhd/eod/2024/01/29/US/AAPL.json.gz"]


def test_substring_semi_join():
    ds = rd.from_items([{"symbol": s} for s in ["A.US", "B.LSE", "C.TO", "D.US"]])
    out = substring_semi_join(ds, "symbol", [".US", ".TO"])
    assert sorted(r["symbol"] for r in out.take_all()) == ["A.US", "C.TO", "D.US"]


def test_split_composite_key():
    ds = rd.from_items([{"k": "AAPL.US"}, {"k": "plain"}])
    out = split_composite_key(ds, "k")
    rows = {r["k"]: (r["code"], r["exchange"]) for r in out.take_all()}
    assert rows["AAPL.US"] == ("AAPL", "US")
    assert rows["plain"][0] == "plain"


# ---------------------------------------------------------------- ingest
def test_market_data_flow_end_to_end(tmp_path):
    from quanterra_pipeline_ray.pipelines.ingest import market_data_flow

    out = str(tmp_path / "landing")
    res = market_data_flow(
        out, exchanges=["US", "LSE"], data_types=["eod", "div"], symbols_per_exchange=2,
        allowed_exchange_suffixes=[".US"],
    )
    # semi-join kept only .US symbols: 2 symbols x 2 data types
    assert res["stored_rows"] == 4
    assert res["quarantined_rows"] == 0
    # deterministic partition layout
    assert any("endpoint=eod" in p for p in res["partitions"])
    # idempotent rerun: same partitions, same row count
    res2 = market_data_flow(
        out, exchanges=["US", "LSE"], data_types=["eod", "div"], symbols_per_exchange=2,
        allowed_exchange_suffixes=[".US"],
    )
    assert res2["stored_rows"] == 4


def test_market_data_fetch_and_projection():
    """Yahoo get_market_data parity: per-ticker OHLCV rows, session per
    actor, projection drops non-OHLCV columns; deterministic per ticker."""
    from quanterra_pipeline_ray.sources.api import fetch_market_data

    out = fetch_market_data(["AAPL", "MSFT", "GOOG"], period_days=4).to_pandas()
    assert len(out) == 12
    assert list(out.columns) == ["ticker", "day", "Open", "High", "Low", "Close", "Volume"]
    assert "Adjusted" not in out.columns  # projection applied
    assert (out["High"] >= out[["Open", "Close"]].max(axis=1)).all()
    assert (out["Low"] <= out[["Open", "Close"]].min(axis=1)).all()
    again = fetch_market_data(["AAPL", "MSFT", "GOOG"], period_days=4).to_pandas()
    a = out.sort_values(["ticker", "day"]).reset_index(drop=True)
    b = again.sort_values(["ticker", "day"]).reset_index(drop=True)
    assert a.equals(b)


def test_eodhd_request_builder_endpoint_fidelity():
    """Request construction matches the reference endpoint-by-endpoint
    (`src/clients/api/eodhd_client.py:26-133`): path templates, conditional
    params, bulk type discriminators, and the uniform api_token/fmt params
    (`eodhd_client.py:13-20`)."""
    from quanterra_pipeline_ray.sources.api import EODHDRequests

    r = EODHDRequests(api_key="KEY")
    auth = {"api_token": "KEY", "fmt": "json"}
    assert r.exchanges() == {"endpoint": "exchanges-list", **auth}
    assert r.exchange_symbols("US") == {"endpoint": "exchange-symbol-list/US", **auth}
    assert r.exchange_symbols("US", asset_type="ETF", delisted=True) == {
        "endpoint": "exchange-symbol-list/US", "type": "ETF", "delisted": "1", **auth
    }
    assert r.eod("AAPL", "US") == {"endpoint": "eod/AAPL.US", **auth}
    assert r.eod("AAPL", "US", start_date="2024-01-01", end_date="2024-02-01") == {
        "endpoint": "eod/AAPL.US", "from": "2024-01-01", "to": "2024-02-01", **auth
    }
    assert r.fundamentals("AAPL", "US") == {"endpoint": "fundamentals/AAPL.US", **auth}
    assert r.dividends("AAPL", "US") == {"endpoint": "div/AAPL.US", **auth}
    assert r.splits("AAPL", "US") == {"endpoint": "splits/AAPL.US", **auth}
    assert r.news("AAPL", "US") == {"endpoint": "news", "s": "AAPL.US", **auth}
    assert r.bulk_eod("US") == {"endpoint": "eod-bulk-last-day/US", **auth}
    assert r.bulk_eod("US", date="2024-03-01") == {
        "endpoint": "eod-bulk-last-day/US", "date": "2024-03-01", **auth
    }
    assert r.bulk_dividends("US") == {
        "endpoint": "eod-bulk-last-day/US", "type": "dividends", **auth
    }
    assert r.bulk_splits("US", date="2024-03-01") == {
        "endpoint": "eod-bulk-last-day/US", "type": "splits", "date": "2024-03-01", **auth
    }
    assert r.economic_events() == {"endpoint": "economic-events", "limit": "1000", **auth}
    assert r.economic_events(country="US", comparison="qoq", start_date="a", end_date="b", limit=5) == {
        "endpoint": "economic-events", "limit": "5", "country": "US",
        "comparison": "qoq", "from": "a", "to": "b", **auth
    }
    assert r.macro_indicator("USA", "gdp_growth_rate") == {
        "endpoint": "macro-indicator/USA", "indicator": "gdp_growth_rate", **auth
    }


def test_eodhd_instrument_fanout_and_fetch():
    """instruments x 5 endpoints fan-out (`eodhd_processor.py:236-249`)
    through the actor-pool fetch; composite keys split on the FIRST dot."""
    from quanterra_pipeline_ray.sources.api import EODHDRequests, eodhd_fanout

    r = EODHDRequests(api_key="K")
    reqs = r.instrument_requests(["AAPL.US", "BRK.A.US"])
    assert len(reqs) == 10
    # split('.', 1): code 'BRK', exchange 'A.US' (reference semantics)
    assert {"endpoint": "eod/BRK.A.US", "api_token": "K", "fmt": "json"} in reqs
    paths = {q["endpoint"] for q in reqs}
    assert {"div/AAPL.US", "splits/AAPL.US", "eod/AAPL.US",
            "fundamentals/AAPL.US", "news"} <= paths
    ok, quarantine = eodhd_fanout(reqs, concurrency=4)
    okp = ok.to_pandas()
    assert len(okp) == 10 and quarantine.count() == 0
    assert set(okp.columns) >= {"endpoint", "request_json", "ok", "payload"}
    # deterministic: same requests -> same payloads
    ok2, _ = eodhd_fanout(reqs, concurrency=4)
    assert sorted(okp["payload"]) == sorted(ok2.to_pandas()["payload"])


def test_endpoint_registry_shapes_and_builders_agree():
    """The declarative endpoint registry (the reference's reserved
    eodhd_endpoints.py config-model shape) is live config: every builder
    path comes from a registry spec, path params are validated, and the
    fan-out semaphore widths match the reference processor's."""
    import pytest

    from quanterra_pipeline_ray.sources.api import ENDPOINT_REGISTRY, EODHDRequests

    r = EODHDRequests("k")
    assert len(ENDPOINT_REGISTRY) == 13
    assert r.eod("AAPL", "US")["endpoint"] == ENDPOINT_REGISTRY["eod"].path(
        instrument="AAPL", exchange="US"
    )
    assert r.exchange_symbols("LSE")["endpoint"] == "exchange-symbol-list/LSE"
    assert r.bulk_dividends("US")["type"] == "dividends"
    # missing path params fail loudly at construction, not at fetch time
    with pytest.raises(KeyError):
        ENDPOINT_REGISTRY["eod"].path(instrument="AAPL")
    # semaphore widths mirror eodhd_processor.py: bulk/exchange families 8,
    # instrument/macro families 40
    assert ENDPOINT_REGISTRY["bulk_eod"].semaphore == 8
    assert ENDPOINT_REGISTRY["fundamentals"].semaphore == 40
