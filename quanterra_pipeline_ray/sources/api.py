"""API-client fan-out source with retry, bounded concurrency, and per-item
failure isolation.

Rebuilds the reference's ingestion-side operator set Ray-natively:

* generic client with app-level retry + exponential backoff (reference
  `src/clients/api/base_api_client.py:25-41`: 3 attempts, 4–10 s backoff);
* cartesian fan-out with a bounded semaphore (reference
  `eodhd_processor.py:172-185`: exchanges × data_types under
  ``Semaphore(8)``) → ``from_items(product) → map_batches(ClientStage,
  concurrency=N)`` — the actor-pool size IS the semaphore;
* per-item failure isolation: failed items become quarantine rows instead of
  failing the task (reference swallows per-item errors to ``[]`` + log,
  `eodhd_processor.py:107-109`), with a per-stage ``on_error`` policy knob
  ('skip' | 'raise') covering the reference's inconsistency (Yahoo raises,
  EODHD skips — `yahoo_finance_processor.py:50-51` vs
  `eodhd_processor.py:107-109`).

No network exists in this sandbox: :class:`DeterministicFakeAPI` computes a
seeded, deterministic payload per request so tests are exact.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import time
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pandas as pd

from ..util import pool_size


class RetryError(RuntimeError):
    pass


def _stable_seed(key: str) -> int:
    """Process-stable rng seed (python's str hash is salted per process)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "little")


def with_retries(
    fn: Callable[[], Any],
    attempts: int = 3,
    backoff_s: float = 0.05,
    max_backoff_s: float = 0.4,
    retry_on: tuple[type[Exception], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """App-level retry with exponential backoff (tenacity-shaped)."""
    delay = backoff_s
    last: Exception | None = None
    for _ in range(attempts):
        try:
            return fn()
        except retry_on as exc:  # noqa: PERF203 - retry loop
            last = exc
            sleep(delay)
            delay = min(delay * 2, max_backoff_s)
    raise RetryError(f"gave up after {attempts} attempts: {last}") from last


class DeterministicFakeAPI:
    """Seeded stand-in for the market-data APIs (no network in sandbox).

    ``fail_every``: every Nth request raises once (then succeeds on retry),
    exercising the retry path deterministically.
    """

    def __init__(self, seed: int = 42, fail_every: int = 0):
        self.seed = seed
        self.fail_every = fail_every
        self._calls = 0

    def get(self, endpoint: str, **params: Any) -> dict[str, Any]:
        self._calls += 1
        if self.fail_every and self._calls % self.fail_every == 0:
            raise ConnectionError(f"transient failure on call {self._calls}")
        key = f"{self.seed}|{endpoint}|{json.dumps(params, sort_keys=True)}"
        rng = np.random.default_rng(_stable_seed(key))
        return {
            "endpoint": endpoint,
            "params": params,
            "value": round(float(rng.uniform(1, 1000)), 4),
            "volume": int(rng.integers(0, 1_000_000)),
        }


@dataclass(frozen=True)
class EndpointSpec:
    """Declarative per-endpoint config model — the registry shape the
    reference reserved in ``src/models/config/eodhd_endpoints.py`` (a TODO
    stub there; realized here).  ``path_template`` formats with the named
    ``path_params``; ``semaphore`` is the reference processor's bounded
    fan-out width for that endpoint family (`eodhd_processor.py:112-130,
    178-188, 240-249, 285-299`)."""

    name: str
    path_template: str
    path_params: tuple[str, ...] = ()
    optional_params: tuple[str, ...] = ()
    semaphore: int = 40

    def path(self, **kw: Any) -> str:
        missing = [p for p in self.path_params if p not in kw]
        if missing:
            raise KeyError(f"endpoint {self.name!r} missing path params {missing}")
        return self.path_template.format(**kw)


#: The reference's 13-endpoint EODHD surface as DATA (one row per client
#: method, `eodhd_client.py:26-131`) — consulted by the request builders
#: below, so the registry is live config, not documentation.
ENDPOINT_REGISTRY: dict[str, EndpointSpec] = {
    s.name: s
    for s in (
        EndpointSpec("exchanges", "exchanges-list"),
        EndpointSpec("exchange_symbols", "exchange-symbol-list/{exchange}",
                     ("exchange",), ("type", "delisted"), semaphore=8),
        EndpointSpec("eod", "eod/{instrument}.{exchange}",
                     ("instrument", "exchange"), ("period", "order", "from", "to")),
        EndpointSpec("fundamentals", "fundamentals/{instrument}.{exchange}",
                     ("instrument", "exchange")),
        EndpointSpec("dividends", "div/{instrument}.{exchange}",
                     ("instrument", "exchange")),
        EndpointSpec("splits", "splits/{instrument}.{exchange}",
                     ("instrument", "exchange")),
        EndpointSpec("bulk_eod", "eod-bulk-last-day/{exchange}",
                     ("exchange",), ("date",), semaphore=8),
        EndpointSpec("bulk_dividends", "eod-bulk-last-day/{exchange}",
                     ("exchange",), ("date", "type"), semaphore=8),
        EndpointSpec("bulk_splits", "eod-bulk-last-day/{exchange}",
                     ("exchange",), ("date", "type"), semaphore=8),
        EndpointSpec("economic_events", "economic-events",
                     (), ("country", "comparison", "from", "to", "limit")),
        EndpointSpec("macro_indicator", "macro-indicator/{iso_code}",
                     ("iso_code",), ("indicator",)),
        EndpointSpec("news", "news", (), ("s", "limit", "offset"), semaphore=40),
        EndpointSpec("exchange_details", "exchange-details/{exchange}",
                     ("exchange",), semaphore=8),
    )
}


class EODHDRequests:
    """Endpoint-exact request builder for the reference's EODHD surface.

    Mirrors every endpoint of reference ``src/clients/api/eodhd_client.py``
    — path templates, conditional params and defaults — as pure
    ``{"endpoint": path, **params}`` dicts ready for :func:`fetch_fanout`.
    The auth/format params the reference injects in
    ``_prepare_request_params`` (`eodhd_client.py:13-20`: ``api_token``,
    ``fmt=json``) are added uniformly by :meth:`prepare`; transport happens
    in the actor-pool fetch stage, so request CONSTRUCTION (the testable,
    network-free part) is byte-faithful while the HTTP call itself stays
    behind the deterministic fake.
    """

    def __init__(self, api_key: str = "demo"):
        self.api_key = api_key

    def prepare(self, endpoint: str, params: dict[str, Any] | None = None) -> dict[str, Any]:
        """`eodhd_client.py:13-20`: every request carries api_token + fmt."""
        out = dict(params or {})
        out["api_token"] = self.api_key
        out["fmt"] = "json"
        return {"endpoint": endpoint, **out}

    # -- exchange-level (`eodhd_client.py:26-42`) --------------------------
    def exchanges(self) -> dict[str, Any]:
        return self.prepare(ENDPOINT_REGISTRY["exchanges"].path())

    def exchange_symbols(
        self, exchange: str, asset_type: str | None = None, delisted: bool = False
    ) -> dict[str, Any]:
        params: dict[str, Any] = {}
        if asset_type:
            params["type"] = asset_type
        if delisted:
            params["delisted"] = "1"
        return self.prepare(ENDPOINT_REGISTRY["exchange_symbols"].path(exchange=exchange), params)

    # -- instrument-level (`eodhd_client.py:44-74,129-133`) ----------------
    def eod(
        self,
        instrument: str,
        exchange: str,
        start_date: str | None = None,
        end_date: str | None = None,
    ) -> dict[str, Any]:
        params: dict[str, Any] = {}
        if start_date:
            params["from"] = start_date
        if end_date:
            params["to"] = end_date
        return self.prepare(ENDPOINT_REGISTRY["eod"].path(instrument=instrument, exchange=exchange), params)

    def fundamentals(self, instrument: str, exchange: str) -> dict[str, Any]:
        return self.prepare(ENDPOINT_REGISTRY["fundamentals"].path(instrument=instrument, exchange=exchange))

    def dividends(self, instrument: str, exchange: str) -> dict[str, Any]:
        return self.prepare(ENDPOINT_REGISTRY["dividends"].path(instrument=instrument, exchange=exchange))

    def splits(self, instrument: str, exchange: str) -> dict[str, Any]:
        return self.prepare(ENDPOINT_REGISTRY["splits"].path(instrument=instrument, exchange=exchange))

    def news(self, instrument: str, exchange: str) -> dict[str, Any]:
        return self.prepare(ENDPOINT_REGISTRY["news"].path(), {"s": f"{instrument}.{exchange}"})

    # -- bulk (`eodhd_client.py:76-98`: one path, type-discriminated) ------
    def bulk_eod(self, exchange: str, date: str | None = None) -> dict[str, Any]:
        params: dict[str, Any] = {}
        if date:
            params["date"] = date
        return self.prepare(ENDPOINT_REGISTRY["bulk_eod"].path(exchange=exchange), params)

    def bulk_dividends(self, exchange: str, date: str | None = None) -> dict[str, Any]:
        params: dict[str, Any] = {"type": "dividends"}
        if date:
            params["date"] = date
        return self.prepare(ENDPOINT_REGISTRY["bulk_eod"].path(exchange=exchange), params)

    def bulk_splits(self, exchange: str, date: str | None = None) -> dict[str, Any]:
        params: dict[str, Any] = {"type": "splits"}
        if date:
            params["date"] = date
        return self.prepare(ENDPOINT_REGISTRY["bulk_eod"].path(exchange=exchange), params)

    # -- macro / calendar (`eodhd_client.py:100-127`) ----------------------
    def economic_events(
        self,
        country: str | None = None,
        comparison: str | None = None,
        start_date: str | None = None,
        end_date: str | None = None,
        limit: int = 1000,
    ) -> dict[str, Any]:
        params: dict[str, Any] = {"limit": str(limit)}
        if country:
            params["country"] = country
        if comparison:
            params["comparison"] = comparison
        if start_date:
            params["from"] = start_date
        if end_date:
            params["to"] = end_date
        return self.prepare("economic-events", params)

    def macro_indicator(self, iso_code: str, indicator: str) -> dict[str, Any]:
        return self.prepare(f"macro-indicator/{iso_code}", {"indicator": indicator})

    INSTRUMENT_ENDPOINTS = ("dividends", "splits", "eod", "fundamentals", "news")

    def instrument_requests(self, instruments: list[str]) -> list[dict[str, Any]]:
        """The processor's instruments × endpoints fan-out (reference
        `eodhd_processor.py:236-249`: 5 endpoints per composite
        ``code.exchange`` key under ``Semaphore(40)``) as a request list —
        the actor-pool size of :func:`fetch_fanout` plays the semaphore."""
        reqs = []
        for instrument in instruments:
            code, exchange = instrument.split(".", 1)  # `eodhd_processor.py:206`
            for endpoint in self.INSTRUMENT_ENDPOINTS:
                reqs.append(getattr(self, endpoint)(code, exchange))
        return reqs


def fanout_items(*dimensions: list) -> list[dict[str, Any]]:
    """Cartesian product of request dimensions as a control-dataset item list
    (the reference's exchanges × data_types / instruments × endpoints)."""
    keys = [f"dim{i}" for i in range(len(dimensions))]
    return [dict(zip(keys, combo)) for combo in itertools.product(*dimensions)]


class FetchStage:
    """Actor-pool fetch stage: one client per actor (reference holds one
    client per flow), per-item try/except with quarantine routing."""

    def __init__(
        self,
        endpoint_col: str = "endpoint",
        on_error: str = "skip",
        seed: int = 42,
        fail_every: int = 0,
        attempts: int = 3,
    ):
        self.client = DeterministicFakeAPI(seed=seed, fail_every=fail_every)
        self.endpoint_col = endpoint_col
        self.on_error = on_error
        self.attempts = attempts

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in batch.iterrows():
            req = {k: row[k] for k in batch.columns if k != self.endpoint_col}
            try:
                payload = with_retries(
                    lambda: self.client.get(str(row[self.endpoint_col]), **req),
                    attempts=self.attempts,
                    backoff_s=0.001,
                    sleep=lambda _s: None,
                )
                out.append(
                    {
                        **{c: row[c] for c in batch.columns},
                        "ok": True,
                        "error": "",
                        "payload": json.dumps(payload, sort_keys=True),
                    }
                )
            except Exception as exc:
                if self.on_error == "raise":
                    raise
                out.append(
                    {
                        **{c: row[c] for c in batch.columns},
                        "ok": False,
                        "error": str(exc),
                        "payload": "",
                    }
                )
        return pd.DataFrame(out)


class MarketDataStage:
    """Yahoo ``get_market_data`` analog (reference
    `src/clients/yahoo_finance_client.py:50-67`): per-ticker OHLCV history
    for ``period`` days.  One (fake) session per actor — the Ray-native form
    of the reference's reused ``requests.Session``
    (`yahoo_finance_client.py:13-16`) — and the reference's SERIAL
    per-ticker loop (`yahoo_finance_processor.py:34-51`) becomes a
    parallelized actor pool over ticker batches.
    """

    def __init__(self, period_days: int = 5, seed: int = 42, ticker_col: str = "ticker"):
        self.session = DeterministicFakeAPI(seed=seed)  # session reuse
        self.period_days = period_days
        self.ticker_col = ticker_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for ticker in batch[self.ticker_col].astype(str):
            rng = np.random.default_rng(_stable_seed(f"{self.session.seed}|{ticker}"))
            base = rng.uniform(10, 500)
            close = np.round(base * np.cumprod(1 + rng.normal(0, 0.02, self.period_days)), 4)
            op = np.round(close * (1 + rng.normal(0, 0.005, self.period_days)), 4)
            frames.append(
                pd.DataFrame(
                    {
                        "ticker": ticker,
                        "day": np.arange(self.period_days, dtype=np.int32),
                        "Open": op,
                        "High": np.round(np.maximum(op, close) * 1.01, 4),
                        "Low": np.round(np.minimum(op, close) * 0.99, 4),
                        "Close": close,
                        "Volume": rng.integers(1_000, 1_000_000, self.period_days),
                        "Adjusted": np.round(close * 0.997, 4),  # dropped by projection
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)


def market_data_to_columns(batch: pd.DataFrame) -> pd.DataFrame:
    """Column projection keeping OHLCV per ticker/day (the reference's
    ``_market_data_to_dict``, `yahoo_finance_client.py:69-79`)."""
    return batch[["ticker", "day", "Open", "High", "Low", "Close", "Volume"]]


def fetch_market_data(tickers: list[str], period_days: int = 5, concurrency: int = 4, seed: int = 42):
    """Parallel OHLCV fetch + projection over a ticker list."""
    import ray.data as rd

    ds = rd.from_items(
        [{"ticker": t} for t in tickers],
        override_num_blocks=max(1, min(len(tickers), concurrency * 4)),
    )
    raw = ds.map_batches(
        MarketDataStage,
        fn_constructor_kwargs=dict(period_days=period_days, seed=seed),
        batch_format="pandas",
        concurrency=pool_size(concurrency),
    )
    return raw.map_batches(market_data_to_columns, batch_format="pandas")


def fetch_fanout(
    items: list[dict[str, Any]],
    concurrency: int = 8,
    on_error: str = "skip",
    seed: int = 42,
    fail_every: int = 0,
):
    """``from_items(product) → map_batches(FetchStage, concurrency=N)``.

    Returns ``(ok_ds, quarantine_ds)`` — the quarantine dataset carries the
    failed items + error strings (per-item failure isolation as data, not
    exceptions).
    """
    import ray.data as rd

    ds = rd.from_items(items, override_num_blocks=max(1, min(len(items), concurrency * 4)))
    fetched = ds.map_batches(
        FetchStage,
        fn_constructor_kwargs=dict(on_error=on_error, seed=seed, fail_every=fail_every),
        batch_format="pandas",
        concurrency=pool_size(concurrency),
    )
    ok = fetched.map_batches(lambda b: b[b["ok"]], batch_format="pandas")
    quarantine = fetched.map_batches(lambda b: b[~b["ok"]], batch_format="pandas")
    return ok, quarantine


def eodhd_fanout(
    requests: list[dict[str, Any]],
    concurrency: int = 40,  # the processor's Semaphore(40), `eodhd_processor.py:240`
    on_error: str = "skip",
    seed: int = 42,
    fail_every: int = 0,
):
    """Fan out :class:`EODHDRequests`-built requests through the actor-pool
    fetch stage.  Endpoints carry heterogeneous param sets (``news`` has
    ``s``, bulk has ``type``, …), so params ride in ONE ``request_json``
    column — each request stays byte-faithful instead of being padded to a
    union schema with nulls."""
    items = [
        {
            "endpoint": r["endpoint"],
            "request_json": json.dumps(
                {k: v for k, v in r.items() if k != "endpoint"}, sort_keys=True
            ),
        }
        for r in requests
    ]
    return fetch_fanout(
        items, concurrency=concurrency, on_error=on_error, seed=seed, fail_every=fail_every
    )
