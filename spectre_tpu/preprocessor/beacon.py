"""Beacon-node REST client (the beacon-api-client analog, SURVEY.md §2b).

Endpoints mirror preprocessor/src/lib.rs:26-126. Transport is pluggable so
tests inject fixtures; the default uses urllib (no extra deps) with
bounded exponential-backoff retries on transient failures (the reference
client's reqwest retry middleware analog).
"""
from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Callable, Optional


class BeaconClient:
    def __init__(self, base_url: str,
                 fetch: Optional[Callable[[str], dict]] = None,
                 retries: int = 3, backoff_s: float = 0.5):
        self.base = base_url.rstrip("/")
        self._fetch = fetch or self._http_get
        self.retries = retries
        self.backoff_s = backoff_s

    def _http_get(self, path: str) -> dict:
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                with urllib.request.urlopen(self.base + path,
                                            timeout=30) as r:
                    return json.load(r)
            except urllib.error.HTTPError as e:
                # only transient server-side statuses are retried;
                # 4xx (bad request / not found) surfaces immediately
                if e.code not in (429, 500, 502, 503, 504):
                    raise
                last = e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last = e
            if attempt < self.retries:
                time.sleep(self.backoff_s * (2 ** attempt))
        raise last

    def get(self, path: str) -> dict:
        return self._fetch(path)

    # ---- endpoints (preprocessor/src/lib.rs analogs) ----
    def light_client_update_at_period(self, period: int) -> dict:
        d = self.get(f"/eth/v1/beacon/light_client/updates"
                     f"?start_period={period}&count=1")
        return d[0]["data"] if isinstance(d, list) else d["data"]

    def light_client_bootstrap(self, block_root: str) -> dict:
        return self.get(
            f"/eth/v1/beacon/light_client/bootstrap/{block_root}")["data"]

    def light_client_finality_update(self) -> dict:
        return self.get("/eth/v1/beacon/light_client/finality_update")["data"]

    def beacon_header(self, block_id: str = "head") -> dict:
        return self.get(f"/eth/v1/beacon/headers/{block_id}")["data"]

    def block_root(self, block_id: str) -> str:
        return self.get(f"/eth/v1/beacon/blocks/{block_id}/root")["data"]["root"]

    def genesis(self) -> dict:
        return self.get("/eth/v1/beacon/genesis")["data"]

    def fork(self, state_id: str = "head") -> dict:
        return self.get(f"/eth/v1/beacon/states/{state_id}/fork")["data"]
