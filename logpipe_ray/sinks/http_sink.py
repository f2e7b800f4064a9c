"""HTTP egress sink — actor-pool stage with batching, retry, backoff.

Parity with the reference HttpSender (SURVEY.md §2.5 K1,
/root/reference/src/senders/httpSender.js:10-319): records buffer to
``batch_size`` (default 100), ship as a JSON array via POST/PUT, retry
each batch up to ``retries`` times with exponential backoff
``retry_delay * 2**(attempt-1)`` (httpSender.js:208-212), request
timeout, tail batch flushed, send stats accumulated.

Ray-native shape: a callable class on an actor pool — the persistent
HTTP connection state lives per actor; each __call__ ships one Arrow
batch as N HTTP batches and returns a tiny stats table (so the
pipeline stays streaming and the driver can aggregate send stats).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pyarrow as pa

from ray.data import Dataset


class HttpSink:
    def __init__(
        self,
        endpoint: str,
        method: str = "POST",
        batch_size: int = 100,
        retries: int = 3,
        retry_delay: float = 1.0,
        timeout: float = 30.0,
        headers: dict | None = None,
    ):
        self.endpoint = endpoint
        self.method = method
        self.batch_size = batch_size
        self.retries = retries
        self.retry_delay = retry_delay
        self.timeout = timeout
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def _send_one(self, records: list[dict]) -> int:
        """Send one HTTP batch with retry/backoff; returns retry count."""
        body = json.dumps(records).encode()
        last_exc: Exception | None = None
        for attempt in range(1, self.retries + 1):
            try:
                req = urllib.request.Request(
                    self.endpoint, data=body, method=self.method, headers=self.headers
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    if 200 <= resp.status < 300:
                        return attempt - 1
                    raise urllib.error.HTTPError(
                        self.endpoint, resp.status, "bad status", resp.headers, None
                    )
            except Exception as exc:  # noqa: BLE001 — any failure retries
                last_exc = exc
                if attempt < self.retries:
                    # exponential backoff: delay * 2^(attempt-1)
                    time.sleep(self.retry_delay * (2 ** (attempt - 1)))
        raise RuntimeError(
            f"HTTP sink failed after {self.retries} attempts: {last_exc}"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = batch.to_pylist()
        sent = batches = retries = 0
        for i in range(0, len(records), self.batch_size):
            chunk = records[i : i + self.batch_size]
            retries += self._send_one(chunk)
            sent += len(chunk)
            batches += 1
        return pa.table(
            {
                "records_sent": pa.array([sent], pa.int64()),
                "batches_sent": pa.array([batches], pa.int64()),
                "retries": pa.array([retries], pa.int64()),
            }
        )


def http_send(ds: Dataset, endpoint: str, concurrency=(1, 4), **kw) -> dict:
    """Ship a Dataset to an HTTP endpoint; returns aggregate send stats."""
    stats = ds.map_batches(
        HttpSink,
        fn_constructor_kwargs={"endpoint": endpoint, **kw},
        batch_format="pyarrow",
        batch_size=1000,
        concurrency=concurrency,
    ).to_pandas()
    return {
        "records_sent": int(stats["records_sent"].sum()),
        "batches_sent": int(stats["batches_sent"].sum()),
        "retries": int(stats["retries"].sum()),
    }
