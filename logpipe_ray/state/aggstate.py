"""Incremental keyed-aggregate state: materialized-view maintenance.

At 100 TB you never recompute a global aggregate because one day of
data landed — you merge the new wave's partials into the persisted
state. This module keeps a versioned on-disk count state
(`state_v{N}/` parquet directories + a JSON head pointer) and merges
each new wave with ONE keyed aggregate over (old state ∪ new
partials). Because count partials are mergeable, the merge cost is
O(distinct keys + wave partials), independent of history volume.

Exactly-once: the head pointer records every applied wave id;
re-applying a wave (crash replay, at-least-once upstream) is a
detected no-op. The head write is atomic tmp+rename (same pattern as
state/manifest.py) and points at a fully-written state directory, so
a crash mid-merge leaves the previous state live and the partial
directory orphaned (cleaned on the next merge).

The reference has no incremental aggregation; this is beyond-reference
surface paired with the incremental-ingest resume (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

from ray.data import Dataset


MERGE_DRIVER_ROWS = 5_000_000  # driver-merge guard, ~tokens._merge_count_partials


class CountState:
    """Versioned (keys -> int64 sum) state under ``root``."""

    def __init__(self, root: str, keys: list[str], value_col: str = "cnt"):
        self.root = root
        self.keys = list(keys)
        self.value_col = value_col
        os.makedirs(root, exist_ok=True)
        self.head_path = os.path.join(root, "HEAD.json")

    # ------------------------------------------------------------- head I/O
    def _head(self) -> dict:
        if not os.path.exists(self.head_path):
            return {"version": 0, "state_dir": None, "applied_waves": []}
        with open(self.head_path) as f:
            return json.load(f)

    def _commit_head(self, head: dict) -> None:
        tmp = self.head_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(head, f)
        os.rename(tmp, self.head_path)

    def applied_waves(self) -> list[str]:
        return list(self._head()["applied_waves"])

    # --------------------------------------------------------------- update
    def update(self, wave_id: str, partials: Dataset) -> bool:
        """Merge one wave of (keys..., value_col) rows into the state.

        Returns False (no-op) when ``wave_id`` was already applied.
        ``partials`` rows need not be pre-aggregated — the single
        keyed aggregate collapses duplicates from both sides at once.
        """
        import ray.data as rd
        from ray.data.aggregate import Sum

        head = self._head()
        if wave_id in head["applied_waves"]:
            return False
        self._gc(head)

        merged = partials
        if head["state_dir"] is not None:
            old = rd.read_parquet(os.path.join(self.root, head["state_dir"]))
            merged = merged.union(old)

        new_ver = head["version"] + 1
        new_dir = f"state_v{new_ver}"
        tmp_dir = os.path.join(self.root, new_dir + ".tmp")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        merged = merged.materialize()
        if merged.count() <= MERGE_DRIVER_ROWS:
            # bounded driver merge: below the guard the whole (state ∪
            # partials) table is a few MB and one Arrow group_by beats
            # the keyed exchange's ~1 s fixed cost (same routing rule
            # as tokens._merge_count_partials); above it the
            # distributed keyed aggregate runs
            import pyarrow.parquet as pq
            import ray as _ray

            blocks = [
                t
                for t in _ray.get(merged.to_arrow_refs())
                if t.num_columns
            ]
            tbl = (
                pa.concat_tables(blocks)
                .group_by(self.keys)
                .aggregate([(self.value_col, "sum")])
                .rename_columns(self.keys + [self.value_col])
            )
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(tbl, os.path.join(tmp_dir, "state.parquet"))
        else:
            out = merged.groupby(self.keys).aggregate(
                Sum(self.value_col, alias_name=self.value_col)
            )
            out.write_parquet(tmp_dir)
        os.rename(tmp_dir, os.path.join(self.root, new_dir))
        new_head = {
            "version": new_ver,
            "state_dir": new_dir,
            "applied_waves": head["applied_waves"] + [wave_id],
        }
        self._commit_head(new_head)
        # the merge has fully executed (write_parquet is eager), so the
        # superseded version can go now rather than at the next update
        self._gc(new_head)
        return True

    def _gc(self, head: dict) -> None:
        """Drop orphaned .tmp dirs and superseded state versions
        (keep the live one; old versions are dead weight at scale)."""
        live = head["state_dir"]
        for name in os.listdir(self.root):
            full = os.path.join(self.root, name)
            if not os.path.isdir(full) or not name.startswith("state_v"):
                continue
            if name != live:
                shutil.rmtree(full, ignore_errors=True)

    # ----------------------------------------------------------------- read
    def read(self) -> Dataset:
        import ray.data as rd

        head = self._head()
        if head["state_dir"] is None:
            schema = pa.schema(
                [(k, pa.string()) for k in self.keys]
                + [(self.value_col, pa.int64())]
            )
            return rd.from_arrow(schema.empty_table())
        return rd.read_parquet(os.path.join(self.root, head["state_dir"]))
