"""Per-partition lineage manifest — checkpoint/resume done right.

The reference's CheckpointManager (SURVEY.md §3.3,
/root/reference/src/utils/checkpointManager.js) keeps a byte-offset
cursor in a JSON file with atomic tmp+rename writes — but the cursor
is never advanced by the parsers, so resume is inert in the shipped
code. We reproduce the *intent* with partition-granular lineage:

Each completed partition group records
    {group_id, input_files, rows_in, rows_out, sink_counts,
     wall_s, rows_per_s, output_dir}
A resumed run lists completed groups, prunes their input files from
the read (no re-scan of finished work — file-granular skip, no read
amplification), deletes any half-written output dirs for incomplete
groups (idempotent re-run), and processes the remainder.

Manifest writes are atomic (tmp file + os.rename — the same pattern
as checkpointManager.js:146-152) so a kill can never leave a corrupt
or partially-updated manifest.
"""

from __future__ import annotations

import json
import os
import shutil


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.json")
        self.state: dict = {"version": 1, "groups": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    @property
    def groups(self) -> dict:
        return self.state["groups"]

    def completed_ids(self) -> set[str]:
        return set(self.state["groups"])

    def add_group(self, group_id: str, entry: dict) -> None:
        self.state["groups"][group_id] = entry
        self._save()

    def _save(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1, sort_keys=True)
        os.rename(tmp, self.path)

    def clean_incomplete_outputs(self, data_dir: str) -> list[str]:
        """Delete output dirs of groups not recorded complete."""
        removed = []
        if not os.path.isdir(data_dir):
            return removed
        done = self.completed_ids()
        for name in os.listdir(data_dir):
            gid = name.split("=", 1)[-1]
            if gid not in done:
                shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)
                removed.append(name)
        return removed

    def total_counts(self) -> dict[tuple[str, str], int]:
        totals: dict[tuple[str, str], int] = {}
        for entry in self.state["groups"].values():
            for item in entry.get("sink_counts", []):
                key = (item["source"], item["sink"])
                totals[key] = totals.get(key, 0) + item["cnt"]
        return totals
