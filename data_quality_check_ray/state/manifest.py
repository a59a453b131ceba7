"""Partition manifest: deterministic ids + done-set for checkpoint/resume.

The generalization of the reference config-producer's mtime map
(``config-producer-proto/src/main.rs:62-63,216-241`` — re-upload only
changed files): partitions are keyed by a deterministic id + input
fingerprint; a rerun processes only partitions whose (id, fingerprint) is
not marked done.  Output partitions are written to a temp dir and renamed
(atomic on POSIX), so a partition is either fully present or absent.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Partition:
    partition_id: str
    files: tuple[str, ...]
    fingerprint: str


def plan_partitions(input_files: list[str], files_per_partition: int = 4) -> list[Partition]:
    """Deterministic partitioning of sorted input files into contiguous
    groups; fingerprint covers file names + sizes."""
    files = sorted(input_files)
    parts = []
    for k, i in enumerate(range(0, len(files), files_per_partition)):
        group = tuple(files[i : i + files_per_partition])
        h = hashlib.md5()
        for f in group:
            h.update(f.encode())
            h.update(str(os.path.getsize(f)).encode())
        parts.append(Partition(f"{k:05d}", group, h.hexdigest()))
    return parts


@dataclass
class Manifest:
    path: str
    entries: dict[str, dict] = field(default_factory=dict)

    @classmethod
    def load(cls, out_dir: str) -> "Manifest":
        path = os.path.join(out_dir, "_manifest.jsonl")
        m = cls(path)
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        m.entries[e["partition_id"]] = e
        return m

    def is_done(self, p: Partition) -> bool:
        e = self.entries.get(p.partition_id)
        return bool(e and e.get("status") == "done" and e.get("fingerprint") == p.fingerprint)

    def mark_done(self, p: Partition, metrics: dict) -> None:
        e = {
            "partition_id": p.partition_id,
            "fingerprint": p.fingerprint,
            "status": "done",
            "files": list(p.files),
            **metrics,
        }
        self.entries[p.partition_id] = e
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(e) + "\n")
