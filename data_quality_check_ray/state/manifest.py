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


def _fingerprint(group: tuple[str, ...]) -> str:
    # name + size + mtime: a rewrite that keeps the byte size still
    # invalidates the partition (the reference's mtime-map behavior,
    # config-producer-proto/src/main.rs:216-241)
    h = hashlib.md5()
    for f in group:
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()


def plan_partitions(input_files: list[str], files_per_partition: int = 4) -> list[Partition]:
    """Deterministic partitioning of sorted input files into contiguous
    groups; fingerprint covers file names + sizes."""
    files = sorted(input_files)
    parts = []
    for k, i in enumerate(range(0, len(files), files_per_partition)):
        group = tuple(files[i : i + files_per_partition])
        parts.append(Partition(f"{k:05d}", group, _fingerprint(group)))
    return parts


def plan_partitions_hashed(input_files: list[str], num_groups: int) -> list[Partition]:
    """Append-stable partitioning: each file lands in the group given by a
    stable hash of its BASENAME, so adding new input files leaves every
    existing group's membership (and fingerprint) unchanged — only the
    groups receiving new files are reprocessed on resume.

    ``num_groups`` must stay constant across runs of one job (record it
    alongside the output); contiguous ``plan_partitions`` is the default
    when the input set is fixed up front."""
    groups: list[list[str]] = [[] for _ in range(num_groups)]
    for f in sorted(input_files):
        g = int.from_bytes(
            hashlib.md5(os.path.basename(f).encode()).digest()[:4], "little"
        ) % num_groups
        groups[g].append(f)
    parts = []
    for k, members in enumerate(groups):
        if not members:
            continue
        group = tuple(members)
        parts.append(Partition(f"{k:05d}", group, _fingerprint(group)))
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

    def remove(self, partition_ids: list[str]) -> None:
        """Drop entries (e.g. for cleaned stale partitions) and REWRITE the
        manifest file — leaving a 'done' entry for a deleted output dir
        would let a later replan skip it and report complete with missing
        data."""
        for pid in partition_ids:
            self.entries.pop(pid, None)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for e in self.entries.values():
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self.path)

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
