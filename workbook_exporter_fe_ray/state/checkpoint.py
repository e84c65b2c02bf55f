"""Checkpoint manifest: per-partition lineage + metrics, resumable runs.

The manifest is a JSON sidecar in the output directory recording, for
every completed partition: its id, the input fragment paths it covered,
row/point/byte counts, and wall time. A re-run skips completed
partitions (the engine's anti-join against existing output) and only
recomputes the rest; partition writes are atomic (write to a temp dir,
then rename) so a killed run never leaves a half-written partition
marked done.

Reference parity (SURVEY.md §2.3 ST2 / §2.4 J1/J2): the reference's
"resume" is re-reading the output YAML file once per input row
(``/root/reference/workbook_exporter-fe.py:1741-1754``) and upsert-
merging into it (``:1758-1767``) — O(rows × output-size) I/O. Here the
dedup index is a manifest of done partition ids, loaded once and
consulted in O(1) per partition; the run-level header metadata is the
analog of ``add_snmp_args`` (``:1593-1618``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class PartitionRecord:
    """Lineage + metrics for one completed output partition.

    Lineage is (partition id, input fragment paths, row ranges);
    metrics are rows/s, bytes compressed, and object-store shuffle
    spill — the fields a resume or an audit needs without re-reading
    any data.
    """

    partition_id: int
    input_fragments: list[str]
    # [path, row_start, row_end) per fragment — whole-file fragments
    # record [p, 0, num_rows] from the parquet footer
    input_row_ranges: list = field(default_factory=list)
    rows_in: int = 0
    points: int = 0
    tier_rows: dict[str, int] = field(default_factory=dict)
    chunk_count: int = 0
    compressed_bytes: int = 0
    raw_point_bytes: int = 0
    wall_s: float = 0.0
    points_per_s: float = 0.0
    spilled_bytes: int = 0
    status: str = "done"


class Manifest:
    """Atomic JSON manifest at ``<out_dir>/manifest.json``."""

    def __init__(self, out_dir: str, metadata: dict[str, Any] | None = None):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.json")
        self.metadata: dict[str, Any] = metadata or {}
        self.partitions: dict[int, PartitionRecord] = {}
        os.makedirs(out_dir, exist_ok=True)
        if os.path.exists(self.path):
            self._load()
        else:
            self._flush()

    def _load(self) -> None:
        with open(self.path) as f:
            doc = json.load(f)
        self.metadata = doc.get("metadata", self.metadata)
        self.partitions = {
            int(k): PartitionRecord(**v) for k, v in doc.get("partitions", {}).items()
        }

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "metadata": self.metadata,
                    "partitions": {k: asdict(v) for k, v in self.partitions.items()},
                    "updated_at": time.time(),
                },
                f,
                indent=1,
            )
        os.replace(tmp, self.path)

    @property
    def done_partitions(self) -> set[int]:
        return {k for k, v in self.partitions.items() if v.status == "done"}

    def mark_done(self, rec: PartitionRecord) -> None:
        self.partitions[rec.partition_id] = rec
        self._flush()

    def totals(self) -> dict[str, Any]:
        done = [p for p in self.partitions.values() if p.status == "done"]
        tier_rows: dict[str, int] = {}
        for p in done:
            for t, n in p.tier_rows.items():
                tier_rows[t] = tier_rows.get(t, 0) + n
        return {
            "partitions_done": len(done),
            "rows_in": sum(p.rows_in for p in done),
            "points": sum(p.points for p in done),
            "tier_rows": tier_rows,
            "chunk_count": sum(p.chunk_count for p in done),
            "compressed_bytes": sum(p.compressed_bytes for p in done),
            "raw_point_bytes": sum(p.raw_point_bytes for p in done),
            "wall_s": sum(p.wall_s for p in done),
            "spilled_bytes": sum(p.spilled_bytes for p in done),
        }


def fragment_row_ranges(paths: list[str]) -> list[list]:
    """``[path, row_start, row_end)`` lineage for whole-file fragments:
    one parquet-footer read per file (no data scan)."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        try:
            out.append([p, 0, pq.ParquetFile(p).metadata.num_rows])
        except Exception:  # non-parquet / remote fragment: range unknown
            out.append([p, 0, -1])
    return out


def dataset_spill_bytes(ds) -> int:
    """Best-effort object-store spill attributed to a materialized
    Dataset (0 when the stats summary can't report — the field is a
    metric, never a correctness input)."""
    try:
        return int(ds._get_stats_summary().dataset_bytes_spilled)
    except Exception:
        return 0


def atomic_dir_write(final_dir: str):
    """Context manager: yields a staging dir, renames to final on success.

    Idempotent under retries: a pre-existing final dir is replaced whole.
    """

    class _Ctx:
        def __enter__(self) -> str:
            self.staging = final_dir + ".staging"
            if os.path.exists(self.staging):
                shutil.rmtree(self.staging)
            os.makedirs(self.staging, exist_ok=True)
            return self.staging

        def __exit__(self, exc_type, exc, tb) -> bool:
            if exc_type is None:
                if os.path.exists(final_dir):
                    shutil.rmtree(final_dir)
                os.replace(self.staging, final_dir)
            else:
                shutil.rmtree(self.staging, ignore_errors=True)
            return False

    return _Ctx()
