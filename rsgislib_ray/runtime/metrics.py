"""Per-stage metrics + lineage records.

Thin layer: stage timings come from Ray Data's own ``ds.stats()``
(wall/cpu/mem per operator); this module adds pipeline-level rows/sec
accounting and a lineage builder shared with the checkpoint manifests.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class PipelineMetrics:
    name: str
    started: float = field(default_factory=time.time)
    records: list[dict] = field(default_factory=list)

    @contextmanager
    def stage(self, stage_name: str, **params):
        t0 = time.perf_counter()
        rec = {"stage": stage_name, "params": params}
        try:
            yield rec
        finally:
            rec["wall_sec"] = round(time.perf_counter() - t0, 4)
            self.records.append(rec)

    def lineage(self) -> list[dict]:
        return [
            {"op": r["stage"], "params": r.get("params", {})} for r in self.records
        ]

    def report(self, rows: int | None = None) -> dict:
        total = time.time() - self.started
        out = {
            "pipeline": self.name,
            "total_sec": round(total, 4),
            "stages": self.records,
        }
        if rows is not None:
            out["rows"] = rows
            out["rows_per_sec"] = round(rows / total, 2) if total > 0 else None
        return out

    def dump(self, path: str, rows: int | None = None) -> None:
        with open(path, "w") as f:
            json.dump(self.report(rows), f, indent=1)
