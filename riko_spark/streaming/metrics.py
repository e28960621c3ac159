"""Per-micro-batch lineage + metrics (north rule requirement).

A ``StreamingQueryListener`` records every progress event: batch id,
input rows/sec, watermark, state-store rows, and source offset ranges
(the per-partition lineage — which offsets fed which batch).  Records
accumulate in memory and can be persisted as JSON for audit.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class LineageListener(StreamingQueryListener):
    def __init__(self, out_dir: str | None = None):
        self.records: list[dict[str, Any]] = []
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.records.append({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "event": "progress",
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": p.batchDuration,
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
            "state_rows": [s.numRowsTotal for s in p.stateOperators],
            # lineage: exact source offset ranges consumed by this batch
            "sources": [
                {"description": s.description,
                 "start_offset": s.startOffset,
                 "end_offset": s.endOffset,
                 "input_rows": s.numInputRows}
                for s in p.sources
            ],
        }
        self.records.append(rec)
        if self.out_dir:
            path = os.path.join(self.out_dir, f"progress_{p.batchId}.json")
            with open(path, "w") as f:
                json.dump(rec, f, default=str)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.records.append({"event": "terminated", "id": str(event.id)})
