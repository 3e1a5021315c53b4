"""Per-partition lineage + resumable checkpoint manifest (north rule).

Batch model: the unit of progress is the *source log* (`source` column —
one uploaded file in the reference, one doc range at scale). Each commit
appends a manifest record with the set of processed sources, per-sink
routed-row counts, and aggregate fingerprints. A resumed run anti-joins
its input against the manifest and processes only new sources, exactly
like the reference's Datastore dedup but at file granularity.

The manifest is newline-delimited JSON under <checkpoint_dir>/manifest/ —
atomic per-commit files (write-to-temp + rename), readable without Spark.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Manifest:
    def __init__(self, checkpoint_dir: str):
        self.dir = os.path.join(checkpoint_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as fh:
                for line in fh:
                    if line.strip():
                        out.append(json.loads(line))
        return out

    def processed_sources(self) -> set[str]:
        done: set[str] = set()
        for rec in self.records():
            done.update(rec.get("sources", []))
        return done

    def new_commit_id(self, sources: list[str]) -> str:
        """Commit id DERIVED from the (sorted) source set, allocated before
        any write. Determinism is what makes replay exactly-once: a crash
        between the writes and commit() leaves an orphaned output
        directory, and because the replay processes the same still-
        uncommitted sources it computes the SAME id and overwrites the
        orphan in place — a random id would write a second directory and
        partition-discovery readers would see both (duplicate rows).

        The overwrite-in-place guarantee requires the replayed source set
        to be identical; if new sources arrive before the replay, the id
        differs and the orphan survives this mechanism. That case is
        closed by cli.gc_orphan_commits, which removes any commit=* dir
        the manifest does not reference before the run writes."""
        digest = hashlib.sha256(
            "\n".join(sorted(sources)).encode("utf-8")).hexdigest()[:16]
        return f"c{digest}"

    def commit(self, sources: list[str], sink_counts: dict[str, int],
               metrics: dict | None = None,
               commit_id: str | None = None) -> str:
        commit_id = commit_id or self.new_commit_id(sources)
        rec = {
            "commit_id": commit_id,
            "ts_unix": time.time(),
            "sources": sorted(sources),
            "sink_counts": sink_counts,
            "metrics": metrics or {},
        }
        tmp = os.path.join(self.dir, f".{commit_id}.tmp")
        final = os.path.join(self.dir, f"{commit_id}.json")
        with open(tmp, "w") as fh:
            fh.write(json.dumps(rec) + "\n")
        os.rename(tmp, final)  # atomic commit
        return commit_id


def filter_unprocessed(tokens: DataFrame, manifest: Manifest) -> DataFrame:
    """Drop rows of already-committed sources (resume-from-checkpoint)."""
    done = manifest.processed_sources()
    if not done:
        return tokens
    return tokens.filter(~F.col("source").isin(sorted(done)))
