"""Cross-sink transaction-log comparison.

Both sinks emit the same *protocol*: a directory of versioned JSON-lines
commit files holding ``commitInfo`` / ``metaData`` / ``txn`` / ``add`` /
``remove`` actions — ``DeltaLikeTable`` under ``_kdi_log/``, real Delta
Lake under ``_delta_log/`` (reference src/delta_helpers.rs:15-40 builds
the identical action stream through the delta-rs crate). This module
normalizes either log into an engine-independent description so a
contract test (tests/test_sink_contract.py) can assert that the two
sinks — and any recorded fixture — produce equivalent action streams
for the same batch sequence.

Normalization drops everything non-deterministic or engine-private
(timestamps, uuid file names, byte sizes, engine commit provenance) and
keeps everything semantic: operation category, txn (appId, version)
pairs, per-commit add/remove counts, per-file record counts, and
partition values.
"""

from __future__ import annotations

import json
import os

#: operation-name → category, covering both this repo's operation strings
#: and the names real Delta writers emit for the same actions.
_OP_CATEGORY = {
    "STREAMING UPDATE": "append",
    "WRITE": "append",
    "STREAMING_UPDATE": "append",
    "DELETE": "delete",
    "MERGE": "merge",
    "OPTIMIZE": "optimize",
    "CHANGE SCHEMA": "metadata",
    "CREATE TABLE": "metadata",
    "CREATE OR REPLACE TABLE": "metadata",
    "ADD COLUMNS": "metadata",
}


def _log_dir(table_path: str) -> str:
    for d in ("_kdi_log", "_delta_log"):
        p = os.path.join(table_path, d)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(f"no _kdi_log or _delta_log under {table_path}")


def normalize_log(table_path: str) -> list[dict]:
    """One normalized dict per commit version, in order."""
    log = _log_dir(table_path)
    versions = sorted(
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    )
    out = []
    for v in versions:
        ops, txns, adds, removes = [], [], [], 0
        meta = False
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                a = json.loads(line)
                if "commitInfo" in a:
                    op = a["commitInfo"].get("operation", "")
                    ops.append(_OP_CATEGORY.get(op, op.lower()))
                elif "txn" in a:
                    txns.append([a["txn"]["appId"], a["txn"]["version"]])
                elif "add" in a:
                    stats = a["add"].get("stats")
                    if isinstance(stats, str):
                        stats = json.loads(stats)
                    adds.append(
                        {
                            "partitionValues": dict(
                                a["add"].get("partitionValues", {})
                            ),
                            "numRecords": (stats or {}).get("numRecords"),
                        }
                    )
                elif "remove" in a:
                    removes += 1
                elif "metaData" in a:
                    meta = True
        adds.sort(key=lambda d: (sorted(d["partitionValues"].items()), d["numRecords"]))
        out.append(
            {
                "version": v,
                "operation": ops[0] if ops else None,
                "metaData": meta,
                "txn": sorted(txns),
                "numAdds": len(adds),
                "numRemoves": removes,
                "numRecords": sum(a["numRecords"] or 0 for a in adds),
                "adds": adds,
            }
        )
    return out
