"""Round-17 seating of the round-16 staged operators.

Exactly the mechanical move registry_staged_r17.py documents (module
docstring SEATING CHECKLIST) and registry_seated_r16.py performed for
the r15 batch: each staged (query, oracle) pair — already driven
through tests/parity.compare at two SFs by tests/test_staged_seats_r17
in round 16, de-risked end-to-end at r15 by
scripts/probe_r17_monitors.py — is registered verbatim into the live
registry. The staged module stays the single definition site; this
module only flips the registration switch, so the diff between
"staged" and "seated" is importing this file. (This batch has no lazy
oracles, so there is no LAZY_ORACLES.update line.)

This seating lands the repo's first driver-attested rows through the
STATELESS foreachBatch telemetry path: per-micro-batch append-only
monitoring (batch labeling, per-batch re-aggregation, restart-safe
dynamic-overwrite output) — stream_ingest_qc_batch_equivalence (the
ingest-time quality monitor) and
stream_drift_monitor_batch_equivalence (per-batch drift scoring
against a fixed baseline corpus).

Capacity arithmetic (the r12 policy in __spark_entry__.py): the
registry stood at 150 and the r17 window carries SIX hard seats
(2 staged + 4 r16-REWRITTEN rows), so this seating executes the FIVE
PLANNED_R17_RETIREMENTS written at r16 into RETIRED_SEATS
(sim_random_projection, sim_ann_recall_eval, corpus_duplicate_spans,
text_bpe_pair_stats, sim_embedding_quantize — each a variant / eval /
first-stage row with named driver-visible siblings, all in the
r14-attested cohort so the rotation obligation shrinks 49 -> 44).
Window = 2 staged + 4 rewritten + 44 = 50 exactly, zero deferrals;
registry after seating = 150 - 5 + 2 = 147.

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r17
from kafka_connect_oss_spark.registry import register

for _name, _fn in registry_staged_r17.STAGED_QUERIES.items():
    register(_name, registry_staged_r17.STAGED_ORACLES.get(_name))(_fn)
