"""Round-16 seating of the round-15 staged operators.

Exactly the mechanical move registry_staged_r16.py documents (module
docstring SEATING CHECKLIST) and registry_seated_r15.py performed for
the r14 batch: each staged (query, oracle) pair — already driven
through tests/parity.compare at two SFs by tests/test_staged_seats_r16
in round 15, hardened at seating time (single-job labeled chunk drops
with the sentinel riding in the final chunk file, structural
watermark/sentinel coupling, reduced-shuffle replay span — the r15
VERDICT item 2 and ADVICE items), and re-proven with a fresh
5x-consecutive same-session stability run — is registered verbatim
into the live registry. The staged module stays the single definition
site; this module only flips the registration switch, so the diff
between "staged" and "seated" is importing this file. (This batch has
no lazy oracles, so there is no LAZY_ORACLES.update line.)

This seating lands the repo's first driver-attested rows through
RUNNING-AGGREGATE state (stream_sessionize_batch_equivalence: a
per-user (start, last, count) triple that must survive a mid-session
micro-batch boundary intact) and through the closed-window-emits-once
append invariant (stream_windowed_topk_batch_equivalence: per-batch
foreachBatch ranking equals global ranking ONLY because a closed
window's rows emit exactly once, in one batch).

Unlike the r15 seating (zero retirements), this one executes the
PLANNED_R16_RETIREMENTS trade written at r15: the registry stood at
capacity (150), so sessions_per_user and events_top_users_per_type —
each the batch variant whose machinery its streaming sibling attests
strictly more of — moved to __spark_entry__.RETIRED_SEATS with the
seating (150 - 2 + 2 = 150 exactly).

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r16
from kafka_connect_oss_spark.registry import register

for _name, _fn in registry_staged_r16.STAGED_QUERIES.items():
    register(_name, registry_staged_r16.STAGED_ORACLES.get(_name))(_fn)
