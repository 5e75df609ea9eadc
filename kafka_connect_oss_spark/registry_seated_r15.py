"""Round-15 seating of the round-14 staged operators.

Exactly the mechanical move registry_staged_r15.py documents (module
docstring SEATING CHECKLIST) and registry_seated_r14.py performed for
the r13 batch: each staged (query, oracle) pair — already driven
through tests/parity.compare at two SFs by tests/test_staged_seats_r15
in round 14, hardened at seating time (lazy ephemeral sinks instead of
driver collects, sentinel mtime pin, tempdir-unique state database),
and re-proven with a fresh 5x-consecutive same-session stability run —
is registered verbatim into the live registry. The staged module stays
the single definition site; this module only flips the registration
switch, so the diff between "staged" and "seated" is importing this
file. (This batch has no lazy oracles, so there is no
LAZY_ORACLES.update line.)

This seating lands the repo's first driver-attested rows through the
applyInPandasWithState STATE-STORE path (stream_asof_batch_equivalence,
sentinel-flushed to full determinism) and through streaming state that
GROWS (stream_incremental_dedup_refresh: bucketed base tables +
per-batch classify + kept-doc fold across two stream epochs with
checkpoint resume).

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r15
from kafka_connect_oss_spark.registry import register

for _name, _fn in registry_staged_r15.STAGED_QUERIES.items():
    register(_name, registry_staged_r15.STAGED_ORACLES.get(_name))(_fn)
