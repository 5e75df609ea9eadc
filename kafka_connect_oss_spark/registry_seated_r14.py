"""Round-14 seating of the round-13 staged operators.

Exactly the mechanical move registry_staged_r14.py documents (module
docstring SEATING CHECKLIST) and registry_seated_r13.py performed for
the r12 batch: each staged (query, oracle) pair — already driven
through tests/parity.compare by tests/test_staged_seats_r14.py in
round 13, and (for the streaming row) through a 5x-consecutive
stability run at seating time — is registered verbatim into the live
registry. The staged module stays the single definition site; this
module only flips the registration switch, so the diff between
"staged" and "seated" is importing this file. (This batch has no lazy
oracles, so there is no LAZY_ORACLES.update line.)

This seating lands the repo's first driver-attested row whose value
flows through writeStream/foreachBatch STATE
(stream_cms_batch_equivalence) alongside the all-pairs KMV overlap
planner (sketch_kmv_source_overlap).

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r14
from kafka_connect_oss_spark.registry import register

for _name, _fn in registry_staged_r14.STAGED_QUERIES.items():
    register(_name, registry_staged_r14.STAGED_ORACLES.get(_name))(_fn)
