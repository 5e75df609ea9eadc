"""Round-12 seating of the round-11 staged operators.

Exactly the mechanical move registry_staged_r12.py documents (module
docstring, lines 4-8) and registry_seated.py performed for the r10
batch: each staged (query, oracle) pair — already driven through
tests/parity.compare by tests/test_staged_seats_r12.py in round 11 —
is registered verbatim into the live registry. The staged module stays
the single definition site; this module only flips the registration
switch, so the diff between "staged" and "seated" is importing this
file.

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r12
from kafka_connect_oss_spark.registry import LAZY_ORACLES, register

for _name, _fn in registry_staged_r12.STAGED_QUERIES.items():
    register(_name, registry_staged_r12.STAGED_ORACLES.get(_name))(_fn)
LAZY_ORACLES.update(registry_staged_r12.STAGED_LAZY_ORACLES)
