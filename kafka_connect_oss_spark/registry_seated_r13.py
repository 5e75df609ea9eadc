"""Round-13 seating of the round-12 staged operators.

Exactly the mechanical move registry_staged_r13.py documents (module
docstring SEATING CHECKLIST) and registry_seated_r12.py performed for
the r11 batch: each staged (query, oracle) pair — already driven
through tests/parity.compare by tests/test_staged_seats_r13.py in
round 12 — is registered verbatim into the live registry. The staged
module stays the single definition site; this module only flips the
registration switch, so the diff between "staged" and "seated" is
importing this file. (This batch has no lazy oracles, so there is no
LAZY_ORACLES.update line.)

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged_r13
from kafka_connect_oss_spark.registry import register

for _name, _fn in registry_staged_r13.STAGED_QUERIES.items():
    register(_name, registry_staged_r13.STAGED_ORACLES.get(_name))(_fn)
