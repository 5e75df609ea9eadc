"""Round-11 seating of the round-10 staged operators.

This is exactly the mechanical move registry_staged.py documents
(its module docstring, lines 11-13): each staged (query, oracle) pair —
already driven through tests/parity.compare by tests/test_staged_seats.py
in round 10 — is registered verbatim into the live registry. The staged
module stays the single definition site; this module only flips the
registration switch, so the diff between "staged" and "seated" is
importing this file.

Imported by __spark_entry__ (driver), tests/test_oracle_parity.py
(local parity sweep), and anything else that wants the full registry.
"""

from __future__ import annotations

from kafka_connect_oss_spark import registry_staged
from kafka_connect_oss_spark.registry import LAZY_ORACLES, register

for _name, _fn in registry_staged.STAGED_QUERIES.items():
    register(_name, registry_staged.STAGED_ORACLES.get(_name))(_fn)
LAZY_ORACLES.update(registry_staged.STAGED_LAZY_ORACLES)
