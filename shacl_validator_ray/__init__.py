"""shacl_validator_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the semantics of the reference `mjanez/shacl-validator`
(RDF parsing/normalization, SHACL-core validation, validation-report
algebra, DCAT entity discovery) as distributed ``ray.data.Dataset``
pipelines over Arrow, extended into a KG-construction pipeline
(triple extraction → SHACL validation → entity linking →
canonicalization → graph materialization) per ``BASELINE.json``.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
