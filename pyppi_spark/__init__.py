"""pyppi_spark — a PySpark-native point-in-time / windowed feature-engineering engine.

Re-expresses the query semantics of the reference engine (aerijman/pyPPI — a
single-node per-entity feature-extraction pipeline, see ``SURVEY.md``) as an
idiomatic Spark DataFrame engine over ordered multi-turn transcript tables:

- as-of (point-in-time) joins        (reference: nearest-neighbor join,
  ``/root/reference/pyPPI/kdtree.py:38-48``)
- range / band joins                 (reference: radius neighbor join,
  ``/root/reference/pyPPI/kdtree.py:28-36``)
- gap-based sessionization           (reference: residue runs,
  ``/root/reference/pyPPI/resReduce.py:97-106``)
- lag/lead offset features           (reference: ``getNextAtoms``,
  ``/root/reference/pyPPI/pdbReader.py:160-170``)
- backfill / forward-fill            (reference: last-preceding-valid-row,
  ``/root/reference/pyPPI/ASA.py:166-176``)
- per-entity feature aggregation     (reference: per-complex feature rows,
  ``/root/reference/bin/setupPpiDb.py:318-359``)

plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis) that the target domain needs.

Everything is built on the public PySpark DataFrame/SQL API; kernels that
Spark cannot express natively use Arrow-vectorized pandas UDFs
(``applyInPandas`` / ``mapInPandas``) — never per-row Python.
"""

__version__ = "0.1.0"
