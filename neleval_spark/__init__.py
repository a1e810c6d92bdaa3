"""neleval_spark — a PySpark-native knowledge-graph construction and
entity-linking evaluation engine.

Re-expresses the capabilities of the ``neleval`` toolkit (TAC-KBP entity
linking / NER / coreference evaluation) as distributed Spark SQL /
DataFrame plans, and adds the construction-side pipeline (text
extraction, NER, candidate generation, entity-link scoring,
cross-document canonicalization, triple materialization) that neleval
only consumes the output of.

Design rules (see SURVEY.md §7.0):

* everything rides one normalized ``mentions`` schema;
* every measure is a generated DataFrame plan parameterized by
  ``(key, filter, agg, weighting)`` — the catalog mirrors the
  reference's ``neleval/configs.py:12-41`` verbatim;
* all metrics stay additive in ``(ptp, fp, rtp, fn)`` per group so
  micro/macro/bootstrap/permutation reuse one per-doc contingency
  table (reference: neleval/evaluate.py:246-257).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
