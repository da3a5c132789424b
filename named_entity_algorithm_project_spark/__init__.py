"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference
``Rkl2023/Named_entity_algorithm_project`` (a single-process pandas/Streamlit
NER explorer, see /root/reference/app.py) as an idiomatic Spark pipeline over
transcript tables::

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      -> extract   : Arrow-batched mention detection + rule typing (UDF)
      -> triples   : per-turn PROP_NAME<->PROP_VALUE nearest join
      -> link      : char-ngram TF-IDF blocked similarity + alias/abbrev edges
      -> canonical : connected components (iterative joins) + canonical pick
      -> materialize : partitioned tables + per-partition lineage, resumable

Nothing here is a port: the reference tells us WHAT to compute (operators,
dictionaries, thresholds, triple semantics); the execution strategy is
DataFrame/Catalyst-first.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
