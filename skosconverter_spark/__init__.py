"""skosconverter_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of proycon/skosConverter
(reference: /root/reference/skos_converter.py) as a distributed Spark
pipeline: triple extraction from documents (Turtle / Notion-markdown /
JSON-LD), SKOS validation, hierarchy materialization, Notion-format
rendering (CSV/Markdown/JSON/Confluence-XML), plus the web-scale KG
construction stages (HTML→text extraction, mention detection, entity
linking, canonicalization closure) the reference's design generalizes to.

Everything is DataFrame/SQL + Arrow-batched UDFs; no per-row Python.
"""

__version__ = "0.1.0"

from skosconverter_spark.config import EngineConfig  # noqa: F401
from skosconverter_spark.session import get_spark  # noqa: F401
