"""Column-expression builders (all JVM-side built-ins — no Python UDFs in
hot paths). Text analysis for LLM data pipelines lives in text.py,
vector/similarity math in vectors.py."""
