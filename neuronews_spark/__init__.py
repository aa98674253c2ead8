"""neuronews_spark — a from-scratch, PySpark-native record-linkage engine.

Re-creates the entity-linking / knowledge-graph core of the reference
(Ikey168/NeuroNews) as an idiomatic Spark pipeline over an Iceberg/parquet
table of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

    conversations  — window-ordered turn concatenation
    mentions       — deterministic heuristic NER (capitalised sequences)
    blocking       — exact-norm / sorted-token / surname / MinHash-LSH keys
    scoring        — Arrow-vectorized pair predicates (person-compat,
                     token containment, difflib ratio, TF-IDF / embedding cosine)
    clustering     — iterative connected components (large-star / small-star)
    canonicalize   — canonical ids, alias sets, display-name election,
                     edge remapping + provenance accumulation

Everything is built on the public PySpark DataFrame API; heavy per-pair text
kernels run inside Arrow-batched pandas UDFs (never row-at-a-time Python).
"""

__version__ = "0.1.0"
