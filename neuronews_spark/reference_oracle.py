"""Greedy reference-semantics oracle (driver-side, test ground truth only).

A clean-room re-implementation of the *decision procedure* of the
reference resolver (``/root/reference/src/knowledge_graph/foundation/
resolution.py:113-226``) used to label synthetic corpora: it processes
mentions sequentially, in insertion order, exactly like the reference —
exact alias-index hit first, then person-compatibility for PERSON, then
containment / difflib-ratio ≥ 0.88 for other types, then embedding cosine
≥ 0.83 — so pairwise F1 of the distributed pipeline is measured against
the reference's actual clustering behavior, not against our own rules.

This module is NOT part of the engine: the engine is the order-free
blocked/scored/clustered pipeline. This is the yardstick.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from neuronews_spark.functions import simtext


class GreedyReferenceResolver:
    def __init__(
        self,
        ratio_threshold: float = 0.88,
        embedder: Callable[[str], Sequence[float]] | None = None,
        embedding_threshold: float = 0.83,
    ):
        self.ratio_threshold = ratio_threshold
        self.embedder = embedder
        self.embedding_threshold = embedding_threshold
        self._canonical: dict[int, dict] = {}  # cid -> {type, name, aliases}
        self._exact: dict[tuple[str, str], int] = {}
        self._by_type: dict[str, list[int]] = {}
        self._next = 0

    def resolve(self, entity_type: str, name: str) -> int:
        """Return the cluster id for ``name`` (creating one if unmatched)."""
        norm = simtext.norm_py(entity_type, name)
        cid = self._find(entity_type, name, norm)
        if cid is None:
            cid = self._next
            self._next += 1
            self._canonical[cid] = {"type": entity_type, "name": name, "aliases": []}
            self._by_type.setdefault(entity_type, []).append(cid)
        else:
            node = self._canonical[cid]
            if len(name.split()) > len(node["name"].split()):
                node["name"] = name
        node = self._canonical[cid]
        if name not in node["aliases"]:
            node["aliases"].append(name)
        self._exact[(entity_type, norm)] = cid
        return cid

    def _find(self, entity_type: str, name: str, norm: str) -> int | None:
        if not norm:
            return None
        hit = self._exact.get((entity_type, norm))
        if hit is not None:
            return hit
        best, best_score = None, 0.0
        for cid in self._by_type.get(entity_type, []):
            node = self._canonical[cid]
            cand_norms = {
                simtext.norm_py(entity_type, f)
                for f in [node["name"], *node["aliases"]]
            }
            if entity_type == "Person":
                if any(simtext.person_compatible(norm, cn) for cn in cand_norms):
                    return cid
                continue
            for cn in cand_norms:
                if not cn:
                    continue
                if simtext.token_containment(norm, cn):
                    return cid
                score = simtext.ratio_batch(
                    np.array([norm], dtype=object), np.array([cn], dtype=object)
                )[0]
                if score > best_score:
                    best, best_score = cid, score
        if best is not None and best_score >= self.ratio_threshold:
            return best
        if self.embedder is not None:
            return self._embedding_match(entity_type, name)
        return None

    def _embedding_match(self, entity_type: str, name: str) -> int | None:
        try:
            vec = np.asarray(self.embedder(name), dtype=float)
        except KeyError:
            return None
        best, best_sim = None, 0.0
        for cid in self._by_type.get(entity_type, []):
            node = self._canonical[cid]
            try:
                cv = np.asarray(self.embedder(node["name"]), dtype=float)
            except KeyError:
                continue
            sim = simtext.cosine_batch(vec[None, :], cv[None, :])[0]
            if sim > best_sim:
                best, best_sim = cid, sim
        if best is not None and best_sim >= self.embedding_threshold:
            return best
        return None


def greedy_clusters(
    mentions: list[tuple[str, str]],
    embedder: Callable[[str], Sequence[float]] | None = None,
) -> dict[tuple[str, str], int]:
    """Process (entity_type, name) mentions in order; return the cluster id
    each distinct typed surface ends up in under reference semantics."""
    r = GreedyReferenceResolver(embedder=embedder)
    out: dict[tuple[str, str], int] = {}
    for etype, name in mentions:
        out[(etype, name)] = r.resolve(etype, name)
    return out
