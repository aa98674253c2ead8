"""Batch text-similarity kernels for Arrow-vectorized pair scoring.

These functions take numpy/pandas arrays of *pairs* and return numpy arrays —
they are only ever called from inside ``pandas_udf`` / ``applyInPandas``
bodies, so Spark ships Arrow batches (10k pairs at a time) and Python cost is
amortized per batch, never per row.

Semantics ported bit-exact from the reference resolver
(``/root/reference/src/knowledge_graph/foundation/resolution.py``):

  * ``norm_py``             — resolution.py:28-39 (driver-side mirror of the
                              Column version in ``functions.normalize``)
  * ``token_compatible``    — resolution.py:42-50
  * ``person_compatible``   — resolution.py:53-75 (surname equality +
                              injective given-name/initial matching)
  * ``ratio_batch``         — resolution.py:78-79: exact ``difflib.
                              SequenceMatcher.ratio`` (the 0.88-threshold
                              scorer), with a vectorized length upper-bound
                              prefilter so difflib only runs on pairs that
                              could clear the threshold
  * ``token_containment``   — resolution.py:197-202
  * ``cosine_batch``        — resolution.py:82-88 (embedding fallback, 0.83)

Plus scale-path scorers the reference doesn't have but the north rule names:
batched Levenshtein (full-matrix DP vectorized across the batch) and
Jaro-Winkler, and a hashed char-n-gram TF cosine.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import numpy as np

_ORG_SUFFIX = re.compile(
    r"\b(inc|llc|corp|corporation|ltd|co|company|plc|gmbh|sa|ag)\b", re.IGNORECASE
)
_PUNCT = re.compile(r"[^\w\s]")
_WS = re.compile(r"\s+")

PERSON_TYPES = ("Person",)


def norm_py(entity_type: str, name: str) -> str:
    """Exact Python port of the resolution normalizer (resolution.py:33-39)."""
    text = (name or "").lower()
    if entity_type == "Organization":
        text = _ORG_SUFFIX.sub(" ", text)
    text = _PUNCT.sub(" ", text)
    return _WS.sub(" ", text).strip()


def node_id_py(entity_type: str, name: str) -> str:
    """Exact Python port of ``functions.normalize.node_id`` (the
    reference's surrogate scheme, model.py:27-34):
    ``lower(type) + ':' + md5(f'{type}:{lower(ws-collapsed name)}')[:12]``.
    Differentially pinned against the Column twin by
    tests/test_normalize.py and, end-to-end, by the columnar-vs-UDF
    extractor differential (tests/test_mentions.py)."""
    import hashlib

    mn = _WS.sub(" ", name or "").strip().lower()
    digest = hashlib.md5(f"{entity_type}:{mn}".encode("utf-8")).hexdigest()
    return f"{entity_type.lower()}:{digest[:12]}"


def token_compatible(x: str, y: str) -> bool:
    """Tokens match if equal or one is an initial of the other (resolution.py:42-50)."""
    if x == y:
        return True
    if len(x) == 1 and y.startswith(x):
        return True
    if len(y) == 1 and x.startswith(y):
        return True
    return False


def person_compatible(a_norm: str, b_norm: str) -> bool:
    """Same surname + injective compatible given names (resolution.py:53-75)."""
    ta, tb = a_norm.split(), b_norm.split()
    if not ta or not tb:
        return False
    if ta[-1] != tb[-1]:
        return False
    given_a, given_b = ta[:-1], tb[:-1]
    shorter, longer = (
        (given_a, given_b) if len(given_a) <= len(given_b) else (given_b, given_a)
    )
    used = [False] * len(longer)
    for tok in shorter:
        for i, other in enumerate(longer):
            if not used[i] and token_compatible(tok, other):
                used[i] = True
                break
        else:
            return False
    return True


def person_compatible_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.empty(len(a), dtype=bool)
    for i in range(len(a)):
        out[i] = person_compatible(a[i], b[i])
    return out


def token_containment(a_norm: str, b_norm: str) -> bool:
    """Token set of one side contained in the other (resolution.py:197-202)."""
    ta, tb = set(a_norm.split()), set(b_norm.split())
    if not ta or not tb:
        return False
    return ta <= tb or tb <= ta


def token_containment_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.empty(len(a), dtype=bool)
    for i in range(len(a)):
        out[i] = token_containment(a[i], b[i])
    return out


def ratio_batch(a: np.ndarray, b: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Exact ``difflib.SequenceMatcher(None, a, b).ratio()`` per pair.

    A vectorized upper bound (matches ≤ min(len) ⇒ ratio ≤ 2·min/(la+lb))
    skips difflib for pairs that cannot reach ``threshold`` — at threshold
    0.88 this prunes most candidate pairs before any Python sequence work.
    """
    la = np.fromiter((len(s) for s in a), dtype=np.int64, count=len(a))
    lb = np.fromiter((len(s) for s in b), dtype=np.int64, count=len(b))
    denom = np.maximum(la + lb, 1)
    upper = 2.0 * np.minimum(la, lb) / denom
    out = np.zeros(len(a), dtype=np.float64)
    both_empty = (la == 0) & (lb == 0)
    out[both_empty] = 1.0  # difflib: ratio("", "") == 1.0
    for i in np.flatnonzero((upper >= threshold) & ~both_empty):
        sm = SequenceMatcher(None, a[i], b[i])
        # quick_ratio (character-multiset bound, O(n)) is a true upper
        # bound of ratio (O(n^2)-ish); filtering on it is lossless
        if threshold > 0.0 and sm.quick_ratio() < threshold:
            continue
        out[i] = sm.ratio()
    return out


def cosine_batch(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Row-wise cosine over 2-D float arrays (resolution.py:82-88 semantics:
    zero-norm vectors score 0.0)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    dot = np.einsum("ij,ij->i", u, v)
    nu = np.sqrt(np.einsum("ij,ij->i", u, u))
    nv = np.sqrt(np.einsum("ij,ij->i", v, v))
    denom = nu * nv
    out = np.zeros(len(u), dtype=np.float64)
    nz = denom > 0
    out[nz] = dot[nz] / denom[nz]
    return out


# --------------------------------------------------------------------------
# Scale-path scorers (north rule: batched Jaro-Winkler / Levenshtein)
# --------------------------------------------------------------------------


def _encode_padded(strs: np.ndarray, max_len: int) -> np.ndarray:
    """Encode a batch of strings into an int32 (batch, max_len) code-point
    matrix padded with -1 — the layout the batched DP kernels run over."""
    out = np.full((len(strs), max_len), -1, dtype=np.int32)
    for i, s in enumerate(strs):
        if s:
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            out[i, : len(cp)] = cp.astype(np.int32)
    return out


def levenshtein_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched edit distance: one DP, vectorized across the whole batch.

    Classic O(|a|·|b|) Wagner-Fischer, but the inner cell update is a numpy
    op over all pairs simultaneously, so per-pair Python overhead is O(1).
    """
    la = np.fromiter((len(s) for s in a), dtype=np.int64, count=len(a))
    lb = np.fromiter((len(s) for s in b), dtype=np.int64, count=len(b))
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    if ma == 0 or mb == 0:
        return np.maximum(la, lb)
    ea = _encode_padded(a, ma)
    eb = _encode_padded(b, mb)
    # prev = DP row i-1, vectorized over the batch dimension; each pair's
    # final distance is captured the iteration its own string ends (i == la)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    final = np.full(n, -1, dtype=np.int64)
    final[la == 0] = lb[la == 0]
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub_cost = (ea[:, i - 1][:, None] != eb).astype(np.int64)  # (n, mb)
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1],
            )
        prev = cur
        done = la == i
        if done.any():
            final[done] = prev[done, lb[done]]
    return final


def levenshtein_sim_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Normalized Levenshtein similarity 1 - dist/max(len)."""
    d = levenshtein_batch(a, b).astype(np.float64)
    la = np.fromiter((len(s) for s in a), dtype=np.float64, count=len(a))
    lb = np.fromiter((len(s) for s in b), dtype=np.float64, count=len(b))
    m = np.maximum(np.maximum(la, lb), 1.0)
    return 1.0 - d / m


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    f1 = [False] * l1
    f2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not f2[j] and s1[i] == s2[j]:
                f1[i] = f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler_batch(
    a: np.ndarray,
    b: np.ndarray,
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.0,
) -> np.ndarray:
    """Batched Jaro-Winkler (4-char prefix boost, weight 0.1).

    ``boost_threshold`` selects between the two published conventions:
    Winkler's original gates the prefix boost on jaro > 0.7 (what DuckDB's
    ``jaro_winkler_similarity`` and most C implementations do — pass 0.7
    to be comparable against them, verified exact on 17k random pairs by
    ``tests/test_scoring.py``); the ungated variant (default 0.0, e.g.
    python-jellyfish pre-1.0) always applies the boost and is what the ER
    scale scorer has used since round 1.  The two differ only when
    jaro ≤ threshold AND the strings share a prefix — low-similarity
    pairs that the ER thresholds usually (but not provably) discard.
    """
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        s1, s2 = a[i], b[i]
        j = _jaro(s1, s2)
        if j <= boost_threshold:
            out[i] = j
            continue
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 != c2:
                break
            prefix += 1
        out[i] = j + prefix * prefix_weight * (1.0 - j)
    return out


def char_ngram_cosine_batch(a: np.ndarray, b: np.ndarray, n: int = 3) -> np.ndarray:
    """Hashed character-n-gram TF cosine (the lexical stand-in for the
    reference's embedding cosine when no embedding table is supplied)."""
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        s1 = a[i].replace(" ", "")
        s2 = b[i].replace(" ", "")
        g1: dict[str, int] = {}
        g2: dict[str, int] = {}
        for s, g in ((s1, g1), (s2, g2)):
            if len(s) < n:
                g[s] = g.get(s, 0) + 1
            else:
                for k in range(len(s) - n + 1):
                    sh = s[k : k + n]
                    g[sh] = g.get(sh, 0) + 1
        dot = sum(c * g2.get(sh, 0) for sh, c in g1.items())
        n1 = sum(c * c for c in g1.values()) ** 0.5
        n2 = sum(c * c for c in g2.values()) ** 0.5
        out[i] = dot / (n1 * n2) if n1 > 0 and n2 > 0 else 0.0
    return out
