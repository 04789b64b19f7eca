"""Operator library.

Modules (see COVERAGE.md for the SURVEY §2 mapping):
    mrapps      — MapReduce apps as DataFrame pipelines (O12-O16)
    mr          — MRJob compatibility API (map/reduce UDF contract)
    kv          — op-log fold, shard routing, rebalancer (O18-O23)
    kvstore     — Clerk-style client API
    linearize   — porcupine-lite linearizability checker
    asof        — as-of (temporal) join
    skew        — salted aggregation for hot keys
    dedup       — exact/fingerprint/MinHash/SimHash dedup (X1, X2)
    similarity  — exact/LSH/IVF top-k cosine (X3)
    textstats   — token/char/quality/lang/n-gram analysis (X4)
    multimodal  — binary media columns + Arrow plumbing (X5)
    queries_*   — declared-query registrations (oracle contracts)
"""

from . import (  # noqa: F401
    asof,
    dedup,
    kv,
    kvstore,
    linearize,
    mr,
    mrapps,
    multimodal,
    similarity,
    skew,
    textstats,
)
