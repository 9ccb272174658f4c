"""Histogram clustering for context maps.

Greedy agglomerative clustering by entropy-cost delta, modeled on
enc_cluster.cc (FastClusterHistograms): seed with the most-populous
histograms, assign the rest to the cheapest cluster, capped at
CLUSTERS_LIMIT.
"""

from __future__ import annotations

import math

from .params import CLUSTERS_LIMIT


def _entropy(counts) -> float:
    total = sum(counts)
    if total == 0:
        return 0.0
    ent = 0.0
    for c in counts:
        if c > 0:
            ent -= c * math.log2(c / total)
    return ent


def _merge_cost(a, b) -> float:
    """Entropy of merged histogram minus individual entropies."""
    n = max(len(a), len(b))
    merged = [(a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)
              for i in range(n)]
    return _entropy(merged) - _entropy(a) - _entropy(b)


def _add(a, b):
    n = max(len(a), len(b))
    return [(a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)
            for i in range(n)]


def cluster_histograms(histograms, max_clusters: int = CLUSTERS_LIMIT):
    """Returns (clustered_histograms, mapping list ctx -> cluster id)."""
    n = len(histograms)
    if n == 0:
        return [], []
    totals = [sum(h) for h in histograms]
    order = sorted(range(n), key=lambda i: -totals[i])
    # Seed clusters with the largest histograms (up to a small seed count),
    # then greedily assign/merge.
    max_seeds = min(max_clusters, 64)
    clusters = []       # list of histogram counts
    mapping = [0] * n
    for idx in order:
        h = histograms[idx]
        if totals[idx] == 0 and clusters:
            # empty histograms join cluster 0 for free
            mapping[idx] = 0
            continue
        best_j, best_cost = -1, float("inf")
        for j, ch in enumerate(clusters):
            cost = _merge_cost(ch, h)
            if cost < best_cost:
                best_j, best_cost = j, cost
        # cost of a new cluster ~ histogram serialization overhead (~40 bits
        # small / proportional to alphabet). Open a new cluster when merging
        # is more expensive and we have room.
        new_cluster_cost = 40.0 + 2.0 * sum(1 for c in h if c > 0)
        if len(clusters) < max_seeds and (best_j < 0
                                          or best_cost > new_cluster_cost):
            mapping[idx] = len(clusters)
            clusters.append(list(h))
        else:
            mapping[idx] = best_j
            clusters[best_j] = _add(clusters[best_j], h)
    # Renumber clusters so that ids appear in first-use (context) order; the
    # format does not require it, but it compresses the context map better.
    remap = {}
    for ctx in range(n):
        c = mapping[ctx]
        if c not in remap:
            remap[c] = len(remap)
    new_clusters = [None] * len(remap)
    for old, new in remap.items():
        new_clusters[new] = clusters[old]
    mapping = [remap[c] for c in mapping]
    return new_clusters, mapping
