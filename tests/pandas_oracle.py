"""In-process pandas oracle for the reference-parity test (SURVEY §5.2 item 2).

An independent, eager re-implementation of the reference pipeline semantics
(blocking → meta-blocking weights → prune → connected components → per
component KMeans sweep) in plain Python/pandas — deliberately written in the
reference's style (dicts + loops) so it shares no code path with the Spark
engine it checks.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import numpy as np
import pandas as pd

from entity_resolution_spark.functions.features import FeatureSpec
from entity_resolution_spark.ml.kmeans import kmeans_fit_predict
from entity_resolution_spark.operators.klsh import engineer_pandas


def phonetic_combination_py(x: str) -> list[str]:
    s = str(x).lower()
    return [
        s[0:1],
        s[0:2],
        s[0:3],
        s[-3:],
        "".join(c for c in s if c.isalpha() and c not in "aeiou"),
    ]


def blocks_py(names: pd.Series) -> dict[str, set[int]]:
    blocks: dict[str, set[int]] = defaultdict(set)
    for idx, name in names.items():
        for key in phonetic_combination_py(name):
            blocks[key].add(idx)
    return blocks


def edge_weights_py(blocks: dict[str, set[int]]) -> dict[tuple[int, int], int]:
    weights: dict[tuple[int, int], int] = defaultdict(int)
    for members in blocks.values():
        for i, j in combinations(sorted(members), 2):
            weights[(i, j)] += 1
    return dict(weights)


def components_py(
    all_ids: list[int], edges: list[tuple[int, int]]
) -> dict[int, int]:
    parent = {i: i for i in all_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in all_ids}


def run_oracle(
    df: pd.DataFrame,
    spec: FeatureSpec,
    threshold: float = 1.5,
    k_bottom: int = 1,
    k_top: int = 10,
    seed: int = 42,
):
    """Full pipeline; returns (components map, klsh assignments dict).

    klsh assignments: {(component_id, k): {record_id: cluster_id}}.
    """
    blocks = blocks_py(df["name"])
    weights = edge_weights_py(blocks)
    pruned = [p for p, w in weights.items() if w > threshold]
    comp = components_py(list(df.index), pruned)

    by_comp: dict[int, list[int]] = defaultdict(list)
    for rid, c in comp.items():
        by_comp[c].append(rid)

    klsh: dict[tuple[int, int], dict[int, int]] = {}
    for c, rids in by_comp.items():
        rids = sorted(rids)
        sub = df.loc[rids]
        if len(rids) == 1:
            klsh[(c, k_bottom)] = {rids[0]: 0}
            continue
        X = engineer_pandas(sub, spec)
        for k in range(k_bottom, min(k_top, len(rids)) + 1):
            labels, _ = kmeans_fit_predict(X, k, seed=seed)
            klsh[(c, k)] = dict(zip(rids, (int(v) for v in labels)))
    return comp, klsh
