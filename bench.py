"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (north_rule evidence): run the candidate-pair scoring job
at two parallelism levels (local[8] vs local[32] — the sandbox substitute for
N vs 4N executors) on the same input, report candidate-pairs-scored/sec at
both and the scaling efficiency, and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

HEADLINE = [
    "blocking_keys",
    "candidate_pairs",
    "edge_weights",
    "pruned_edges",
    "connected_components",
    "token_jaccard",
    "minhash_signatures",
    "minhash_band_candidates",
    "levenshtein_pairs",
    "text_stats",
    "topk_per_group",
    "windowed_event_counts",
    "embedding_topk",
    "tfidf_cosine",
    "ngram_jaccard",
    "simhash_near_pairs",
    "pair_auroc",
    "exact_dedup",
]


def _force(df) -> int:
    """Force full computation of every column (noop sink), return row count."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_default() -> None:
    import __spark_entry__ as M
    from entity_resolution_spark.session import get_spark

    spark = get_spark(app_name="er-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    qs = M.queries()
    # warm the JVM/Arrow paths once on the smallest sf
    qs["blocking_keys"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    # throughput metric: candidate pairs scored (lev+jw+jaccard) per second
    t0 = time.perf_counter()
    n_pairs = qs["candidate_pairs"](spark, SF_DIR).count()
    dt_pairs = time.perf_counter() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "candidate_pairs": n_pairs,
                "candidate_pairs_per_sec": round(n_pairs / max(dt_pairs, 1e-9)),
                "cpus": CPUS,
            }
        )
    )


def _scaling_worker(cores: int, sf_dir: str, mode: str = "threads") -> None:
    """Subprocess body: time the pair-generation+scoring job at `cores`.

    mode="threads": local[cores] (task slots in one JVM).
    mode="executors": local-cluster[cores//4, 4, 3072] — real separate
    executor JVMs (the literal N vs 4N *executors* deployment shape).
    """
    from pyspark.sql import functions as F

    from entity_resolution_spark import entrypoints
    from entity_resolution_spark.functions import similarity as S
    from entity_resolution_spark.operators import pairs as P
    from entity_resolution_spark.session import get_spark

    if mode == "executors":
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
        master = f"local-cluster[{max(cores // 4, 1)},4,3072]"
        extra = {"spark.executor.memory": "3g"}
    else:
        master = f"local[{cores}]"
        extra = {}
    spark = get_spark(
        app_name=f"er-scaling-{cores}",
        master=master,
        shuffle_partitions=4 * cores,
        extra_confs=extra,
    )
    entrypoints.ensure_shipped(spark)
    scale = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "2"))
    # Replicate the corpus `scale`x (disjoint id spaces) so the job is
    # compute-dominant (~pairs x scale^2) rather than overhead-dominant —
    # fixed stage/setup costs would otherwise swamp the scaling signal.
    base_blocks = entrypoints._blocks(spark, sf_dir)
    # score a 24-char text prefix (not the 4-char first token): representative
    # of real title scoring and CPU-dominant, so the scaling signal measures
    # compute, not allocation/memory-bandwidth overhead
    base_titles = entrypoints._doc(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, 24).alias("title")
    )
    blocks = base_blocks
    titles = base_titles
    for i in range(1, scale):
        off = i * 10_000_000
        blocks = blocks.union(
            base_blocks.select(
                (F.col("record_id") + off).alias("record_id"), "block_key"
            )
        )
        titles = titles.union(
            base_titles.select((F.col("doc_id") + off).alias("doc_id"), "title")
        )
    # warm-up: JVM JIT + spawn every python worker (pandas/Arrow imports)
    P.candidate_pairs(base_blocks.limit(2000)).count()
    warm = spark.range(cores * 8).repartition(4 * cores).select(
        F.lit("aaa").alias("a"), F.lit("aab").alias("b")
    )
    warm.select(S.jaro_winkler_udf("a", "b")).write.format("noop").mode(
        "overwrite"
    ).save()

    # The measured job is the *scoring* pipeline (the metric is candidate-
    # pairs-scored/sec): blocks → broadcast block self-join → broadcast title
    # joins → levenshtein + jaro-winkler → sink.  With the dimension sides
    # broadcast this is one shuffle-free whole-stage-codegen + Arrow-UDF
    # pipeline — the same plan a 1000-executor cluster would run, where the
    # only cross-node traffic is the broadcast itself.  (The shuffle-heavy
    # dedup/weight path is measured separately by the default bench queries.)
    blocks = blocks.repartition(4 * cores).localCheckpoint()
    t1 = titles.select(F.col("doc_id").alias("id1"), F.col("title").alias("title1"))
    t2 = titles.select(F.col("doc_id").alias("id2"), F.col("title").alias("title2"))
    t0 = time.perf_counter()
    cand = P.candidate_pairs(blocks, distinct=False, broadcast_blocks=True)
    scored = (
        cand.join(F.broadcast(t1), "id1")
        .join(F.broadcast(t2), "id2")
        .select(
            "id1",
            "id2",
            F.levenshtein("title1", "title2").alias("lev"),
            S.jaro_winkler_udf(F.col("title1"), F.col("title2")).alias("jw"),
        )
    )
    scored.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    n = cand.count()
    spark.stop()
    print(json.dumps({"cores": cores, "seconds": dt, "pairs": n}))


def run_scaling(sf_dir: str) -> None:
    import subprocess

    results = {}
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    for cores in (lo, 4 * lo):
        # Pin CPU affinity: local[N] alone is NOT an N-core machine — its N
        # task threads and N python UDF workers are separate processes that
        # the OS schedules onto up to 2N physical cores.  taskset makes the
        # 8-core run a true 8-core machine, i.e. the honest N vs 4N cluster
        # substitute.
        mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "threads")
        cmd = [sys.executable, __file__, "--scaling-worker", str(cores), sf_dir, mode]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)

    r8, r32 = results[lo], results[4 * lo]
    tput8 = r8["pairs"] / r8["seconds"]
    tput32 = r32["pairs"] / r32["seconds"]
    eff = tput32 / (4 * tput8)
    report = {
        "pairs": r8["pairs"],
        f"local{lo}_sec": round(r8["seconds"], 3),
        f"local{4*lo}_sec": round(r32["seconds"], 3),
        f"pairs_per_sec_local{lo}": round(tput8),
        f"pairs_per_sec_local{4*lo}": round(tput32),
        f"scaling_efficiency_{lo}_to_{4*lo}": round(eff, 3),
    }
    print(json.dumps(report))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — throughput + scaling evidence\n\n"
            "North-rule scaling criterion (N → 4N executors, efficiency ≥ 0.8)\n"
            "evidenced in-sandbox by running the identical candidate-pair\n"
            "generation + scoring job (blocking → block-local broadcast\n"
            "self-join → levenshtein + jaro-winkler on every pair, shuffle-free\n"
            f"scoring plan) at taskset-pinned local[{lo}] vs local[{4*lo}]\n"
            f"on the same input ({sf_dir}).\n\n"
            "| metric | value |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in report.items())
            + "\nEfficiency = throughput(32 cores) / (4 x throughput(8 cores)).\n"
        )


def run_reference_compare(sf_dir: str, reps: int = 8) -> None:
    """Same blocking→edges→prune→CC chain: this engine vs a faithful
    single-node pandas/dict implementation of the reference architecture
    (tests/pandas_oracle.py), on the identical replicated input."""
    import pandas as pd

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import duckdb
    from pandas_oracle import blocks_py, components_py, edge_weights_py

    base = duckdb.query(
        f"select doc_id, split_part(text,' ',1) as title from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    docs = pd.concat(
        [base.assign(doc_id=base["doc_id"] + i * 10_000_000) for i in range(reps)],
        ignore_index=True,
    )

    from pyspark.sql import functions as F

    from entity_resolution_spark import entrypoints
    from entity_resolution_spark.operators import components as C
    from entity_resolution_spark.operators import pairs as P
    from entity_resolution_spark.session import get_spark

    spark = get_spark(app_name="ref-compare")
    bb = entrypoints._blocks(spark, sf_dir)
    blocks = bb
    for i in range(1, reps):
        blocks = blocks.union(
            bb.select((F.col("record_id") + i * 10_000_000).alias("record_id"), "block_key")
        )
    blocks = blocks.repartition(64).localCheckpoint()
    P.candidate_pairs(bb.limit(1000)).count()  # warm
    t0 = time.perf_counter()
    pr = P.prune(
        P.edge_weights(blocks, left_partitions=64, broadcast_blocks=True)
    ).localCheckpoint()
    pr.count()
    C.assign_components(
        blocks.select("record_id").distinct(),
        pr.select(F.col("id1").alias("src"), F.col("id2").alias("dst")),
    ).count()
    t_spark = time.perf_counter() - t0
    spark.stop()

    # pandas AFTER spark: its ~8 GB pair dict would otherwise sit in the
    # driver heap during the Spark phase and skew the comparison
    t0 = time.perf_counter()
    names = pd.Series(docs["title"].values, index=docs["doc_id"].values)
    weights = edge_weights_py(blocks_py(names))
    pruned = [p for p, w in weights.items() if w > 1.5]
    components_py(list(docs["doc_id"]), pruned)
    t_pandas = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "docs": len(docs),
                "reference_pandas_sec": round(t_pandas, 1),
                "spark_sec": round(t_spark, 1),
                "speedup": round(t_pandas / t_spark, 2),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--reference-compare":
        run_reference_compare(sys.argv[2] if len(sys.argv) > 2 else SF_DIR)
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        _scaling_worker(int(sys.argv[2]), sys.argv[3],
                        sys.argv[4] if len(sys.argv) > 4 else "threads")
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(sys.argv[2] if len(sys.argv) > 2 else SF_DIR)
    else:
        run_default()
