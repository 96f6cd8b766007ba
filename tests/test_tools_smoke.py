"""Round-6 VERDICT #1b: a measurement tool that cannot run must not
ship — round 6's `merge_curve.py --eq` died on a TypeError on its
first scale yet its output key was cited as recorded. Every ladder
WORKER entrypoint (the per-scale functions the orchestrators
subprocess out to) is exercised here in-process at toy scale
(sf0.001, scale 1), so `pytest` itself proves each tool can produce a
result end-to-end. Orchestrator mains (subprocess loops + JSON merge)
stay out: they are thin drivers over these workers.

The tools read BASE_SF / SCALE_ROOT from the environment at import
time, so the fixture reloads them under a tmp scale root; the shared
test SparkSession is kept alive through the tools' spark.stop()
calls by a class-level no-op patch.
"""

from __future__ import annotations

import importlib
import types

import pytest


@pytest.fixture(scope="module")
def tools_env(spark, tmp_path_factory):
    mp = pytest.MonkeyPatch()
    root = tmp_path_factory.mktemp("toy_scale_root")
    mp.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    mp.setenv("SPARK_GRAFT_SCALE_ROOT", str(root))
    from pyspark.sql import SparkSession

    mp.setattr(SparkSession, "stop", lambda self: None)

    import tools.scale_curve as sc

    importlib.reload(sc)
    import tools.ivf_probe_curve as ic
    import tools.merge_curve as mc

    importlib.reload(mc)
    importlib.reload(ic)
    yield types.SimpleNamespace(sc=sc, mc=mc, ic=ic)
    mp.undo()
    importlib.reload(sc)
    importlib.reload(mc)
    importlib.reload(ic)


def test_merge_curve_worker(tools_env):
    out = tools_env.mc.run_one(1)
    assert out["update_merge"]["seconds"] > 0
    assert out["insert_only_merge"]["seconds"] > 0


def test_merge_curve_dv_worker(tools_env):
    out = tools_env.mc.run_one_dv(1)
    assert out["rewrite_mode"]["bytes_written"] > 0
    assert out["dv_mode"]["bytes_written"] > 0


def test_merge_curve_eq_worker(tools_env):
    """The exact round-6 failure: run_one_eq must complete through its
    compact_snapshot fold call (the kwarg the broken tool got wrong)."""
    out = tools_env.mc.run_one_eq(1)
    assert out["eq_upsert"]["bytes_written"] > 0
    assert out["compact_fold_seconds"] > 0


def test_merge_curve_masks_worker(tools_env):
    out = tools_env.mc.run_one_masks(1)
    assert out["scoped_fold"]["files_folded"] >= 1
    assert out["scoped_fold"]["files_carried"] >= 1
    assert out["full_rewrite_fold"]["seconds"] > 0


def test_ivf_probe_curve_worker(tools_env):
    out = tools_env.ic.run_one(1)
    assert out["probe_rows"] > 0 and out["probe_seconds"] > 0


def test_scale_curve_trainops_worker(tools_env):
    tools_env.sc.materialize(1)
    tools_env.sc.materialize_docs(1)
    out = tools_env.sc.run_trainops(1)
    assert out["total"] > 0 and len(out["queries"]) > 0


def test_scale_curve_skew_worker(tools_env):
    tools_env.sc.materialize(1)
    out = tools_env.sc.run_skew(1)
    assert out  # shape probed end-to-end


def test_scale_curve_bench_worker(tools_env):
    tools_env.sc.materialize(1)
    out = tools_env.sc.run_bench(1)
    assert out["total"] > 0 and len(out["queries"]) >= 20


def test_stream_bench_worker(tools_env, spark):
    import importlib

    import tools.stream_bench as sb

    importlib.reload(sb)
    try:
        tools_env.sc.materialize(1)
        tools_env.sc.materialize_docs(1)
        built = sb.shapes(spark, str(tools_env.sc.SCALE_ROOT / "x001"))
        assert "dedup_vs_corpus" in built  # xd001 present → full set
        for name, build in built.items():
            rows = sb.drain(build(), name, sb.MODES.get(name, "append"))
            assert rows >= 0, name
    finally:
        importlib.reload(sb)


def test_merge_curve_stream_eq_worker(tools_env):
    """Round-7 VERDICT #4's worker: the streaming eq-CDC steady-state
    ladder must drain real micro-batches, commit one eq sidecar per
    batch, and survive the mid-ladder fold."""
    out = tools_env.mc.run_one_stream_eq(1)
    assert out["micro_batches"] == 8
    assert out["eq_commits"] >= 1
    assert out["commit_seconds_per_batch"] > 0
    assert out["fold_seconds"] > 0
    assert out["rows"] > 0


def test_merge_curve_span_worker(tools_env):
    """Round-7 VERDICT #6's ladder worker: fixed-batch incremental
    span dedup against the persisted index, plus the hash-vs-string
    full-corpus election agreement check, must run end to end."""
    out = tools_env.mc.run_one_span(1)
    assert out["index_spans"] > 0
    assert out["fixed_batch"]["seconds"] > 0
    assert 0 < out["fixed_batch"]["kept_docs"] <= out["fixed_batch"]["batch_docs"]
    assert out["full_corpus"]["kept_spans"] > 0
    assert out["full_corpus"]["hash_keyed_seconds"] > 0


def test_merge_curve_containment_worker(tools_env):
    """Round-10 VERDICT #3's ladder worker: the fixed-batch PPJoin
    containment probe against the persisted prefix+postings index
    must run end to end, duplicates must pair (the even half of the
    batch duplicates replica-0 docs verbatim), and the capped variant
    must actually engage (capped words > 0, candidates strictly
    fewer)."""
    # cap=4 at toy scale: sf0.001's per-(replica, group) df is ~10,
    # far under the production default 40 — the smoke must drive the
    # same capped code path the real ladder runs
    out = tools_env.mc.run_one_containment(1, cap=4)
    assert out["index_rows"] > 0
    fb = out["fixed_batch"]
    assert fb["seconds"] > 0 and fb["pairs"] > 0
    assert fb["candidates"] >= fb["pairs"]
    cap = out["fixed_batch_capped"]
    assert cap["capped_words"] > 0
    assert cap["candidates"] < fb["candidates"]


def test_merge_curve_wap_worker(tools_env):
    out = tools_env.mc.run_one_wap(1)
    assert out["begin_seconds"] > 0
    assert out["publish_seconds"] > 0
    assert out["audit_dv_files_masked"] >= 1
    assert out["published_rows"] > out["batch_rows"]
    # round-9 VERDICT #7: the lost-race retry is measured — the second
    # audit must actually lose its publish and recover via replay
    assert out["lost_race_retry_seconds"] > 0
    assert out["retry_published_version"] > out["published_version"]


def test_ivf_curve_ivfpq_worker(tools_env):
    """Round-9 IVF-PQ composition ladder worker: untimed coded-index
    build, timed file-pruned + ADC + re-rank probes, timed
    frozen-model append on a clone, and recall@10 — one run."""
    out = tools_env.ic.run_one_ivfpq(1)
    assert out["probe_seconds"] > 0
    assert out["append_seconds"] > 0
    assert 0.0 <= out["recall_at_10"] <= 1.0
    assert out["n_cells"] == 16


def test_ivf_curve_pq_worker(tools_env):
    """Round-9 VERDICT #1's ladder worker: train-once codebooks,
    timed Nx encode to the persisted codes index, timed probes over
    the PERSISTED codes, and the quality pair (id recall@10 +
    tie-robust distance ratio) must all come out of one run."""
    out = tools_env.ic.run_one_pq(1)
    assert out["encode_seconds"] > 0
    assert out["query_seconds"] > 0
    assert 0.0 <= out["recall_at_10"] <= 1.0
    assert out["distance_ratio"] >= 1.0 - 1e-9
    assert out["m"] == 32 and out["k"] == 16


def test_merge_curve_semdedup_worker(tools_env):
    """Round-12 ladder worker (round-13 rungs included): the SemDeDup
    pricing run must execute end to end at toy scale — the election
    retires exactly the planted x2-scaled duplicates (the worker
    raises otherwise) under ALL THREE trained-per-run centroid
    policies AND the persisted-index reuse rung, and the pair-volume
    aggregates are populated (the ivf_reuse rung also records its
    amortized build cost)."""
    out = tools_env.mc.run_one_semdedup(2, k0=4, prop_k0=2)
    assert out["corpus_vecs"] == out["planted"] * 3  # 2 replicas + copies
    for label in ("fixed_k", "sqrt_k", "prop_k", "ivf_reuse"):
        r = out[label]
        assert r["doomed"] == out["planted"]
        assert r["seconds"] > 0
        assert r["pair_volume"] > 0
    assert out["ivf_reuse"]["index_build_seconds"] > 0
