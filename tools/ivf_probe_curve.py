"""Measured scale curve for the PERSISTED IVF index: a fixed 64-query
probe batch and a fixed 1x maintenance batch against an Nx corpus.

The production framing (mirrors fixed_batch_neardup in
SCALE_TRAINOPS.json): the index is built once per corpus state — the
ingest-time cost, untimed here — and every serving-path operation is
priced by the batch plus the probed slice, never the corpus:

- probe: ivf_index_search touches n_probe/n_cells of the index FILES
  (manifest partition pruning). Cells grow as 16·sqrt(N) — the FAISS
  heuristic — so the probed fraction shrinks as the corpus grows and
  probed bytes grow ~sqrt(N), not N.
- append: a 1x batch assigned against the frozen centroids and
  committed to a zero-copy CLONE of the index (snapshot_clone), so
  the measured table is never mutated; cost is batch x n_cells argmax
  work + one manifest commit.

Writes/merges the `fixed_batch_ivf` key into SCALE_TRAINOPS.json
(this script UPDATES the JSON in place — it never rewrites the other
orchestrators' keys).

Usage:
    python tools/ivf_probe_curve.py            # scales 1 4 16 64 128
    python tools/ivf_probe_curve.py --one 16   # single scale (subprocess worker)
"""

from __future__ import annotations

import json
import math
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_curve import SCALE_ROOT, _spark, materialize_docs  # noqa: E402

SCALES = [1, 4, 16, 64, 128]


def n_cells_for(n: int) -> int:
    return 16 * max(1, round(math.sqrt(n)))


def run_one(n: int) -> dict:
    from pyspark.sql import functions as F

    from group5_spark.catalog import load_table
    from group5_spark.extensions.similarity import (
        ivf_index_append,
        ivf_index_init,
        ivf_index_search,
    )
    from group5_spark.medallion.snapshots import snapshot_clone

    materialize_docs(1)  # probe/append batches come from the 1x tables
    materialize_docs(n)
    sf_dir = str(SCALE_ROOT / f"xd{n:03d}")
    idx = SCALE_ROOT / f"_ivfidx_x{n:03d}"
    spark = _spark(f"ivf-curve-x{n}")
    cells = n_cells_for(n)

    build_s = None
    if not (idx / "_DONE").exists():
        shutil.rmtree(idx, ignore_errors=True)
        emb = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        ivf_index_init(emb, str(idx), n_cells=cells)
        build_s = round(time.perf_counter() - t0, 3)
        (idx / "_DONE").touch()

    base = load_table(spark, str(SCALE_ROOT / "xd001"), "embeddings")
    probe_batch = base.filter(F.col("vec_id") < 64)

    # warm-up, then timed probe
    ivf_index_search(probe_batch, str(idx), k=10, n_probe=4).count()
    t0 = time.perf_counter()
    rows = ivf_index_search(probe_batch, str(idx), k=10, n_probe=4).count()
    probe_s = round(time.perf_counter() - t0, 3)

    # timed maintenance append on a zero-copy clone (never mutate the
    # measured index); ids shifted out of the corpus id space
    append_batch = base.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    clone = SCALE_ROOT / f"_ivfidx_clone_x{n:03d}"
    shutil.rmtree(clone, ignore_errors=True)
    snapshot_clone(str(idx), str(clone))
    t0 = time.perf_counter()
    ivf_index_append(append_batch, str(clone))
    append_s = round(time.perf_counter() - t0, 3)
    shutil.rmtree(clone, ignore_errors=True)

    spark.stop()
    return {
        "scale": n,
        "n_cells": cells,
        "build_seconds_untimed_ingest": build_s,
        "probe_seconds": probe_s,
        "probe_rows": rows,
        "append_seconds": append_s,
    }


def _fit_exponent(points: list[tuple[int, float]]) -> float:
    xs = [math.log(p[0]) for p in points]
    ys = [math.log(max(p[1], 1e-6)) for p in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print("RESULT " + json.dumps(run_one(int(sys.argv[2]))))
        return
    runs = []
    for n in SCALES:
        print(f"=== scale x{n} ===", flush=True)
        out = subprocess.run(
            [sys.executable, __file__, "--one", str(n)],
            capture_output=True, text=True, check=True,
        )
        line = [
            l for l in out.stdout.splitlines() if l.startswith("RESULT ")
        ][-1]
        runs.append(json.loads(line[len("RESULT "):]))
        print(runs[-1], flush=True)
    rec = {
        "method": (
            "fixed 64-query probe batch + fixed 1x append batch vs the "
            "PERSISTED cell-partitioned IVF index of an Nx corpus "
            "(index built untimed = ingest-time cost; cells grow as "
            "16*sqrt(N) so probes touch ~4/n_cells of the files; "
            "appends land on a zero-copy clone)"
        ),
        "runs": runs,
        "probe_exponent": _fit_exponent(
            [(r["scale"], r["probe_seconds"]) for r in runs]
        ),
        "append_exponent": _fit_exponent(
            [(r["scale"], r["append_seconds"]) for r in runs]
        ),
    }
    path = Path(__file__).resolve().parent.parent / "SCALE_TRAINOPS.json"
    data = json.loads(path.read_text())
    data["fixed_batch_ivf"] = rec
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
